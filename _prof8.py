import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from types import SimpleNamespace
from macvo_tpu.modules.frontend_network import FlowFormerCovFrontend

cfg = SimpleNamespace(weight='random:0', dec_dtype='bf16', enc_dtype='bf16',
                      enforce_positive_disparity=False, decoder_depth=12)
fe = FlowFormerCovFrontend(cfg)
key = jax.random.PRNGKey(0)
imgs = jax.block_until_ready(jax.random.uniform(key, (6, 1, 480, 640, 3)))
bl = jnp.asarray(0.25); fx = jnp.asarray(320.0)
fn = fe._get('pair', (1, 480, 640, 3))
t0=time.time()
out = fn(imgs[0], imgs[1], imgs[2], bl, fx)
jax.block_until_ready(out)
print(f'compile+first: {time.time()-t0:.1f}s')
for i in range(3):
    t0=time.perf_counter()
    out = fn(imgs[i], imgs[i+1], imgs[i+2], bl, fx)
    jax.block_until_ready(out)
    print(f'pair forward (varying): {1000*(time.perf_counter()-t0):.1f}ms')
# repeat same inputs (memoization check)
t0=time.perf_counter()
out = fn(imgs[0], imgs[1], imgs[2], bl, fx)
jax.block_until_ready(out)
print(f'pair forward (repeat same): {1000*(time.perf_counter()-t0):.1f}ms')
