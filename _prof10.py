import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from macvo_tpu.models.flowformer.twins import TwinsSVT
from macvo_tpu.models.flowformer.encoder import MemoryEncoder, CostPerceiverEncoder, all_pairs_correlation

key = jax.random.PRNGKey(0)
imgs = jax.block_until_ready(jax.random.uniform(key, (5, 2, 480, 640, 3), jnp.bfloat16))
tw = TwinsSVT()
tp = tw.init(jax.random.PRNGKey(0), imgs[0])['params']

def bench(name, fn, n=3):
    jax.block_until_ready(fn(0))
    t0=time.perf_counter()
    for i in range(1, n+1):
        jax.block_until_ready(fn(i))
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.1f}ms', flush=True)

@jax.jit
def three_twins(i1, i2):
    a = tw.apply({'params': tp}, i1)
    b = tw.apply({'params': tp}, i2)
    c = tw.apply({'params': tp}, i1)
    return a, b, c
bench('3x twins fused', lambda i: three_twins(imgs[i%5], imgs[(i+1)%5]))

feats = [jax.block_until_ready(tw.apply({'params': tp}, imgs[i])) for i in range(4)]

bench('cost volume', lambda i: jax.jit(all_pairs_correlation)(feats[i%4], feats[(i+1)%4]))

cms = [jax.block_until_ready(jax.jit(all_pairs_correlation)(feats[i%4], feats[(i+1)%4])) for i in range(4)]
pe = CostPerceiverEncoder()
pp_ = pe.init(jax.random.PRNGKey(0), cms[0], feats[0])['params']
@jax.jit
def perceiver(cm, ctx):
    return pe.apply({'params': pp_}, cm, ctx)
bench('perceiver', lambda i: perceiver(cms[i%4], feats[i%4]))
