import time, numpy as np, jax, jax.numpy as jnp
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from macvo_tpu.models.flowformer import FlowFormerCov, FlowFormerConfig, TwinsSVT
from macvo_tpu.models.flowformer.encoder import MemoryEncoder
from macvo_tpu.models.flowformer.decoder import MemoryCovDecoder, encode_flow_token, coords_grid

B, H, W = 2, 480, 640
h1, w1 = H//8, W//8
key = jax.random.PRNGKey(0)
imgs = jax.block_until_ready(jax.random.uniform(key, (4, B, H, W, 3), jnp.bfloat16))

def bench(name, fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for a in args_list[1:]:
        jax.block_until_ready(fn(*a))
    print(f'{name}: {(time.perf_counter()-t0)/(len(args_list)-1)*1000:.1f}ms')

twins = TwinsSVT()
tp = twins.init(jax.random.PRNGKey(0), imgs[0])['params']
tw = jax.jit(lambda p, x: twins.apply({'params': p}, x))
bench('twins', tw, [(tp, imgs[i]) for i in range(4)])
feats = [jax.block_until_ready(tw(tp, imgs[i])) for i in range(4)]

me = MemoryEncoder()
mp = me.init(jax.random.PRNGKey(0), feats[0], feats[0], feats[0])['params']
mef = jax.jit(lambda p, a, b, c: me.apply({'params': p}, a, b, c))
bench('memory encoder', mef, [(mp, feats[i], feats[(i+1)%4], feats[i]) for i in range(4)])
cms = [jax.block_until_ready(mef(mp, feats[i], feats[(i+1)%4], feats[i])) for i in range(4)]

for depth in (1, 12):
    dec = MemoryCovDecoder(decoder_depth=depth, dtype=jnp.bfloat16)
    ctx0 = feats[0].astype(jnp.float32)
    dp = dec.init(jax.random.PRNGKey(0), cms[0][0], ctx0, cms[0][1].astype(jnp.float32))['params']
    df = jax.jit(lambda p, cm, ctx, cmap: dec.apply({'params': p}, cm, ctx, cmap)['flow_final'])
    bench(f'decoder depth={depth}', df, [(dp, cms[i][0], feats[i].astype(jnp.float32), cms[i][1].astype(jnp.float32)) for i in range(4)])

coords = coords_grid(B, h1, w1)
eft = jax.jit(encode_flow_token)
bench('encode_flow_token x1', eft, [(cms[i][1].astype(jnp.float32), coords + i) for i in range(4)])
