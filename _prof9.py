import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from macvo_tpu.models.flowformer import FlowFormerCov, FlowFormerConfig
from macvo_tpu.models.flowformer.twins import TwinsSVT
from macvo_tpu.models.flowformer.encoder import MemoryEncoder
from macvo_tpu.models.flowformer.decoder import MemoryCovDecoder

cfg = FlowFormerConfig(encoder_dtype='bf16', decoder_dtype='bf16')
model = FlowFormerCov(cfg)
key = jax.random.PRNGKey(0)
imgs = jax.block_until_ready(jax.random.uniform(key, (5, 2, 480, 640, 3)))
params = model.init(jax.random.PRNGKey(0), imgs[0][:1,:64,:64], imgs[0][:1,:64,:64])['params']

def bench(name, fn, n=3):
    jax.block_until_ready(fn(0))
    t0=time.perf_counter()
    for i in range(1, n+1):
        jax.block_until_ready(fn(i))
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.1f}ms', flush=True)

# (a) encoder-side only: context + fnet feats + cost memory
def enc_only(i):
    img1 = (2.0*imgs[i % 5] - 1.0).astype(jnp.bfloat16)
    img2 = (2.0*imgs[(i+1) % 5] - 1.0).astype(jnp.bfloat16)
    ctx = TwinsSVT(name='context_encoder').apply({'params': {'': None}}, img1) if False else None
    return None
# simpler: use model.apply with capture of intermediate? Use model.apply but returning only cost_memory via a custom method is complex.
# Instead: build standalone submodule params from the model's params dict.
tw_ctx = TwinsSVT()
tw_params = params['context_encoder']
fe_params = params['feature_encoder']
me = MemoryEncoder()
me_params = params['memory_encoder']
dec = MemoryCovDecoder(decoder_depth=cfg.decoder_depth, dtype=jnp.bfloat16)
dec_params = params['memory_decoder']

@jax.jit
def encoder_chain(img1, img2):
    i1 = (2.0*img1 - 1.0).astype(jnp.bfloat16)
    i2 = (2.0*img2 - 1.0).astype(jnp.bfloat16)
    ctx = tw_ctx.apply({'params': tw_params}, i1)
    f1 = tw_ctx.apply({'params': fe_params}, i1)
    f2 = tw_ctx.apply({'params': fe_params}, i2)
    cm, cmaps = me.apply({'params': me_params}, f1, f2, ctx)
    return cm, cmaps, ctx

bench('encoder chain', lambda i: encoder_chain(imgs[i % 5], imgs[(i+1) % 5]))

outs = [jax.block_until_ready(encoder_chain(imgs[i], imgs[(i+1) % 5])) for i in range(3)]

@jax.jit
def dec_chain(cm, cmaps, ctx):
    return dec.apply({'params': dec_params}, cm, ctx.astype(jnp.float32), cmaps.astype(jnp.float32))['flow_final']

bench('decoder chain', lambda i: dec_chain(*outs[i % 3]))

@jax.jit
def full(img1, img2):
    out = model.apply({'params': params}, img1, img2)
    return out['flow_final'], out['cov_final']

bench('full model', lambda i: full(imgs[i % 5], imgs[(i+1) % 5]))
