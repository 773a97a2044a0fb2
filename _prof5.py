import time, numpy as np, jax, jax.numpy as jnp

@jax.jit
def f(x):
    return x @ x

x = jnp.ones((256, 256))
jax.block_until_ready(f(x))
t0=time.perf_counter(); y = f(x); t1=time.perf_counter(); jax.block_until_ready(y); t2=time.perf_counter()
print(f"dispatch {1000*(t1-t0):.1f}ms  block {1000*(t2-t1):.1f}ms")
t0=time.perf_counter()
y = x
for i in range(5): y = f(y)
t1=time.perf_counter(); jax.block_until_ready(y); t2=time.perf_counter()
print(f"5 chained dispatch {1000*(t1-t0):.1f}ms  block {1000*(t2-t1):.1f}ms")
for shape in [(64,), (200,52), (1000,52), (480,640,2)]:
    a = jax.block_until_ready(jnp.ones(shape))
    t0=time.perf_counter()
    for _ in range(3): np.asarray(a)
    print(f"device_get {np.prod(shape)*4/1024:.0f}KB: {(time.perf_counter()-t0)/3*1000:.0f}ms")
for shape in [(200,52), (480,640,3)]:
    h = np.ones(shape, np.float32)
    t0=time.perf_counter()
    for _ in range(3): jax.block_until_ready(jax.device_put(h))
    print(f"device_put {np.prod(shape)*4/1024:.0f}KB: {(time.perf_counter()-t0)/3*1000:.0f}ms")
