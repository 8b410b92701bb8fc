import time
import jax, jax.numpy as jnp, numpy as np

rng = np.random.default_rng(0)

def timecall(fn, *args, iters=5):
    fn(*args); fn(*args)
    t0 = time.perf_counter()
    for _ in range(iters): fn(*args)
    return (time.perf_counter() - t0) / iters

for mb in (1, 10, 40, 160):
    n = mb * 1024 * 1024 // 4
    x = jax.device_put(jnp.asarray(rng.random(n, np.float32)))
    f1 = jax.jit(lambda v: jnp.sum(v * 1.0001))
    t = timecall(lambda v: float(f1(v)), x)
    print(f"in={mb:4d}MB 1-pass sum     : {t*1e3:8.2f} ms")
    f8 = jax.jit(lambda v: sum(jnp.sum(v * (1.0 + 1e-6 * k)) for k in range(8)))
    t = timecall(lambda v: float(f8(v)), x)
    print(f"in={mb:4d}MB 8-pass sums    : {t*1e3:8.2f} ms")

# no-input dispatch cost
f0 = jax.jit(lambda: jnp.sum(jnp.ones((128, 128))))
t = timecall(lambda: float(f0()))
print(f"no-input dispatch       : {t*1e3:8.2f} ms")

# device-to-device chained call: output of call 1 feeds call 2 (does it stay?)
x = jax.device_put(jnp.asarray(rng.random(40*1024*1024//4, np.float32)))
g = jax.jit(lambda v: v * 1.0001)
def two(v):
    a = g(v); b = g(a); return float(jnp.sum(b))
t = timecall(two, x)
print(f"two chained 40MB calls  : {t*1e3:8.2f} ms")
