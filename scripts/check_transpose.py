import time
import jax, jax.numpy as jnp, numpy as np

REPS = 20
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((60, 375, 450), np.float32))

def bench(fn, *args, iters=3):
    float(jnp.sum(fn(*args))); float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters): float(jnp.sum(fn(*args)))
    return ((time.perf_counter() - t0) / iters - 0.0246) / REPS

def chain(fn):
    def f(v):
        for _ in range(REPS): v = fn(v) * 1.000001
        return v
    return jax.jit(f)

print(f"swap -1,-2 : {bench(chain(lambda v: jnp.swapaxes(v, -1, -2)), x)*1e3:6.2f} ms")
print(f"flip H     : {bench(chain(lambda v: v[:, ::-1]), x)*1e3:6.2f} ms")
print(f"copy mul   : {bench(chain(lambda v: v), x)*1e3:6.2f} ms")
