import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import refine as R

H, W, REPS = 375, 450, 6
rng = np.random.default_rng(0)
disp = jnp.asarray(rng.integers(-1, 59, (H, W)), jnp.int32)
img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)

def sync(x): return float(jnp.sum(x.astype(jnp.float32)))
def chain(fn):
    def f(d, *a):
        for _ in range(REPS): d = fn(d, *a)
        return d
    return jax.jit(f)

f = chain(lambda d: R.proper_interpolation(d, img, 20))
t0 = time.perf_counter(); sync(f(disp)); print(f"compile+1st: {time.perf_counter()-t0:.1f}s")
sync(f(disp))
t0 = time.perf_counter()
for _ in range(3): sync(f(disp))
t = (time.perf_counter() - t0) / 3 / REPS
print(f"PI pallas: {t*1e3:7.2f} ms (incl ~{24.6/REPS:.1f} dispatch)")
