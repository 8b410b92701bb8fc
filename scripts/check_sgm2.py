import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import sgm as S
from mystereomatching_tpu.ops import pallas_kernels as pk

D, H, W, REPS = 60, 375, 450, 6

def sync(x): return float(jnp.sum(x))
def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters / REPS

rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
vol4 = jnp.asarray(rng.random((4, D, H, W), np.float32))
ps4 = jnp.asarray(rng.random((4, H, W), np.float32))

def chain(fn):
    def f(x, *a):
        for _ in range(REPS): x = fn(x, *a) * 1e-2
        return x
    return jax.jit(f)

t = bench(chain(lambda v, p: pk.sgm_scan_pallas(v, p)), vol4, ps4)
print(f"raw pallas scan G=4 vert:   {t*1e3:7.2f} ms")

volT = jnp.swapaxes(vol4, 2, 3)
psT = jnp.swapaxes(ps4, 1, 2)
t = bench(chain(lambda v, p: pk.sgm_scan_pallas(v, p)), volT, psT)
print(f"raw pallas scan G=4 horiT:  {t*1e3:7.2f} ms")

t = bench(chain(lambda v, p: jnp.swapaxes(pk.sgm_scan_pallas(
    jnp.swapaxes(v, 2, 3), jnp.swapaxes(p, 1, 2)), 2, 3)), vol4, ps4)
print(f"pallas + transposes:        {t*1e3:7.2f} ms")

vol = vol4[0]
t = bench(chain(lambda v, im: S.sgm(v, im, 4)), vol, img)
print(f"sgm 1vol 4dir:              {t*1e3:7.2f} ms")
