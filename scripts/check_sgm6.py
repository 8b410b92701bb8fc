import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import sgm as S
from mystereomatching_tpu.ops import pallas_kernels as pk

D, H, W, REPS = 60, 375, 450, 10
rng = np.random.default_rng(0)
imgL = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
imgR = jnp.roll(imgL, 3, axis=1)
volL = jnp.asarray(rng.random((D, H, W), np.float32))
volR = jnp.roll(volL, 1, axis=2)

def sync(x): return float(jnp.sum(x))
def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return ((time.perf_counter() - t0) / iters - 0.0246) / REPS

def chain(fn):
    def f(x, y):
        for _ in range(REPS):
            x = fn(x, y) * 1e-2
        return x
    return jax.jit(f)

t = bench(chain(lambda x, y: sum(S.sgm_multi([x, y], [imgL, imgR], 4))), volL, volR)
print(f"sgm_multi 2vol 4dir: {t*1e3:6.2f} ms (dispatch-corrected)")
vol4 = jnp.stack([volL, volR, volL, volR])
ps4 = jnp.asarray(rng.random((4, H, W), np.float32))
t = bench(chain(lambda x, y: pk.sgm_scan_pallas(x, ps4)), vol4, volR)
print(f"raw kernel G=4 only: {t*1e3:6.2f} ms")
