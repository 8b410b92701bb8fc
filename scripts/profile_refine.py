import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu import pipeline as P
from mystereomatching_tpu.ops import refine as R
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.data import make_synthetic_pair

H, W, D, REPS = 375, 450, 60, 6
cfg = default_config(max_disp=D - 1)
pair = make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=0)
left = jnp.asarray(pair.left, jnp.float32)
right = jnp.asarray(pair.right, jnp.float32)

def sync(x): return float(jnp.sum(x.astype(jnp.float32)))
def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters / REPS

arms0 = jax.jit(lambda i: arms_ops.cross_arms(i, 17, 34, 20, 6, 1))(left)
rng = np.random.default_rng(0)
disp = jnp.asarray(rng.integers(-1, D, (H, W)), jnp.int32)
dr = jnp.asarray(rng.integers(0, D, (H, W)), jnp.int32)
vol = jnp.asarray(rng.random((D, H, W), np.float32))

def chain(fn):
    def f(d, *a):
        for _ in range(REPS):
            d = fn(d, *a)
        return d
    return jax.jit(f)

t = bench(chain(lambda d: R.lr_consistency(jnp.abs(d), dr, 0)), disp)
print(f"lrc        {t*1e3:7.2f} ms")
t = bench(chain(lambda d: R.region_vote(d, arms0, D, 20, 0.4, True, 34)), disp)
print(f"regionvote {t*1e3:7.2f} ms")
t = bench(chain(lambda d: R.proper_interpolation(d, left, 20)), disp)
print(f"properipol {t*1e3:7.2f} ms")
t = bench(chain(lambda d: R.median_blur_disp(d, 3)), disp)
print(f"median3    {t*1e3:7.2f} ms")
