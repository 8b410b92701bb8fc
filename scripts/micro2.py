import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import arms as A

D, H, W, MAX_ARM, REPS = 60, 375, 450, 34, 20

def sync(x): return float(jnp.sum(x.astype(jnp.float32)))

def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
img2 = jnp.roll(img, 3, axis=1)
vol = jnp.asarray(rng.random((D, H, W), np.float32))
a0 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img)
a1 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img2)
ai = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)

def chain(passfn):
    def f(v, an, ap):
        for _ in range(REPS):
            v = passfn(v, an, ap) * 1e-2   # keep magnitudes sane
        return v
    return jax.jit(f)

for axis, name in ((1, "H(sublane)"), (2, "W(lane)")):
    an, ap = (ai[2], ai[3]) if axis == 1 else (ai[0], ai[1])
    tp = bench(chain(lambda v, n, p: A._arm_bounded_sum_taps(v, n, p, axis, MAX_ARM)), vol, an, ap)
    tg = bench(chain(lambda v, n, p: A._try_pallas(v, n, p, axis, MAX_ARM)), vol, an, ap)
    print(f"pass {name}: taps {tp/REPS*1e3:7.3f} ms   pallas {tg/REPS*1e3:7.3f} ms")
