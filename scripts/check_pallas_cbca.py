"""Verify + time the Pallas arm-bounded-sum against the XLA taps on TPU."""

import os
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu.ops import arms as A
from mystereomatching_tpu.ops import aggregation as agg
from mystereomatching_tpu.ops import pallas_kernels as pk

D, H, W = 60, 375, 450
MAX_ARM = 34


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, iters=5):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.devices()[0].platform, "pallas:", pk.tpu_backend())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
    img2 = jnp.roll(img, 3, axis=1)
    vol = jnp.asarray(rng.random((D, H, W), np.float32))

    arms_fn = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))
    a0, a1 = arms_fn(img), arms_fn(img2)
    arms_int = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)

    # correctness: single pass, both axes
    for axis in (1, 2):
        an, ap = (arms_int[0], arms_int[1]) if axis == 2 else (arms_int[2], arms_int[3])
        ref = jax.jit(lambda v, n, p: A._arm_bounded_sum_taps(v, n, p, axis, MAX_ARM))(vol, an, ap)
        got = jax.jit(lambda v, n, p: A._try_pallas(v, n, p, axis, MAX_ARM))(vol, an, ap)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"axis={axis} max|diff| = {err:.2e}")
        assert err < 1e-4, err

    # full cbca correctness
    cb_ref = jax.jit(lambda v, ai: _cbca_taps(v, ai))(vol, arms_int)
    cb_new = jax.jit(lambda v, ai: agg.cbca(v, ai, 2, MAX_ARM))(vol, arms_int)
    err = float(jnp.max(jnp.abs(cb_ref - cb_new)))
    print(f"cbca max|diff| = {err:.2e}")

    t_ref = bench(jax.jit(lambda v, ai: _cbca_taps(v, ai)), vol, arms_int)
    t_new = bench(jax.jit(lambda v, ai: agg.cbca(v, ai, 2, MAX_ARM)), vol, arms_int)
    print(f"cbca taps  : {t_ref*1e3:8.2f} ms")
    print(f"cbca pallas: {t_new*1e3:8.2f} ms   speedup {t_ref/t_new:.1f}x")


def _cbca_taps(vol, arms_int, iterations=2, max_arm=MAX_ARM):
    armL, armR, armU, armD = (arms_int[i] for i in range(4))
    for it in range(iterations):
        p1, p2 = (((2, armL, armR), (1, armU, armD)) if it % 2 == 0 else
                  ((1, armU, armD), (2, armL, armR)))
        ax, an, ap = p1
        vol = A._arm_bounded_sum_taps(vol, an, ap, ax, max_arm)
        area = (jnp.minimum(an, max_arm) + jnp.minimum(ap, max_arm) + 1).astype(vol.dtype)
        area = jnp.broadcast_to(area, vol.shape)
        ax, an, ap = p2
        stacked = jnp.stack([vol, area])
        stacked = A._arm_bounded_sum_taps(stacked, an[None], ap[None], ax + 1, max_arm)
        vol = stacked[0] / jnp.maximum(stacked[1], 1.0)
    return vol


if __name__ == "__main__" and not os.environ.get("MICRO"):
    main()


def micro():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
    img2 = jnp.roll(img, 3, axis=1)
    vol = jnp.asarray(rng.random((D, H, W), np.float32))
    a0 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img)
    a1 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img2)
    arms_int = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)
    for axis, name in ((1, "H(sublane)"), (2, "W(lane)")):
        an, ap = (arms_int[2], arms_int[3]) if axis == 1 else (arms_int[0], arms_int[1])
        tp = bench(jax.jit(lambda v, n, p: A._arm_bounded_sum_taps(v, n, p, axis, MAX_ARM)), vol, an, ap)
        tg = bench(jax.jit(lambda v, n, p: A._try_pallas(v, n, p, axis, MAX_ARM)), vol, an, ap)
        print(f"pass {name}: taps {tp*1e3:7.2f} ms   pallas {tg*1e3:7.2f} ms")


if __name__ == "__main__" and os.environ.get("MICRO"):
    micro()
