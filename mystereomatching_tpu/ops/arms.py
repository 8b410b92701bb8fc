"""Cross-based support arms (Mei et al. / CBCA) — vectorized construction.

Re-design of the reference's arm machinery:
  * ``calHorVerDis`` (stereoMatching.cpp:2959-3253): per-pixel arm lengths in
    4 directions under the two-threshold inner/outer rule,
  * ``genTrueHorVerArms`` (cpp:2794-2845): per-disparity left/right arm
    intersection,
  * ``cal1DCost``/``gen1DCumu`` (h:1643-1715, cpp:3896-3926): arm-bounded
    1-D integral-image aggregation.

Instead of per-pixel while-loops, arm lengths are a cumulative-AND over
L_out shifted comparisons (data-parallel over H x W), and the arm-bounded
sums are a prefix-sum plus two gathers.

Arm rule (cpp:3009-3024): arm extends to length k (1-based) iff for every
j <= k: in-bounds AND max_c |I(p+j r)-I(p+(j-1) r)| <= C_D AND
max_c |I(p)-I(p+j r)| <= (C_D if j <= L else C_D_out). The final arm is
clamped below by min(minL, distance-to-border) (cpp:3030-3041).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# direction order matches the reference's cross channel order
# (cpp:2976-2995): 0=left(-u), 1=right(+u), 2=up(-v), 3=down(+v)
DIRECTIONS = ((0, -1), (0, 1), (-1, 0), (1, 0))

_PAD_FAIL = 10000.0  # padding value guaranteeing the anchor test fails


def _shift(img: jnp.ndarray, dv: int, du: int, k: int, fill: float) -> jnp.ndarray:
    """img[..., v + k*dv, u + k*du] with out-of-range -> fill. img [H,W,C]."""
    h, w = img.shape[0], img.shape[1]
    ov, ou = dv * k, du * k
    pv0, pv1 = max(0, -ov), max(0, ov)
    pu0, pu1 = max(0, -ou), max(0, ou)
    pad_width = ((pv0, pv1), (pu0, pu1)) + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad_width, constant_values=fill)
    return p[pv0 + ov: pv0 + ov + h, pu0 + ou: pu0 + ou + w]


def cross_arms(
    img: jnp.ndarray,
    l_in: int = 17,
    l_out: int = 34,
    c_in: int = 20,
    c_out: int = 6,
    min_arm: int = 1,
) -> jnp.ndarray:
    """Per-pixel cross arm lengths.

    img: [H, W, C] color (float, 0..255). Returns [4, H, W] int32 arm
    lengths in DIRECTIONS order (left, right, up, down).
    """
    img = img.astype(jnp.float32)
    h, w = img.shape[:2]
    arms = []
    for dv, du in DIRECTIONS:
        alive = jnp.ones((h, w), jnp.bool_)
        arm = jnp.zeros((h, w), jnp.int32)
        prev = img
        for k in range(1, l_out + 1):
            cur = _shift(img, dv, du, k, _PAD_FAIL)
            neigh_ok = jnp.max(jnp.abs(cur - prev), axis=-1) <= c_in
            thresh = c_in if k <= l_in else c_out
            anchor_ok = jnp.max(jnp.abs(cur - img), axis=-1) <= thresh
            alive = alive & neigh_ok & anchor_ok
            arm = arm + alive.astype(jnp.int32)
            prev = cur
        # lower clamp: min(min_arm, distance to border) (cpp:3030-3041)
        v = jnp.arange(h, dtype=jnp.int32)[:, None]
        u = jnp.arange(w, dtype=jnp.int32)[None, :]
        dist = {
            (0, -1): u, (0, 1): w - 1 - u, (-1, 0): v, (1, 0): h - 1 - v,
        }[(dv, du)]
        floor = jnp.minimum(jnp.int32(min_arm), dist)
        arms.append(jnp.maximum(arm, floor))
    return jnp.stack(arms)


def intersect_arms(
    arms_l: jnp.ndarray, arms_r: jnp.ndarray, num_disp: int, lor: int
) -> jnp.ndarray:
    """Per-disparity arm intersection (genTrueHorVerArms, cpp:2794-2845).

    For the left volume (lor=0): out[dir, d, v, u] =
    min(arms_l[dir, v, u], arms_r[dir, v, u-d]); entries whose matching
    pixel is off-image stay 0 (the reference memsets and `break`s,
    cpp:2799+2821). Returns [4, D, H, W] int32.
    """
    w = arms_l.shape[-1]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = jnp.arange(num_disp, dtype=jnp.int32)[:, None]
    if lor == 0:
        ref, oth, idx = arms_l, arms_r, u - d
        ok = idx >= 0
    else:
        ref, oth, idx = arms_r, arms_l, u + d
        ok = idx < w
    idx = jnp.clip(idx, 0, w - 1)                       # [D, W]
    sh = jnp.take(oth, idx, axis=-1)                    # [4, H, D, W]
    sh = jnp.moveaxis(sh, 2, 1)                         # [4, D, H, W]
    out = jnp.minimum(ref[:, None], sh)
    return jnp.where(ok[None, :, None, :], out, 0)


def arm_bounded_sum(vol: jnp.ndarray, arm_neg: jnp.ndarray, arm_pos: jnp.ndarray,
                    axis: int) -> jnp.ndarray:
    """Sum of ``vol`` over [x - arm_neg, x + arm_pos] along ``axis``.

    Equivalent of gen1DCumu + cal1DCost (cpp:3896-3926, h:1643-1715):
    prefix-sum then gather-difference. Arms must already be border-clipped
    (guaranteed by cross_arms/intersect_arms).

    vol: any shape; arm_neg/arm_pos broadcastable to vol's shape.
    """
    n = vol.shape[axis]
    cum = jnp.cumsum(vol, axis=axis)
    pos = jnp.arange(n, dtype=jnp.int32)
    shape = [1] * vol.ndim
    shape[axis] = n
    pos = pos.reshape(shape)
    head = jnp.clip(pos + arm_pos, 0, n - 1)
    tail = pos - arm_neg - 1                            # may be -1
    head_b = jnp.broadcast_to(head, vol.shape)
    tail_b = jnp.broadcast_to(jnp.maximum(tail, 0), vol.shape)
    s = jnp.take_along_axis(cum, head_b, axis=axis)
    s_tail = jnp.take_along_axis(cum, tail_b, axis=axis)
    return s - jnp.where(jnp.broadcast_to(tail, vol.shape) >= 0, s_tail, 0)
