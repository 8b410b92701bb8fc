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

# tilted (45-degree) cross directions (calTileDis cpp:3362-3381):
# 0=left-up, 1=right-down, 2=right-up, 3=left-down
TILT_DIRECTIONS = ((-1, -1), (1, 1), (-1, 1), (1, -1))

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
    directions=DIRECTIONS,
) -> jnp.ndarray:
    """Per-pixel cross arm lengths.

    img: [H, W, C] color (float, 0..255). Returns [4, H, W] int32 arm
    lengths in ``directions`` order (default left, right, up, down; pass
    TILT_DIRECTIONS for the 45-degree arms of calTileDis cpp:3352-3443).
    """
    sched = [c_in if k <= l_in else c_out for k in range(1, l_out + 1)]
    return _grow_arms(img, sched, c_in, min_arm, directions)


def _border_floor(h, w, dv, du, min_arm):
    v = jnp.arange(h, dtype=jnp.int32)[:, None]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    big = jnp.int32(1 << 30)
    dist_v = v if dv < 0 else (h - 1 - v if dv > 0 else big)
    dist_u = u if du < 0 else (w - 1 - u if du > 0 else big)
    dist = jnp.minimum(jnp.broadcast_to(dist_v, (h, w)),
                       jnp.broadcast_to(dist_u, (h, w)))
    return jnp.minimum(jnp.int32(min_arm), dist)


def _grow_arms(img, anchor_sched, neigh_thresh, min_arm, directions):
    """Shared arm-growth core: arm extends to step k while the max-channel
    |diff| to the PREVIOUS pixel stays <= neigh_thresh and to the ANCHOR
    stays <= anchor_sched[k-1] (judgeColorDif, cpp:2848-2856); lower clamp
    min(min_arm, distance to border) (cpp:3030-3041).

    TPU layout: opposite directions share their diff planes —
    |I(p-k a)-I(p)| is the +a anchor plane shifted by -k a, and every
    step's neighbor test is a shift of the ONE step-1 plane
    d1(q)=|I(q+a)-I(q)| — so the 2*l_out [H,W,3] reads per direction
    collapse to l_out reads per direction PAIR plus cheap bool-plane
    shifts (arms measured 4.4 ms/frame of the Teddy headline before,
    ~20x off bandwidth; the comparisons are bit-identical)."""
    img = img.astype(jnp.float32)
    h, w = img.shape[:2]
    l_out = len(anchor_sched)
    dirs = list(directions)
    arms = [None] * len(dirs)

    if tuple(dirs) == DIRECTIONS:
        from mystereomatching_tpu.ops import pallas_kernels as pk

        # whole-axis VMEM budget: the grow kernel holds the 3-channel
        # image block + diff scratch for the FULL reduction axis; at
        # full-res (1400-long axis) the scoped allocation exceeds the
        # 16 MB VMEM limit (measured round 5: 18.39M requested) — fall
        # back to the XLA tap chain beyond the fit
        fits = pk.arms_grow_fits(l_out, max(h, w))
        if pk.tpu_backend() and fits:
            # one VMEM-resident Pallas kernel per direction pair replaces
            # the ~130 dispatched [H,W] ops of the tap chain below
            # (bit-identical comparisons; interpret-mode parity in
            # tests/test_pallas.py)
            imgc = jnp.moveaxis(img, -1, 0)              # [3, H, W]
            fwd_v, bwd_v = pk.arms_grow_pallas(imgc, anchor_sched,
                                               neigh_thresh)
            fwd_h, bwd_h = pk.arms_grow_pallas(jnp.swapaxes(imgc, 1, 2),
                                               anchor_sched, neigh_thresh)
            raw = (bwd_h.T, fwd_h.T, bwd_v, fwd_v)       # L, R, U, D
            return jnp.stack([
                jnp.maximum(raw[i], _border_floor(h, w, dv, du, min_arm))
                for i, (dv, du) in enumerate(dirs)])

    def shift_bool(x, dv, du, k):
        if k == 0:
            return x
        return _shift(x[..., None], dv, du, k, False)[..., 0]

    paired = set()
    for i, (dv, du) in enumerate(dirs):
        if i in paired:
            continue
        j = next((jj for jj, dd in enumerate(dirs)
                  if jj != i and dd == (-dv, -du)), None)
        paired.add(i)
        if j is not None:
            paired.add(j)
        d1ok = (jnp.max(jnp.abs(_shift(img, dv, du, 1, _PAD_FAIL) - img),
                        axis=-1) <= neigh_thresh)
        alive_p = jnp.ones((h, w), jnp.bool_)
        alive_n = jnp.ones((h, w), jnp.bool_)
        arm_p = jnp.zeros((h, w), jnp.int32)
        arm_n = jnp.zeros((h, w), jnp.int32)
        for k in range(1, l_out + 1):
            adk = jnp.max(jnp.abs(_shift(img, dv, du, k, _PAD_FAIL) - img),
                          axis=-1)
            aok_p = adk <= anchor_sched[k - 1]
            alive_p = alive_p & aok_p & shift_bool(d1ok, dv, du, k - 1)
            arm_p = arm_p + alive_p.astype(jnp.int32)
            if j is not None:
                # |I(p-k a)-I(p)| == adk at p-k a; |I(p-k a)-I(p-(k-1)a)|
                # == d1 at p-k a
                alive_n = alive_n & shift_bool(aok_p, -dv, -du, k) \
                    & shift_bool(d1ok, -dv, -du, k)
                arm_n = arm_n + alive_n.astype(jnp.int32)
        arms[i] = jnp.maximum(arm_p, _border_floor(h, w, dv, du, min_arm))
        if j is not None:
            arms[j] = jnp.maximum(arm_n,
                                  _border_floor(h, w, -dv, -du, min_arm))
    return jnp.stack(arms)


def cross_arms_multilevel(
    img: jnp.ndarray,
    levels_l=(17, 23, 34),
    levels_t=(20, 30, 30),
    neigh_thresh: int = 20,
    min_arm: int = 1,
    directions=DIRECTIONS,
) -> jnp.ndarray:
    """Multi-level arm lists (calHorVerDis vector<int> overload,
    cpp:3152-3253; 3-threshold overload cpp:3053-3151): the anchor
    threshold steps down the level list — threshold[n] applies while
    arm <= levels_l[n]. The vector overload hard-codes the neighbor
    threshold to 20 (cpp:3209); the 3-threshold overload uses thresh0 —
    pass neigh_thresh accordingly."""
    sched = []
    for k in range(1, levels_l[-1] + 1):
        for ll, tt in zip(levels_l, levels_t):
            if k <= ll:
                sched.append(tt)
                break
    return _grow_arms(img, sched, neigh_thresh, min_arm, directions)


def cross_arms_adaptive(
    img: jnp.ndarray,
    l_in: int = 17,
    l_out: int = 34,
    c_in: int = 20,
    c_out: int = 6,
    min_arm: int = 1,
    directions=DIRECTIONS,
) -> jnp.ndarray:
    """Adaptive arms (calHorVerDis2, cpp:3255-3349): within l_in the anchor
    threshold decays linearly with distance,
    c_d(k) = int(C_D - C_D/L*k + 10) (C++ float expression truncated,
    cpp:3305), beyond it C_D_out applies; the neighbor threshold stays C_D.
    The reference keeps this variant commented out at its calArms call
    site (cpp:5362-5366)."""
    sched = [int(c_in - c_in / l_in * k + 10) if k <= l_in else c_out
             for k in range(1, l_out + 1)]
    return _grow_arms(img, sched, c_in, min_arm, directions)


def build_arms(img: jnp.ndarray, cfg, directions=DIRECTIONS) -> jnp.ndarray:
    """Config-dispatched arm construction (the calArms overload family,
    cpp:5354-5472): 'two_level' (default, calHorVerDis cpp:2959),
    'multilevel' (vector overload cpp:3152), 'adaptive' (calHorVerDis2
    cpp:3255)."""
    if cfg.cbca_arm_mode == "multilevel":
        return cross_arms_multilevel(img, cfg.cbca_cross_ls,
                                     cfg.cbca_c_threshes,
                                     cfg.cbca_ml_neigh_thresh,
                                     cfg.cbca_min_arm, directions)
    if cfg.cbca_arm_mode == "adaptive":
        return cross_arms_adaptive(img, cfg.cbca_cross_l,
                                   cfg.cbca_cross_l_out, cfg.cbca_c_thresh,
                                   cfg.cbca_c_thresh_out, cfg.cbca_min_arm,
                                   directions)
    return cross_arms(img, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                      cfg.cbca_c_thresh, cfg.cbca_c_thresh_out,
                      cfg.cbca_min_arm, directions)


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
        ref, oth, shift = arms_l, arms_r, 1
        ok = (u - d) >= 0
    else:
        ref, oth, shift = arms_r, arms_l, -1
        ok = (u + d) < w
    # D static rolls instead of a lane gather (TPU: gathers along the lane
    # axis are ~10x slower than static shifts); wraps are masked by `ok`.
    # Narrow storage: this tensor is the biggest CBCA operand (4*D*H*W) —
    # int8, with arms clamped to 127 (l_out <= 127 in any sane config; the
    # full-res D=256 configuration needs the 4x shrink to fit HBM). Each
    # disparity slice is masked and narrowed BEFORE stacking so no int32
    # [4,D,H,W] intermediate ever materializes.
    ref8 = jnp.minimum(ref, 127).astype(jnp.int8)
    oth8 = jnp.minimum(oth, 127).astype(jnp.int8)
    slices = []
    for dd in range(num_disp):
        m = jnp.minimum(ref8, jnp.roll(oth8, shift * dd, axis=-1))
        slices.append(jnp.where(ok[dd][None, None, :], m, jnp.int8(0)))
    return jnp.stack(slices, axis=1)                     # [4, D, H, W] int8


def intersect_arms_block(
    arms_l: jnp.ndarray, arms_r: jnp.ndarray, ds: jnp.ndarray, lor: int
) -> jnp.ndarray:
    """Per-disparity arm intersection for a traced disparity subset.

    D-streaming form of :func:`intersect_arms` (genTrueHorVerArms,
    cpp:2794-2845): ds is a traced int32 [Db]; the per-d shift becomes one
    [Db, W]-indexed gather (cheap relative to the aggregation taps it
    feeds). Returns [4, Db, H, W] int8.
    """
    w = arms_l.shape[-1]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    dd = ds.astype(jnp.int32)[:, None]
    if lor == 0:
        ref, oth = arms_l, arms_r
        idx = u - dd
        ok = idx >= 0
    else:
        ref, oth = arms_r, arms_l
        idx = u + dd
        ok = idx < w
    ref8 = jnp.minimum(ref, 127).astype(jnp.int8)
    oth8 = jnp.minimum(oth, 127).astype(jnp.int8)
    sh = jnp.take(oth8, jnp.clip(idx, 0, w - 1), axis=-1)   # [4, H, Db, W]
    sh = jnp.moveaxis(sh, -2, 1)                            # [4, Db, H, W]
    m = jnp.minimum(ref8[:, None], sh)
    return jnp.where(ok[None, :, None, :], m, jnp.int8(0))


def arm_bounded_sum(vol: jnp.ndarray, arm_neg: jnp.ndarray, arm_pos: jnp.ndarray,
                    axis: int, max_arm: int = 34) -> jnp.ndarray:
    """Sum of ``vol`` over [x - arm_neg, x + arm_pos] along ``axis``.

    Equivalent of gen1DCumu + cal1DCost (cpp:3896-3926, h:1643-1715).
    TPU-first formulation: per-element gathers along the lane axis are
    catastrophically slow on the VPU, so instead of prefix-sum +
    gather-difference this runs (2*max_arm + 1) STATIC shifted masked
    accumulations — a variable-footprint 1-D box "convolution". On TPU the
    tap loop runs as a hand-written Pallas kernel that keeps the block in
    VMEM (ops/pallas_kernels.py); elsewhere it falls back to the XLA
    formulation below. Arms must be border-clipped (cross_arms guarantees
    it) and bounded by ``max_arm`` (cbca_crossL_out).

    vol: any shape; arm_neg/arm_pos broadcastable to vol's shape.
    """
    return arm_bounded_reduce(vol, arm_neg, arm_pos, axis, max_arm, "sum")


def arm_bounded_reduce(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                       arm_pos: jnp.ndarray, axis: int, max_arm: int = 34,
                       op: str = "sum") -> jnp.ndarray:
    """Arm-bounded reduction (op: "sum" | "min" | "max") along ``axis``.

    min/max support the unanimity form of region vote (the reference's
    integer-ratio quirk, cpp:7266) without materializing a per-disparity
    histogram."""
    dispatched = _try_pallas(vol, arm_neg, arm_pos, axis, max_arm, op)
    if dispatched is not None:
        return dispatched
    return _arm_bounded_reduce_taps(vol, arm_neg, arm_pos, axis, max_arm, op)


def _try_pallas(vol, arm_neg, arm_pos, axis, max_arm, op="sum"):
    """Route to the Pallas VMEM-resident kernel when shapes permit.

    Accepted layouts (covering every call site): reduction axis is one of
    the trailing two (H, W) spatial dims; arms share the (H, W) extent and
    have leading dims that are all 1 or match vol's batch dim.
    """
    from mystereomatching_tpu.ops import pallas_kernels as pk

    if not pk.tpu_backend():
        return None
    nd = vol.ndim
    if axis not in (nd - 2, nd - 1) or nd < 3 or nd > 4:
        return None
    if arm_neg.shape[-2:] != vol.shape[-2:] or arm_neg.shape != arm_pos.shape:
        return None
    lead = arm_neg.shape[:-2]
    if any(s != 1 for s in lead[:-1]):       # only the innermost lead dim may be >1
        return None
    ba = np_prod(lead)
    if nd == 3:
        v4 = vol[None]                       # [1, B, H, W]
        b = vol.shape[0]
    else:
        v4 = vol
        b = vol.shape[1]
    if ba not in (1, b):
        return None
    an = arm_neg.reshape((ba,) + arm_neg.shape[-2:])
    ap = arm_pos.reshape((ba,) + arm_pos.shape[-2:])
    kaxis = 2 if axis == nd - 2 else 3
    out = pk.arm_bounded_sum_pallas(v4, an, ap, kaxis, max_arm, op=op)
    return out[0] if nd == 3 else out


def np_prod(xs) -> int:
    p = 1
    for x in xs:
        p *= int(x)
    return p


def _reduce_identity(dtype, op):
    if op == "sum":
        return 0
    info = (jnp.iinfo if jnp.issubdtype(dtype, jnp.integer) else jnp.finfo)(dtype)
    return info.max if op == "min" else info.min


def _arm_bounded_reduce_taps(vol, arm_neg, arm_pos, axis, max_arm, op="sum"):
    combine = {"sum": jnp.add, "min": jnp.minimum, "max": jnp.maximum}[op]
    ident = jnp.asarray(_reduce_identity(vol.dtype, op), vol.dtype)
    n = vol.shape[axis]
    pad_width = [(0, 0)] * vol.ndim
    pad_width[axis] = (max_arm, max_arm)
    padded = jnp.pad(vol, pad_width, constant_values=ident)

    def slc(k):
        ix = [slice(None)] * vol.ndim
        ix[axis] = slice(k + max_arm, k + max_arm + n)
        return padded[tuple(ix)]

    out = jnp.full_like(vol, ident)
    for k in range(-max_arm, max_arm + 1):
        shifted = slc(k)
        mask = (k >= -arm_neg) & (k <= arm_pos)
        out = combine(out, jnp.where(mask, shifted, ident))
    return out


def _arm_bounded_sum_taps(vol, arm_neg, arm_pos, axis, max_arm):
    return _arm_bounded_reduce_taps(vol, arm_neg, arm_pos, axis, max_arm, "sum")


def arm_bounded_sum_dir(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                        arm_pos: jnp.ndarray, step, max_arm: int = 34) -> jnp.ndarray:
    """Arm-bounded sum along an arbitrary 2-D step vector (for the tilted
    45-degree supports, cal_histogram_for_Tile cpp:6864-6910): the same
    static masked taps, shifting by k*step over the trailing (H, W) axes.
    """
    dv, du = step
    h, w = vol.shape[-2:]
    pad = [(0, 0)] * (vol.ndim - 2) + [(max_arm, max_arm), (max_arm, max_arm)]
    padded = jnp.pad(vol, pad)

    out = jnp.zeros_like(vol)
    for k in range(-max_arm, max_arm + 1):
        ov, ou = max_arm + k * dv, max_arm + k * du
        shifted = padded[..., ov:ov + h, ou:ou + w]
        mask = (k >= -arm_neg) & (k <= arm_pos)
        out = out + jnp.where(mask, shifted, jnp.zeros_like(shifted))
    return out


def arm_bounded_sum_with_area(vol: jnp.ndarray, arm_neg: jnp.ndarray,
                              arm_pos: jnp.ndarray, axis: int,
                              max_arm: int = 34):
    """(arm-bounded sum, support count) — the CBCA inner pass, where the
    area volume receives the identical transform (cbca_core cpp:5605-5616).
    The count needs no taps: it is exactly clip(arm_neg) + clip(arm_pos) + 1
    (the number of in-support offsets)."""
    out = arm_bounded_sum(vol, arm_neg, arm_pos, axis, max_arm)
    cnt = (jnp.minimum(arm_neg, max_arm) + jnp.minimum(arm_pos, max_arm)
           + 1).astype(vol.dtype)
    return out, jnp.broadcast_to(cnt, vol.shape)
