"""Disparity refinement (L4): vectorized post-processing passes.

TPU-native re-designs of the reference refinement suite (refine()
stereoMatching.cpp:1138-1511). Disparity maps are int32 [H,W]; invalid
pixels carry negative sentinels (DISP_INV=-16, DISP_OCC=-32, DISP_MIS=-48
h:215-218; the plain LRC uses -1, cpp:2277). Each reference per-pixel
search loop becomes a fixed set of masked dense passes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.ops.arms import arm_bounded_reduce, arm_bounded_sum
from mystereomatching_tpu.ops.median import median_small, median_masked


# ---------------------------------------------------------------------------
# LR consistency (LRConsistencyCheck_normal cpp:2262-2282 / classifying 2284-2364)
# ---------------------------------------------------------------------------

def lr_consistency(d_left: jnp.ndarray, d_right: jnp.ndarray,
                   max_diff: int = 0, num_disp: int = None) -> jnp.ndarray:
    """Plain LRC: invalidate (-1) where d<0, u-d<0, or
    |d_L(u) - d_R(u-d)| > max_diff (cpp:2262-2282).

    When ``num_disp`` is given, the matched-pixel lookup runs as D static
    rolls + selects instead of a per-element lane gather (~5x on TPU)."""
    h, w = d_left.shape
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    x = u - d_left
    ok_range = (d_left >= 0) & (x >= 0)
    if num_disp is not None:
        dr = jnp.zeros_like(d_left)
        for dd in range(num_disp):
            dr = jnp.where(d_left == dd, jnp.roll(d_right, dd, axis=1), dr)
    else:
        xc = jnp.clip(x, 0, w - 1)
        dr = jnp.take_along_axis(d_right, xc, axis=1)
    ok = ok_range & (jnp.abs(d_left - dr) <= max_diff)
    return jnp.where(ok, d_left, -1)


def lr_consistency_classify(d_left: jnp.ndarray, d_right: jnp.ndarray,
                            num_disp: int, max_diff: int = 0,
                            disp_occ: int = -32, disp_mis: int = -48) -> jnp.ndarray:
    """Classifying LRC (cpp:2284-2364): failed pixels become DISP_MIS if
    any d' has d_R(u-d') == d' (some right pixel maps onto u), else
    DISP_OCC. The existence test is a scatter: right pixel x maps to
    column x + d_R(x). (A D-static-shift formulation avoids the
    scatter/gather pair but its D=256 unrolled graph stalls the TPU
    compiler >25min — not worth 100ms/frame at full-res.)"""
    h, w = d_left.shape
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    x = u - d_left
    ok_range = (d_left >= 0) & (x >= 0)
    xc = jnp.clip(x, 0, w - 1)
    dr = jnp.take_along_axis(d_right, xc, axis=1)
    ok = ok_range & (jnp.abs(d_left - dr) <= max_diff)

    # mark[u] = exists x: x + d_R(x) == u with 0 <= d_R(x) < num_disp
    tgt = u + d_right
    valid_src = (d_right >= 0) & (d_right < num_disp) & (tgt < w)
    tgtc = jnp.clip(tgt, 0, w - 1)
    mark = jnp.zeros((h, w), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    mark = mark.at[rows, tgtc].add(valid_src.astype(jnp.int32))
    mis = mark > 0
    fill = jnp.where(mis, disp_mis, disp_occ)
    return jnp.where(ok, d_left, fill)


# ---------------------------------------------------------------------------
# PKR (calPKR cpp:4087-4126, signDp_UsingPKR 4128-4140)
# ---------------------------------------------------------------------------

def pkr_mask(vol: jnp.ndarray, thresh: float = 0.1) -> jnp.ndarray:
    """True where the peak ratio (c2-c1)/c2 between the two smallest costs
    is below thresh — ambiguous (calPKR, cpp:4087-4126).

    c2 is the plain second-smallest: the reference masks ONLY the first
    occurrence of the minimum (vmP[disp]=max, cpp:4115) before re-scanning,
    so duplicated minima give c2 == c1 -> ratio 0 -> ambiguous. The C++
    division has no epsilon: c1 == c2 == 0 gives nan, and nan < thresh is
    false — reproduced by dividing plainly."""
    d_, h, w = vol.shape
    best = jnp.argmin(vol, 0)                   # first occurrence, like <
    c1 = jnp.min(vol, 0)
    ds = jnp.arange(d_, dtype=jnp.int32)[:, None, None]
    c2 = jnp.min(jnp.where(ds == best[None], jnp.inf, vol), 0)
    ratio = (c2 - c1) / c2
    return ratio < thresh


def apply_pkr(disp: jnp.ndarray, vol: jnp.ndarray, thresh: float = 0.1,
              disp_pkr: int = -64) -> jnp.ndarray:
    """signDp_UsingPKR (cpp:4128-4140): stamp DISP_PKR on ambiguous pixels,
    but only where the map still holds a VALID (>= 0) disparity."""
    return jnp.where(pkr_mask(vol, thresh) & (disp >= 0), disp_pkr, disp)


# ---------------------------------------------------------------------------
# Region vote (regionVote_my cpp:7219-7277, cal_histogram_for_HV 6830-6862)
# ---------------------------------------------------------------------------

def region_vote(
    disp: jnp.ndarray,
    arms: jnp.ndarray,
    num_disp: int,
    s_thres: int = 20,
    h_ratio: float = 0.4,
    int_ratio_quirk: bool = True,
    max_arm: int = 34,
) -> jnp.ndarray:
    """One region-vote pass: for each invalid pixel, histogram the valid
    disparities inside its cross support (rows spanned by the anchor's
    vertical arms; per-row horizontal arms sampled at the anchor column,
    cpp:7238-7254) and adopt the majority disparity when validNum > s_thres
    and the majority ratio passes.

    ``int_ratio_quirk`` reproduces the reference's C++ integer division in
    `hist[dispMost] / validNum >= rv_ratio` (cpp:7266) which effectively
    requires ALL valid support pixels to agree; disable it for the intended
    float-ratio behavior (as in cal_histogram_for_HV cpp:6861).
    """
    d_ = num_disp
    valid = disp >= 0
    if int_ratio_quirk:
        # Unanimity form: all-agree <=> support min == support max, so the
        # per-disparity histogram (D+1 aggregated planes) collapses to 3:
        # min(disp), max(disp) (as min of -disp, one stacked pass), count.
        big = jnp.iinfo(jnp.int32).max
        dmin_in = jnp.where(valid, disp, big).astype(jnp.int32)
        dmax_in = jnp.where(valid, -disp, big).astype(jnp.int32)
        mm = jnp.stack([dmin_in, dmax_in])
        mm = arm_bounded_reduce(mm, arms[0][None], arms[1][None], axis=2,
                                max_arm=max_arm, op="min")
        mm = arm_bounded_reduce(mm, arms[2][None], arms[3][None], axis=1,
                                max_arm=max_arm, op="min")
        vcount = arm_bounded_sum(valid.astype(jnp.int32)[None],
                                 arms[0][None], arms[1][None], axis=2,
                                 max_arm=max_arm)
        vcount = arm_bounded_sum(vcount, arms[2][None], arms[3][None],
                                 axis=1, max_arm=max_arm)[0]
        dmin, dmax = mm[0], -mm[1]
        unanimous = (dmin == dmax) & (dmin != big)
        accept = (~valid) & (vcount > s_thres) & unanimous
        return jnp.where(accept, dmin.astype(disp.dtype), disp)

    onehot = (disp[None] == jnp.arange(d_, dtype=disp.dtype)[:, None, None])
    onehot = (onehot & valid[None]).astype(jnp.int32)  # int32: exact counts
    # H pass with each pixel's own horizontal arms, then V pass with the
    # anchor's vertical arms — matches the reference's loop structure.
    # The valid-count plane rides along as an extra "disparity" slice so
    # both aggregations happen in one fused tap loop.
    stacked = jnp.concatenate([onehot, valid[None].astype(jnp.int32)], axis=0)
    stacked = arm_bounded_sum(stacked, arms[0][None], arms[1][None], axis=2,
                              max_arm=max_arm)
    stacked = arm_bounded_sum(stacked, arms[2][None], arms[3][None], axis=1,
                              max_arm=max_arm)
    hist, vcount = stacked[:d_], stacked[d_]

    disp_most = jnp.argmax(hist, 0).astype(disp.dtype)
    n_most = jnp.max(hist, 0)
    # float64-free exact ratio test: n/v >= r  <=>  n >= r*v, with r a
    # rational-safe comparison done in float64-equivalent integers
    ratio_ok = n_most.astype(jnp.float32) * 10 >= (
        jnp.float32(h_ratio * 10) * vcount.astype(jnp.float32))
    accept = (~valid) & (vcount > s_thres) & ratio_ok
    return jnp.where(accept, disp_most, disp)


def _vote_result(hist, vcount, s_thres, h_ratio):
    """Shared tail of cal_histogram_for_HV/Tile (cpp:6853-6861, 6902-6910):
    -1 unless validNum > s_thres and ratioMost > h_ratio (both strict);
    argmax ties go to the smaller disparity."""
    disp_most = jnp.argmax(hist, 0).astype(jnp.int32)
    n_most = jnp.max(hist, 0)
    ok = (vcount > s_thres) & (
        n_most.astype(jnp.float32) > jnp.float32(h_ratio)
        * vcount.astype(jnp.float32))
    return jnp.where(ok, disp_most, -1)


def _vote_stack(disp, num_disp):
    """[D+1,H,W] int32: per-disparity one-hot planes + a valid-count plane,
    so both vote aggregations run as one fused arm-bounded pass."""
    valid = disp >= 0
    onehot = (disp[None] == jnp.arange(num_disp, dtype=disp.dtype)[:, None, None])
    onehot = (onehot & valid[None]).astype(jnp.int32)
    return jnp.concatenate([onehot, valid[None].astype(jnp.int32)], axis=0)


def vote_hv(disp: jnp.ndarray, arms: jnp.ndarray, num_disp: int,
            s_thres: int, h_ratio: float, max_arm: int = 34) -> jnp.ndarray:
    """cal_histogram_for_HV (cpp:6830-6862): histogram vote over the HV
    cross support (per-row horizontal arms sampled at the anchor column,
    rows spanned by the anchor's vertical arms). Returns the per-pixel vote
    (-1 where rejected) for EVERY pixel; callers mask."""
    stacked = _vote_stack(disp, num_disp)
    stacked = arm_bounded_sum(stacked, arms[0][None], arms[1][None], axis=2,
                              max_arm=max_arm)
    stacked = arm_bounded_sum(stacked, arms[2][None], arms[3][None], axis=1,
                              max_arm=max_arm)
    return _vote_result(stacked[:num_disp], stacked[num_disp],
                        s_thres, h_ratio)


def vote_tilt(disp: jnp.ndarray, arms_tilt: jnp.ndarray, num_disp: int,
              s_thres: int, h_ratio: float, max_arm: int = 34) -> jnp.ndarray:
    """cal_histogram_for_Tile (cpp:6864-6911): the 45-degree vote. Branch
    pass along (1,1) with each pixel's own LT/RD arms (tileCrossL[0]/[1]),
    then main pass along (1,-1) with the anchor's RT/LD arms ([2]/[3]).
    The reference's two-point anchor extension is dead code (`point < 1`,
    cpp:6874) — only the anchor votes, as here."""
    from mystereomatching_tpu.ops.arms import arm_bounded_sum_dir

    stacked = _vote_stack(disp, num_disp)
    stacked = arm_bounded_sum_dir(stacked, arms_tilt[0][None],
                                  arms_tilt[1][None], (1, 1), max_arm)
    stacked = arm_bounded_sum_dir(stacked, arms_tilt[2][None],
                                  arms_tilt[3][None], (1, -1), max_arm)
    return _vote_result(stacked[:num_disp], stacked[num_disp],
                        s_thres, h_ratio)


def region_vote_core(disp: jnp.ndarray, arms: jnp.ndarray,
                     arms_tilt: Optional[jnp.ndarray], num_disp: int,
                     s_thres: int, h_ratio: float, reg_vote_type: int = 0,
                     max_arm: int = 34) -> jnp.ndarray:
    """regionVoteCore (cpp:6925-6947) with the regVote_type dispatch the
    reference keeps commented out (cpp:6927-6941): 0 = HV vote, 1 = tilted
    vote, 2 = per-pixel gate by compareArmL (cpp:6913-6923: HV arm total
    strictly longer -> HV, else tilted)."""
    if reg_vote_type == 0:
        return vote_hv(disp, arms, num_disp, s_thres, h_ratio, max_arm)
    if reg_vote_type == 1:
        return vote_tilt(disp, arms_tilt, num_disp, s_thres, h_ratio, max_arm)
    hv = vote_hv(disp, arms, num_disp, s_thres, h_ratio, max_arm)
    tl = vote_tilt(disp, arms_tilt, num_disp, s_thres, h_ratio, max_arm)
    len_hv = jnp.sum(arms[:4].astype(jnp.int32), axis=0)
    len_tl = jnp.sum(arms_tilt[:4].astype(jnp.int32), axis=0)
    return jnp.where(len_hv > len_tl, hv, tl)


def region_vote_whole_image(disp: jnp.ndarray, arms: jnp.ndarray,
                            num_disp: int, max_arm: int = 34) -> jnp.ndarray:
    """regionVoteForWholeDispImg (cpp:6949-6962): EVERY pixel is replaced by
    its HV-region majority vote with thresholds (0, 0) — -1 where the
    support has no valid pixel. The reference mutates the map in place
    during its raster scan (later votes see earlier replacements); this
    TPU version votes on a snapshot of the input, i.e. one parallel
    Jacobi step of the same update."""
    return vote_hv(disp, arms, num_disp, 0, 0.0, max_arm)


def bg_fill_2dir(disp: jnp.ndarray, depth: int = 1000,
                 num_disp: int = 1024):
    """backgroundInterpolateCore (cpp:7010-7044): first valid disparity to
    the right (vec[0]) and left (vec[1]) within ``depth`` steps; one found
    -> that one, both -> the smaller (background). Returns (fill, n_found)
    with fill -1 where neither side hits (the (int*)-result overload
    cpp:6964-7008 returns exactly this pair for interpolateType 3)."""
    w = disp.shape[1]
    if depth >= w - 1:
        right = _nearest_valid_left(disp[:, ::-1], num_disp)[:, ::-1]
        left = _nearest_valid_left(disp, num_disp)
    else:
        right = jnp.full_like(disp, -1)
        left = jnp.full_like(disp, -1)
        for d in range(1, depth + 1):
            r = _shift2d(disp, 0, d, -1)
            l = _shift2d(disp, 0, -d, -1)
            right = jnp.where((right < 0) & (r >= 0), r, right)
            left = jnp.where((left < 0) & (l >= 0), l, left)
    n_found = (left >= 0).astype(jnp.int32) + (right >= 0).astype(jnp.int32)
    both = (left >= 0) & (right >= 0)
    fill = jnp.where(both, jnp.minimum(left, right),
                     jnp.maximum(left, right))
    return fill, n_found


def _nearest_valid_with_index(disp: jnp.ndarray, axis: int, reverse: bool):
    """(value, source index) of the nearest valid pixel strictly before
    self along axis (after optional flip); (-1, -1) if none."""
    x = disp if not reverse else jnp.flip(disp, axis)
    n = x.shape[axis]
    pos = jnp.arange(n, dtype=jnp.int32).reshape(
        [-1 if a == axis else 1 for a in range(x.ndim)])
    idx = jnp.where(x >= 0, pos, -1)
    # exclusive-of-self: shift the index plane one step forward
    idx = _shift2d(idx, -1 if axis == 0 else 0, -1 if axis == 1 else 0, -1)
    last = jax_cummax(jnp.broadcast_to(idx, x.shape), axis=axis)
    val = jnp.take_along_axis(x, jnp.clip(last, 0, n - 1), axis=axis)
    val = jnp.where(last >= 0, val, -1)
    if reverse:
        val = jnp.flip(val, axis)
        last = jnp.flip(last, axis)
        last = jnp.where(last >= 0, n - 1 - last, -1)
    return val, last


def bg_fill_4dir(disp: jnp.ndarray, image: jnp.ndarray,
                 depth: int = 1000) -> jnp.ndarray:
    """backgroundInterpolateCore_ (cpp:7045-7144): the 4-direction
    color-checked background fill. Per direction (L, R, U, D) take the first
    valid disparity along the ray within ``depth`` steps plus the
    max-channel |color diff| between the anchor and that pixel (always on
    the LEFT color image, cpp:7057). The winner is the direction with the
    smallest disparity (ties to the earlier direction); if a vertical
    direction wins but some horizontal candidate is strictly more
    color-similar, the smaller-disparity horizontal candidate takes over
    (cpp:7116-7141). securityNum is 1 in the reference, collapsing its
    consecutive-agreement container to plain first-valid (cpp:7074-7100).
    ``color_thre`` (cpp:7047) is declared but never used — omitted; the
    reference never calls this overload (RV_combine_BG wires only the
    2-direction core) — exposed here via bg_dirs=4."""
    h, w = disp.shape
    img = jnp.moveaxis(image.astype(jnp.float32), -1, 0)     # [C,H,W]
    u_idx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    v_idx = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))

    cands, cdifs = [], []
    # reference order: 0 left, 1 right, 2 up, 3 down (dv/du cpp:7101-7102)
    for axis, rev in ((1, False), (1, True), (0, False), (0, True)):
        val, src = _nearest_valid_with_index(disp, axis, rev)
        here = u_idx if axis == 1 else v_idx
        dist = jnp.where(src >= 0, jnp.abs(here - src), jnp.int32(1 << 30))
        ok = (val >= 0) & (dist <= depth)
        srcc = jnp.clip(src, 0, (w if axis == 1 else h) - 1)
        nc = jnp.take_along_axis(img, srcc[None], axis=axis + 1)
        cd = jnp.max(jnp.abs(nc - img), axis=0)
        cands.append(jnp.where(ok, val, -1))
        cdifs.append(jnp.where(ok, cd, jnp.inf))
    cand = jnp.stack(cands)                                   # [4,H,W]
    cdif = jnp.stack(cdifs)

    big = jnp.int32(10000)
    cval = jnp.where(cand >= 0, cand, big)
    j = jnp.argmin(cval, axis=0)                              # ties: L,R,U,D
    j_val = jnp.take_along_axis(cand, j[None], 0)[0]
    j_dif = jnp.take_along_axis(cdif, j[None], 0)[0]
    z = jnp.argmin(cval[:2], axis=0)                          # best horizontal
    z_val = jnp.take_along_axis(cand, z[None], 0)[0]
    z_dif = jnp.take_along_axis(cdif, z[None], 0)[0]
    swap = (j >= 2) & (z_val >= 0) & (z_dif < j_dif)
    return jnp.where(swap, z_val, j_val)


def rv_combine_bg(disp: jnp.ndarray, arms: jnp.ndarray,
                  arms_tilt: Optional[jnp.ndarray], image: jnp.ndarray,
                  num_disp: int, s_thres: int = 15, h_ratio: float = 0.4,
                  interpolate_type: int = 0, reg_vote_type: int = 0,
                  bg_depth: int = 1000, bg_dirs: int = 2,
                  disp_occ: int = -32, disp_mis: int = -48,
                  max_arm: int = 34) -> jnp.ndarray:
    """RV_combine_BG (cpp:7146-7216): fill invalid pixels by the
    interpolateType policy (h:316 comment):
      0 = region vote only; 1 = background fill only;
      2 = OCC -> background fill, MIS -> region vote;
      3 = OCC -> min(region vote, background fill) when both hit (the
          two-sided-min fill, cpp:7188-7200), MIS -> region vote.
    Reads a snapshot and writes a clone like the reference (dp_res), so the
    pass is naturally parallel. Sentinels other than OCC/MIS are left
    unchanged under types 2/3 (the reference leaks the previous pixel's
    dp_ into them — a read-of-stale-local bug we do not reproduce)."""
    rv = None
    if interpolate_type in (0, 2, 3):
        rv = region_vote_core(disp, arms, arms_tilt, num_disp, s_thres,
                              h_ratio, reg_vote_type, max_arm)
    bg = None
    if interpolate_type in (1, 2, 3):
        if bg_dirs == 4:
            bg = bg_fill_4dir(disp, image, bg_depth)
        else:
            bg, _ = bg_fill_2dir(disp, bg_depth, num_disp)
    return rv_bg_policy(disp, rv, bg, interpolate_type, disp_occ, disp_mis)


def rv_bg_policy(disp, rv, bg, interpolate_type: int,
                 disp_occ: int = -32, disp_mis: int = -48) -> jnp.ndarray:
    """Pointwise fill policy of RV_combine_BG (cpp:7160-7213); split out so
    the sharded band path can feed band-local rv/bg maps."""
    inval = disp < 0
    if interpolate_type == 0:
        fill = jnp.where(inval, rv, -1)
    elif interpolate_type == 1:
        fill = jnp.where(inval, bg, -1)
    else:
        is_occ = disp == disp_occ
        is_mis = disp == disp_mis
        if interpolate_type == 2:
            fill = jnp.where(is_occ, bg, jnp.where(is_mis, rv, -1))
        else:
            both = (bg >= 0) & (rv >= 0)
            occ_fill = jnp.where(both, jnp.minimum(rv, bg),
                                 jnp.maximum(rv, bg))
            fill = jnp.where(is_occ, occ_fill, jnp.where(is_mis, rv, -1))
    return jnp.where(inval & (fill >= 0), fill, disp)


def fill_surrounding(disp: jnp.ndarray, w_v: int, w_u: int,
                     disp_inv: int = -16) -> jnp.ndarray:
    """fillSurronding (cpp:2214-2260): invalidate the W_V-row top/bottom and
    W_U-column left/right border bands (the SSD own-WTA flow runs this
    before its LRC, h:490)."""
    h, w = disp.shape
    v = jnp.arange(h)[:, None]
    u = jnp.arange(w)[None, :]
    border = (v < w_v) | (v >= h - w_v) | (u < w_u) | (u >= w - w_u)
    return jnp.where(border, jnp.asarray(disp_inv, disp.dtype), disp)


# ---------------------------------------------------------------------------
# Proper interpolation (properIpol cpp:7395-7490)
# ---------------------------------------------------------------------------

_PI_DIR_W = (0, 2, 2, 2, 0, -2, -2, -2, 1, 2, 2, 1, -1, -2, -2, -1)
_PI_DIR_H = (2, 2, 0, -2, -2, -2, 0, 2, 2, 1, -1, -2, -2, -1, 1, 2)


def _pi_offsets(search_depth: int):
    """Cumulative (dv, du) per direction/step with the reference's C++
    truncating half-step arithmetic (cpp:7430-7441)."""
    def cdiv2(x):  # C++ integer division truncates toward zero
        return int(x / 2) if x >= 0 else -int(-x / 2)

    offs = np.zeros((16, search_depth, 2), np.int32)
    for k in range(16):
        ph, pw = _PI_DIR_H[k], _PI_DIR_W[k]
        v = u = 0
        for dep in range(search_depth):
            if dep % 2 == 0:
                v += cdiv2(ph)
                u += cdiv2(pw)
            else:
                v += ph - cdiv2(ph)
                u += pw - cdiv2(pw)
            offs[k, dep] = (v, u)
    return offs


def _shift2d(x: jnp.ndarray, dv: int, du: int, fill):
    h, w = x.shape[-2:]
    pv0, pv1 = max(0, -dv), max(0, dv)
    pu0, pu1 = max(0, -du), max(0, du)
    pad = [(0, 0)] * (x.ndim - 2) + [(pv0, pv1), (pu0, pu1)]
    p = jnp.pad(x, pad, constant_values=fill)
    return p[..., pv0 + dv: pv0 + dv + h, pu0 + du: pu0 + du + w]


def proper_interpolation(
    disp: jnp.ndarray,
    image: jnp.ndarray,
    search_depth: int = 20,
    disp_occ: int = -32,
) -> jnp.ndarray:
    """16-direction nearest-valid fill (cpp:7395-7490).

    For each invalid pixel: along each of 16 directions take the first
    valid disparity within search_depth steps and the max-channel color
    difference to that pixel. DISP_OCC pixels adopt the minimum disparity
    over directions (background); other invalids adopt the disparity of the
    most color-similar direction (first minimum wins, cpp:7475-7484).
    """
    offs = _pi_offsets(search_depth)
    # channel-leading so _shift2d moves over (H, W), not (W, channels)
    img = jnp.moveaxis(image.astype(jnp.float32), -1, 0)
    inval = disp < 0

    from mystereomatching_tpu.ops import pallas_kernels as pk

    h, w = disp.shape
    import os as _os

    if pk.tpu_backend():
        # VMEM kernels (one pass instead of 320 HBM-bound steps): whole
        # plane when it fits scoped VMEM, overlapping halo'd tiles beyond
        if h * w * 4 * 16 < 12 * 1024 * 1024:
            # MYSM_PI_GRID=1 collapses the 16 direction kernels into one
            # grid kernel with pl.when branches — measured on-chip: cold
            # compile 979 s (the 320-statement body blows Mosaic's compile
            # budget, as the per-direction docstring warned), steady 10 ms
            # — so the DEFAULT stays 16 small kernels (~4 min cold total,
            # cacheable individually)
            pi = (pk.proper_interpolation_pallas_grid
                  if _os.environ.get("MYSM_PI_GRID")
                  else pk.proper_interpolation_pallas)
            occ_fill, mis_raw, mis_cdif, fany = pi(disp, img, offs)
        else:
            occ_fill, mis_raw, mis_cdif, fany = (
                pk.proper_interpolation_pallas_tiled(disp, img, offs))
        found_any = fany > 0
        mis_found = jnp.isfinite(mis_cdif) & (
            mis_cdif < jnp.finfo(jnp.float32).max)
        mis_fill = jnp.where(mis_found, mis_raw.astype(disp.dtype), disp)
        is_occ = disp == disp_occ
        fill = jnp.where(is_occ,
                         jnp.where(found_any, occ_fill.astype(disp.dtype),
                                   disp),
                         mis_fill)
        return jnp.where(inval, fill, disp)

    # XLA fallback: ONE direction body under lax.scan over the 16 offset
    # tables (round 5 — the former 16x20 static unroll was ~1.3M HLO
    # chars at teddy scale, the single largest piece of the nl/fullres
    # configs' >120 s local compiles). Steps stay unrolled inside the
    # body so each direction's chain still fuses; the direction
    # reduction becomes a strict-< running update, which keeps the
    # stacked argmin's first-minimum-wins tie order (cpp:7475-7484).
    vv = jnp.arange(h, dtype=jnp.int32)[:, None]
    uu = jnp.arange(w, dtype=jnp.int32)[None, :]

    def shift_dyn(x, dv, du, fill):
        rolled = jnp.roll(x, (-dv, -du), axis=(-2, -1))
        ok = ((vv + dv >= 0) & (vv + dv < h)
              & (uu + du >= 0) & (uu + du < w))
        return jnp.where(ok, rolled, jnp.asarray(fill, x.dtype))

    def per_dir(carry, offs_k):
        found_any, occ_min, best_cd, best_d, any_mis = carry
        found = jnp.zeros(disp.shape, jnp.bool_)
        dsp = jnp.full(disp.shape, -1, disp.dtype)
        cdf = jnp.full(disp.shape, jnp.inf, jnp.float32)
        for dep in range(search_depth):
            dv, du = offs_k[dep, 0], offs_k[dep, 1]
            nd = shift_dyn(disp, dv, du, -1)
            nc = shift_dyn(img, dv, du, 1e9)
            hit = (~found) & (nd >= 0)
            cd = jnp.max(jnp.abs(nc - img), axis=0)
            dsp = jnp.where(hit, nd, dsp)
            cdf = jnp.where(hit, cd, cdf)
            found = found | hit
        valid = dsp >= 0
        found_any = found_any | valid
        occ_min = jnp.minimum(occ_min,
                              jnp.where(valid, dsp, jnp.asarray(10 ** 6,
                                                                dsp.dtype)))
        # cdif < 255 gate: reference inits minDifColor=255 (cpp:7477)
        cd_eff = jnp.where(valid & (cdf < 255.0), cdf, jnp.inf)
        upd = cd_eff < best_cd
        best_d = jnp.where(upd, dsp, best_d)
        best_cd = jnp.where(upd, cd_eff, best_cd)
        any_mis = any_mis | jnp.isfinite(cd_eff)
        return (found_any, occ_min, best_cd, best_d, any_mis), None

    # init derived from the inputs (not fresh constants) so the carry is
    # "varying" over any enclosing shard_map axes like the body output
    zi = disp - disp
    zf = img[0] * 0.0
    init = (zi != 0,
            zi + jnp.asarray(10 ** 6, disp.dtype),
            zf + jnp.asarray(jnp.inf, jnp.float32),
            zi - jnp.asarray(1, disp.dtype),
            zi != 0)
    (found_any, occ_fill, _, mis_fill_raw, mis_found), _ = lax.scan(
        per_dir, init, jnp.asarray(offs, jnp.int32))
    mis_fill = jnp.where(mis_found, mis_fill_raw, disp)

    is_occ = disp == disp_occ
    fill = jnp.where(is_occ, jnp.where(found_any, occ_fill, disp), mis_fill)
    return jnp.where(inval, fill, disp)


# ---------------------------------------------------------------------------
# Background interpolation (BGIpol cpp:7323-7338 + core 7010-7044)
# ---------------------------------------------------------------------------

def _nearest_valid_left(disp: jnp.ndarray, num_disp: int = 1024) -> jnp.ndarray:
    """Per row: value of the nearest valid pixel to the left (exclusive),
    -1 if none.

    TPU-first: the disparity VALUE rides in the low bits of a
    (column-index, value) packed key, so one log-shift running max
    replaces ``lax.cummax`` + a lane gather (cummax lowering + per-row
    take_along_axis measured ~60x off bandwidth at full-res).

    ``num_disp`` bounds the packed value field; the key (w * k + value)
    must stay inside int31 or the fill silently corrupts (ADVICE r1)."""
    h, w = disp.shape
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    k = 1 << max(num_disp, 2).bit_length()     # pow2 > any disparity value
    if w * k >= (1 << 31):
        raise ValueError(
            f"_nearest_valid_left: w={w} * value field {k} overflows int32")
    key = jnp.where(disp >= 0, u * k + disp, -1)
    # exclusive: shift right before scanning
    key = jnp.concatenate([jnp.full((h, 1), -1, jnp.int32), key[:, :-1]],
                          axis=1)
    sh = 1
    while sh < w:                              # running max via log shifts
        shifted = jnp.concatenate(
            [jnp.full((h, sh), -1, jnp.int32), key[:, :-sh]], axis=1)
        key = jnp.maximum(key, shifted)
        sh *= 2
    return jnp.where(key >= 0, key % k, -1)


def jax_cummax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    import jax

    return jax.lax.cummax(x, axis=axis)


def bg_interpolation(disp: jnp.ndarray, num_disp: int = 1024) -> jnp.ndarray:
    """Horizontal nearest-valid fill taking the smaller (background)
    disparity of the two sides (backgroundInterpolateCore cpp:7010-7044;
    search depth 1000 = unbounded in practice)."""
    left = _nearest_valid_left(disp, num_disp)
    right = _nearest_valid_left(disp[:, ::-1], num_disp)[:, ::-1]
    both = (left >= 0) & (right >= 0)
    fill = jnp.where(both, jnp.minimum(left, right), jnp.maximum(left, right))
    return jnp.where((disp < 0) & (fill >= 0), fill, disp)


def interpolate_background_kitti(disp: jnp.ndarray, thres: int = 0) -> jnp.ndarray:
    """KITTI-style row/column extrapolating filler (iterpolateBackground
    cpp:5864-5948): invalid runs take the min of the flanking valid
    disparities; row edges extrapolate the first/last valid value; columns
    then extrapolate above the first / below the last valid row."""
    valid = disp > thres
    h, w = disp.shape

    left = _nearest_valid_scan(disp, valid, axis=1, reverse=False)
    right = _nearest_valid_scan(disp, valid, axis=1, reverse=True)
    both = (left >= 0) & (right >= 0)
    fill = jnp.where(both, jnp.minimum(left, right),
                     jnp.maximum(left, right))          # edge extrapolation
    d = jnp.where(valid | (fill < 0), disp, fill)

    valid2 = d > thres
    up = _nearest_valid_scan(d, valid2, axis=0, reverse=False)
    dn = _nearest_valid_scan(d, valid2, axis=0, reverse=True)
    # only extrapolate beyond the first/last valid row of each column
    top_fill = jnp.where((up < 0) & (dn >= 0), dn, d)
    out = jnp.where((dn < 0) & (up >= 0), up, top_fill)
    return out


def _nearest_valid_scan(disp: jnp.ndarray, valid: jnp.ndarray, axis: int,
                        reverse: bool) -> jnp.ndarray:
    """Value of nearest valid pixel looking backward along axis
    (exclusive of self), -1 if none; vectorized via cummax of indices."""
    x = disp if not reverse else jnp.flip(disp, axis)
    v = valid if not reverse else jnp.flip(valid, axis)
    n = x.shape[axis]
    pos = jnp.arange(n, dtype=jnp.int32).reshape(
        [-1 if a == axis else 1 for a in range(x.ndim)])
    idx = jnp.where(v, pos, -1)
    last = jax_cummax(jnp.broadcast_to(idx, x.shape), axis=axis)
    val = jnp.take_along_axis(x, jnp.clip(last, 0, n - 1), axis=axis)
    out = jnp.where(last >= 0, val, -1)
    return out if not reverse else jnp.flip(out, axis)


# ---------------------------------------------------------------------------
# Weighted median (WM cpp:7340-7393)
# ---------------------------------------------------------------------------

def weighted_median(
    disp: jnp.ndarray,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    num_disp: int,
    radius: int = 9,
    sigma_c: float = 25.0,
    sigma_s: float = 9.0,
) -> jnp.ndarray:
    """19x19 bilateral-weighted median over masked pixels (cpp:7340-7393).

    Weight = exp(-||dI||^2/sigma_c^2 - (dv^2+du^2)/sigma_s^2); histogram is
    accumulated over valid neighbor disparities, but the half-weight
    threshold uses the TOTAL weight including invalid neighbors — matching
    the reference, whose negative-index histogram writes are lost (UB).
    Replaces pixels where mask is True.
    """
    img = jnp.moveaxis(image.astype(jnp.float32), -1, 0)  # [C,H,W]
    h, w = disp.shape
    hist = jnp.zeros((num_disp, h, w), jnp.float32)
    wsum = jnp.zeros((h, w), jnp.float32)
    ds = jnp.arange(num_disp, dtype=disp.dtype)[:, None, None]
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            nd = _shift2d(disp, dv, du, -1)
            nc = _shift2d(img, dv, du, 1e4)
            cdis = jnp.sum((img - nc) ** 2, axis=0)
            wgt = jnp.exp(-cdis / (sigma_c * sigma_c)
                          - (dv * dv + du * du) / (sigma_s * sigma_s))
            wsum = wsum + wgt
            hist = hist + jnp.where((ds == nd[None]), wgt[None], 0.0)
    cum = jnp.cumsum(hist, axis=0)
    half = wsum * 0.5
    med = jnp.argmax(cum >= half[None], axis=0).astype(disp.dtype)
    has = jnp.any(cum >= half[None], axis=0)
    return jnp.where(mask & has, med, disp)


# ---------------------------------------------------------------------------
# Subpixel enhancement (cpp:6138-6167) + median
# ---------------------------------------------------------------------------

def subpixel_enhance(disp: jnp.ndarray, vol: jnp.ndarray,
                     truncate_like_reference: bool = False) -> jnp.ndarray:
    """Quadratic subpixel refinement from the cost volume, then the caller
    typically applies a 3x3 median. The reference accidentally truncates
    the result back to short (cpp:6154 `disp -= diff` on a short) — set
    ``truncate_like_reference`` to reproduce; default returns float."""
    d_, h, w = vol.shape
    inner = (disp > 0) & (disp < d_ - 1)
    d0 = jnp.clip(disp, 1, d_ - 2)
    cm = jnp.take_along_axis(vol, (d0 - 1)[None], 0)[0]
    c0 = jnp.take_along_axis(vol, d0[None], 0)[0]
    cp = jnp.take_along_axis(vol, (d0 + 1)[None], 0)[0]
    denom = 2.0 * (cp + cm - 2.0 * c0)
    diff = jnp.where(jnp.abs(denom) > 1e-12, (cp - cm) / denom, 0.0)
    diff = jnp.where((diff > -1) & (diff < 1), diff, 0.0)
    ref = disp.astype(jnp.float32) - diff
    if truncate_like_reference:
        ref = jnp.trunc(ref)
    return jnp.where(inner, ref, disp.astype(jnp.float32))


def median_blur_disp(disp: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """3x3 median blur of the disparity map (refine() cpp:1499). Sentinels
    participate as values, matching cv::medianBlur on CV_16S."""
    return median_small(disp, ksize)


# ---------------------------------------------------------------------------
# Discontinuity adjustment (cpp:6057-6136)
# ---------------------------------------------------------------------------

def discontinuity_adjust(disp: jnp.ndarray, vol: jnp.ndarray,
                         edges: jnp.ndarray = None) -> jnp.ndarray:
    """Along disparity-edge normals, replace each edge pixel's disparity by
    a lower-cost neighbor's (discontinuityAdjust cpp:6057-6136).

    Edge-direction priority (cpp:6080-6099), exclusive as written: main
    diagonal -> 4, anti-diagonal -> 0, else if the TOP row has any edge the
    only remaining option is 6 (bottom row must also hit — the horizontal
    test lives in the else branch, so a top-only hit selects nothing);
    otherwise left+right columns -> 2. Border pixels are untouched
    (cpp:6071-6072). The reference adjusts in place during its raster scan
    (later pixels can read adjusted up-neighbors); this pass reads a
    snapshot — one Jacobi step of the same update.

    edges: optional [H,W] bool; defaults to the reference's recipe —
    equalized, Gaussian-blurred Canny of the disparity map (cpp:6060-6064).
    """
    if edges is None:
        from mystereomatching_tpu.ops.canny import canny_edges

        d8 = jnp.clip(disp, 0, 255).astype(jnp.uint8)
        edges = canny_edges(d8, low=20.0, high=60.0, equalize=True,
                            blur_sigma=4.0)

    e = edges
    nb = {(dv, du): _shift2d(e, dv, du, False)
          for dv in (-1, 0, 1) for du in (-1, 0, 1)}
    top_any = nb[(-1, 0)] | nb[(-1, -1)] | nb[(-1, 1)]
    bot_any = nb[(1, 0)] | nb[(1, -1)] | nb[(1, 1)]
    left_any = nb[(-1, -1)] | nb[(0, -1)] | nb[(1, -1)]
    right_any = nb[(-1, 1)] | nb[(0, 1)] | nb[(1, 1)]
    diag4 = nb[(-1, -1)] & nb[(1, 1)]
    diag0 = nb[(-1, 1)] & nb[(1, -1)]
    vert6 = top_any & bot_any
    horz2 = (~top_any) & left_any & right_any   # reachable only when the
    #                                             top-row test failed
    dir_sel = jnp.where(diag4, 4, jnp.where(diag0, 0,
                jnp.where(vert6, 6, jnp.where(horz2, 2, -1))))

    # (d1, d2) neighbor offsets per direction (directionsH/W cpp:6069-6070)
    pairs = {4: ((-1, 1), (1, -1)), 0: ((-1, -1), (1, 1)),
             6: ((0, -1), (0, 1)), 2: ((-1, 0), (1, 0))}

    def cost_at(d):
        dc = jnp.clip(d, 0, vol.shape[0] - 1)
        return jnp.take_along_axis(vol, dc[None], 0)[0]

    h, w = disp.shape
    vv = jnp.arange(h)[:, None]
    uu = jnp.arange(w)[None, :]
    inner = (vv >= 1) & (vv < h - 1) & (uu >= 1) & (uu < w - 1)

    cost0 = cost_at(disp)
    out = disp
    for sel, ((dv1, du1), (dv2, du2)) in pairs.items():
        d1 = _shift2d(disp, dv1, du1, -1)
        d2 = _shift2d(disp, dv2, du2, -1)
        # cost1 gate is `>= 0 && < cost`; cost2's is `!= -1 && < cost`
        # (cpp:6115-6130) — asymmetric sentinels kept verbatim (a genuinely
        # negative cost is skipped as d1 but accepted as d2)
        c1 = jnp.where(d1 >= 0, cost_at_shifted(vol, d1, dv1, du1), -1.0)
        c2 = jnp.where(d2 >= 0, cost_at_shifted(vol, d2, dv2, du2), -1.0)
        take1 = (c1 >= 0) & (c1 < cost0)
        best = jnp.where(take1, d1, disp)
        bestc = jnp.where(take1, c1, cost0)
        best = jnp.where((c2 != -1.0) & (c2 < bestc), d2, best)
        sel_mask = e & inner & (dir_sel == sel) & (disp >= 0)
        out = jnp.where(sel_mask, best, out)
    return out


def cost_at_shifted(vol: jnp.ndarray, d: jnp.ndarray, dv: int, du: int) -> jnp.ndarray:
    """vol[d(v,u), v+dv, u+du] — the neighbor's cost at its own disparity."""
    sh = _shift2d(vol, dv, du, jnp.inf)
    dc = jnp.clip(d, 0, vol.shape[0] - 1)
    return jnp.take_along_axis(sh, dc[None], 0)[0]
