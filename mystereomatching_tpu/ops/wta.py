"""Disparity decision: WTA, cooperative WTA, uniqueness, subpixel.

Vectorized equivalents of the reference's decision kernels:
  * ``gen_dispFromVm`` (stereoMatching.cpp:3928-3967): plain argmin (or
    argmax for similarity volumes, ChooseSmall flag h:208),
  * ``wta_Co`` (cpp:2709-2792): joint left/right WTA with uniqueness check
    (uniquenessRatio_2small=0.95) and +-1 quadratic subpixel, disparity
    scaled by DISP_SCALE=16,
  * ``subpixelEnhancement`` core quadratic fit (cpp:6138-6167).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def wta(vol: jnp.ndarray, choose_small: bool = True) -> jnp.ndarray:
    """Plain argmin/argmax over D. vol: [D,H,W] -> int32 [H,W].

    On TPU this runs as a Pallas min+iota-select kernel — XLA's variadic
    argmin over the major axis is far off the bandwidth roofline."""
    from mystereomatching_tpu.ops import pallas_kernels as pk

    if vol.ndim == 3 and pk.tpu_backend():
        return pk.wta_pallas(vol, choose_small)
    return (jnp.argmin(vol, 0) if choose_small else jnp.argmax(vol, 0)).astype(jnp.int32)


def uniqueness_mask(vol: jnp.ndarray, disp: jnp.ndarray,
                    ratio: float = 0.95) -> jnp.ndarray:
    """True where the WTA disparity FAILS the uniqueness test (wta_Co
    cpp:2762-2775): some d with |d - disp| > 1 has
    cost[d] * ratio < min cost."""
    d_, h, w = vol.shape
    min_c = jnp.min(vol, 0)
    ds = jnp.arange(d_, dtype=jnp.int32)[:, None, None]
    near = jnp.abs(ds - disp[None]) <= 1
    viol = (vol * ratio < min_c[None]) & ~near
    return jnp.any(viol, 0)


def subpixel_quadratic(vol: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """+-1 quadratic interpolation around the WTA disparity.

    Matches wta_Co (cpp:2778-2784): offset = (c[d-1]-c[d+1]) /
    (2*(c[d-1]+c[d+1]-2*c[d])); returns float disparity (no DISP_SCALE).
    Border disparities (d=0 or d=D-1) are returned unrefined.
    """
    d_, h, w = vol.shape
    d0 = jnp.clip(disp, 1, d_ - 2)
    cm = jnp.take_along_axis(vol, (d0 - 1)[None], 0)[0]
    c0 = jnp.take_along_axis(vol, d0[None], 0)[0]
    cp = jnp.take_along_axis(vol, (d0 + 1)[None], 0)[0]
    denom = cm + cp - 2.0 * c0
    off = jnp.where(jnp.abs(denom) > 1e-12, (cm - cp) / (2.0 * denom), 0.0)
    refined = disp.astype(jnp.float32) + off
    inner = (disp >= 1) & (disp <= d_ - 2)
    return jnp.where(inner, refined, disp.astype(jnp.float32))


def wta_co(
    vol_left: jnp.ndarray,
    uniq_check: bool = False,
    sub_ipol: bool = False,
    uniqueness_ratio: float = 0.95,
    disp_scale: int = 16,
    disp_inv: int = -16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cooperative WTA from ONE left-reference volume (wta_Co cpp:2709-2792).

    The right disparity is decided from the reindexed left volume:
    d_R(u) = argmin_d vmL[d, v, u+d]. Returns (d_left, d_right) int32
    scaled by disp_scale; uniqueness failures -> disp_inv. When sub_ipol,
    d_left is the rounded scaled subpixel value.
    """
    d_, h, w = vol_left.shape
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = jnp.arange(d_, dtype=jnp.int32)[:, None]
    idx = u + d                                          # [D, W]
    ok = idx < w
    idxc = jnp.clip(idx, 0, w - 1)
    vol_r = jnp.take_along_axis(vol_left, idxc[:, None, :].repeat(h, 1), axis=2)
    vol_r = jnp.where(ok[:, None, :], vol_r, jnp.inf)
    disp_r = jnp.argmin(vol_r, 0).astype(jnp.int32)

    # left: mask out d > u (cpp:2747 break at u-d<0)
    ok_l = (u - d) >= 0
    vol_l = jnp.where(ok_l[:, None, :], vol_left, jnp.inf)
    disp_l = jnp.argmin(vol_l, 0).astype(jnp.int32)

    if sub_ipol:
        sub = subpixel_quadratic(vol_left, disp_l)
        left_scaled = jnp.round(sub * disp_scale).astype(jnp.int32)
    else:
        left_scaled = disp_l * disp_scale
    if uniq_check:
        bad = uniqueness_mask(vol_l, disp_l, uniqueness_ratio)
        left_scaled = jnp.where(bad, disp_inv, left_scaled)
    return left_scaled, disp_r * disp_scale


def wta_pair_cooperative(vol_left: jnp.ndarray,
                         choose_small: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(d_left, d_right) integer maps from ONE left-reference volume — the
    reference's cooperative WTA (wta_Co cpp:2709-2792) without the
    DISP_SCALE encoding: d_R(u) = argext_d vmL[d, v, u+d] (reindex via
    static rolls, qx_stereo_flip_corr_vol semantics), d_L masked to d <= u.

    Halves HBM for LRC pipelines at large D x H x W (no right volume)."""
    from mystereomatching_tpu.ops.volume import flip_volume_lr

    d_, h, w = vol_left.shape
    bad = jnp.asarray(jnp.finfo(jnp.float32).max
                      if choose_small else -jnp.finfo(jnp.float32).max,
                      vol_left.dtype)
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = jnp.arange(d_, dtype=jnp.int32)[:, None]

    vol_r = flip_volume_lr(vol_left)
    vol_r = jnp.where(((u + d) < w)[:, None, :], vol_r, bad)
    disp_r = wta(vol_r, choose_small)

    vol_l = jnp.where(((u - d) >= 0)[:, None, :], vol_left, bad)
    disp_l = wta(vol_l, choose_small)
    return disp_l, disp_r
