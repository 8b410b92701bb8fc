"""Row-band sharded stereo pipeline (shard_map over mesh ('data','row')).

The TPU-native scaling layer the reference never had (SURVEY.md §2.7):

  * images / volumes / disparity maps are sharded into row bands over the
    'row' mesh axis; batches of pairs shard over 'data';
  * windowed stages (census, arms, CBCA, region vote, proper interpolation,
    medians) compute on halo-extended bands (ppermute halo exchange, ICI)
    and crop — exact w.r.t. the dense path when the halo covers the
    stage's support (asserted below);
  * horizontal SGM scans are band-local; vertical scans are EXACT via a
    chunked-wavefront pipeline: the W axis is cut into chunks, device p
    scans chunk c at step t=c+p with the boundary Lr row received from the
    band above via ppermute — classic wavefront with efficiency
    C/(C+P-1);
  * WTA / LRC / background fill are row-local.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:                                     # jax >= 0.8
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import refine as refine_ops
from mystereomatching_tpu.ops import sgm as sgm_ops
from mystereomatching_tpu.ops import wta as wta_ops
from mystereomatching_tpu.parallel.halo import exchange_rows, crop_rows
from mystereomatching_tpu.pipeline import to_gray


def _cost_halo(cfg: MatchConfig) -> int:
    """Rows of halo needed so cost+aggregation are exact on the band."""
    h = 1
    if "census" in cfg.cost:
        h = max(h, cfg.census_rv + 1)
    if cfg.cost in ("grad", "census_grad", "ad_grad", "ad_census_grad"):
        h = max(h, cfg.arm_l_out + 1)           # adaptive weight needs arms
    if cfg.aggregation == "cbca":
        # each iteration's V pass reaches l_out; arms reach l_out beyond that
        la = cfg.arm_l_out
        if cfg.cbca_double_win:
            la = max(la, cfg.window1().arm_l_out)
        h = max(h, cfg.cbca_iterations * la + la + cfg.census_rv + 1)
    if cfg.aggregation == "bf":
        h = max(h, cfg.bf_radius + 1)
    if cfg.do_refine and (cfg.do_region_vote or cfg.do_rv_whole_image):
        # region vote keeps an arm_l_out halo on the cropped arms, and the
        # arms INSIDE that halo need their own arm_l_out of support rows
        h = max(h, 2 * cfg.arm_l_out + 1)
    return h


def _wavefront_scan(voln, psn, order_idx, perm, p1, p2, n_chunks: int,
                    mask=None, p_axis: str = "row"):
    """Chunked-wavefront downward scan over row bands (normalized frame).

    voln: local [D, h, Ws] already oriented so the scan runs top->bottom in
    band order ``order_idx`` (0 scans first); ``perm`` routes each band's
    boundary Lr row to the next band in that order. mask: optional
    [h, Ws] in-image mask (skewed diagonal buffers). Device p runs chunk c
    of the W axis at step t = c + p — wavefront efficiency C/(C+P-1).
    """
    d_, h, w = voln.shape
    cw = -(-w // n_chunks)
    wpad = cw * n_chunks
    volp = jnp.pad(voln, ((0, 0), (0, 0), (0, wpad - w)))
    psp = jnp.pad(psn, ((0, 0), (0, wpad - w)), constant_values=1.0)
    maskp = (jnp.pad(mask, ((0, 0), (0, wpad - w)))
             if mask is not None else None)

    out = volp * 0
    state = volp[:, 0, :cw] * 0                  # boundary Lr for next chunk

    def step(t, carry):
        out, state = carry
        c = t - order_idx
        cc = jnp.clip(c, 0, n_chunks - 1)
        active = (c >= 0) & (c < n_chunks)
        chunk = lax.dynamic_slice(volp, (0, 0, cc * cw), (d_, h, cw))
        psc = lax.dynamic_slice(psp, (0, cc * cw), (h, cw))
        mc = (lax.dynamic_slice(maskp, (0, cc * cw), (h, cw))
              if maskp is not None else None)
        init = jnp.where(order_idx == 0, jnp.zeros_like(state), state)
        from mystereomatching_tpu.ops import pallas_kernels as pk

        if pk.tpu_backend():
            res = pk.sgm_scan_pallas(
                chunk[None], psc[None],
                mc[None] if mc is not None else None,
                p1=p1, p2=p2, init=init[None])[0]
        else:
            res = sgm_ops._scan_down(chunk, psc, p1, p2, in_image=mc,
                                     init=init)
        out = jnp.where(active,
                        lax.dynamic_update_slice(out, res, (0, 0, cc * cw)),
                        out)
        boundary = res[:, -1, :]
        state = lax.ppermute(boundary, p_axis, perm)
        return out, state

    n_dev = lax.axis_size(p_axis)
    from mystereomatching_tpu.parallel.counters import note_wavefront

    note_wavefront(n_chunks + n_dev - 1, state.shape, state.dtype)
    out, _ = lax.fori_loop(0, n_chunks + n_dev - 1, step, (out, state))
    return out[:, :, :w]


def _band_order(down: bool, p_axis: str = "row"):
    """(order_idx, boundary perm) for a scan running down (band 0 first)
    or up (last band first)."""
    n_dev = lax.axis_size(p_axis)
    my = lax.axis_index(p_axis)
    if down:
        return my, [(i, i + 1) for i in range(n_dev - 1)]
    return n_dev - 1 - my, [(i, i - 1) for i in range(1, n_dev)]


def _vertical_sgm_band(vol, pscale, down: bool, p1, p2, n_chunks: int):
    """Wavefront-pipelined vertical SGM scan over row bands.

    vol: local [D, h, W]; pscale: [h, W] for this direction (predecessor
    row diff, from a 1-row image halo). ``down``: scan top->bottom
    (predecessor above) vs bottom->top. Exact equivalent of the dense
    vertical costScan across the full image height.
    """
    voln = vol if down else vol[:, ::-1]
    psn = pscale if down else pscale[::-1]
    order_idx, perm = _band_order(down)
    out = _wavefront_scan(voln, psn, order_idx, perm, p1, p2, n_chunks)
    return out if down else out[:, ::-1]


def _diag_sgm_band(vol, pscale, rv: int, ru: int, p1, p2, n_chunks: int):
    """Wavefront-pipelined DIAGONAL SGM scan over row bands.

    Same trick as the dense path (ops/sgm.py): skew rows so the diagonal
    predecessor becomes the vertical predecessor — but with the skew offset
    driven by the GLOBAL row index, so the boundary row a band passes down
    lands on the next band's first row at the same skewed column (= same
    image diagonal). Local skew + a band-constant column roll; the skewed
    width W + H_global - 1 is static. Reuses the vertical wavefront
    (Pallas kernel on TPU) with the in-image mask masking the skew margins
    (scan-edge semantics at picture corners, like the dense diagonals).
    """
    d_, h, w = vol.shape
    p_axis = "row"
    n_dev = lax.axis_size(p_axis)
    hg = n_dev * h

    down = rv < 0                        # scan runs opposite the predecessor
    volF = vol if down else vol[:, ::-1]
    psF = pscale if down else pscale[::-1]
    order_idx, perm = _band_order(down)
    g0 = order_idx * h                   # global row offset in scan frame

    sign = 1 if ru > 0 else -1
    volS, ok = sgm_ops._skew(volF, sign, 0.0)
    psS, _ = sgm_ops._skew(psF, sign, 1.0)
    okS = ok.astype(volS.dtype)

    ws = w + hg - 1
    grow = ws - volS.shape[-1]           # = hg - h
    volS = jnp.pad(volS, ((0, 0), (0, 0), (0, grow)))
    psS = jnp.pad(psS, ((0, 0), (0, grow)), constant_values=1.0)
    okS = jnp.pad(okS, ((0, 0), (0, grow)))
    # band-constant column roll aligning local skew with the global one:
    # sign +1: col = u + g  -> roll by g0; sign -1: col = u + (Hg-1-g)
    # -> local skew gives u + (h-1-i), roll by Hg-1-g0-(h-1)
    r0 = g0 if sign > 0 else (hg - 1 - g0 - (h - 1))
    volS = jnp.roll(volS, r0, axis=-1)
    psS = jnp.roll(psS, r0, axis=-1)
    okS = jnp.roll(okS, r0, axis=-1)

    outS = _wavefront_scan(volS, psS, order_idx, perm, p1, p2, n_chunks,
                           mask=okS)
    outS = jnp.roll(outS, -r0, axis=-1)[:, :, : w + h - 1]
    outF = sgm_ops._unskew(outS, sign, w)
    return outF if down else outF[:, ::-1]


def _band_pscale(image, rv: int, ru: int, thres, coeff):
    """penalty_scale for a row band: the vertical part of the predecessor
    offset comes from a 1-row image halo; the horizontal part is a local
    roll (column wrap only mis-scales scan-edge pixels, whose Lr=C
    regardless — same benign wrap as the dense penalty_scale)."""
    img_ext = exchange_rows(image, 1, row_axis=0, pad_mode="edge")
    imgf = img_ext.astype(jnp.float32)
    shifted = jnp.roll(imgf, shift=(-rv, -ru), axis=(0, 1))
    d1 = jnp.max(jnp.abs(imgf - shifted), axis=-1)[1:-1]
    return jnp.where(d1 > thres, 1.0 / coeff, 1.0)


def _sgm_sharded(vol, image, cfg: MatchConfig, n_chunks: int):
    """SGM on a row band: horizontal scans local, vertical (and, for the
    8-direction configs, diagonal) scans wavefront-pipelined across bands.
    Reference direction set: cpp:6206-6214."""
    p1, p2 = cfg.sgm_p1_eff, cfg.sgm_p2_eff
    thres, coeff = cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff

    out = jnp.zeros_like(vol)
    # vertical: predecessor above (-1,0) scans down; (1,0) scans up
    out = out + _vertical_sgm_band(
        vol, _band_pscale(image, -1, 0, thres, coeff), True, p1, p2, n_chunks)
    out = out + _vertical_sgm_band(
        vol, _band_pscale(image, 1, 0, thres, coeff), False, p1, p2, n_chunks)
    # horizontal: row-local (batched into one kernel on TPU)
    out = out + sgm_ops.sgm_directions(
        [vol], [image], ((0, 1), (0, -1)), p1, p2, thres, coeff)[0]
    if cfg.sgm_scan_num >= 8:
        for rv, ru in ((1, -1), (1, 1), (-1, 1), (-1, -1)):
            out = out + _diag_sgm_band(
                vol, _band_pscale(image, rv, ru, thres, coeff), rv, ru,
                p1, p2, n_chunks)
    return out


def _dshard_aggregate_band(vol, cfg: MatchConfig, left, right, lor: int,
                           p_axis: str = "row"):
    """GF / JBF / AWS / plain-FIF / NL / GFNL aggregation on row bands.

    These filters are INDEPENDENT per disparity slice (GF/JBF: per-slice
    guided/bilateral filtering, stereoMatching.cpp:4404-4539 / 5738-5767;
    AWS: per-slice joint weights, cpp:5692-5801; plain FIF: linear
    recursions with image-only weights, cpp:4541-4705; NL/GFNL:
    per-column tree filtering + per-slice GF, cpp:4421-4490, 4892-4917)
    but need the FULL image extent, so the band split goes the other way:
    all_to_all the band volume from H-bands to contiguous D-blocks over
    the 'row' axis, run the DENSE op on each block against the
    all_gathered guide images, and all_to_all back. Every disparity slice
    computes exactly the dense arithmetic -> sharded == dense bit-for-bit
    (tests/test_sharding.py); the two volume all_to_alls ride ICI
    (SURVEY §2.7 "all_to_all if re-sharding H<->D between stages").

    vol: [D, hb, W] band (halo already cropped); left/right: [hb, W, 3].
    """
    from mystereomatching_tpu.ops.aggregation import aggregate
    from mystereomatching_tpu.parallel.counters import note_all_gather

    nr = lax.axis_size(p_axis)
    d, hb, w = vol.shape
    db = -(-d // nr)
    if db * nr != d:
        vol = jnp.concatenate(
            [vol, jnp.zeros((db * nr - d, hb, w), vol.dtype)], axis=0)
    note_all_gather(vol, nr, stage=f"agg_{cfg.aggregation}_to_dblocks")
    blk = lax.all_to_all(vol, p_axis, split_axis=0, concat_axis=1,
                         tiled=True)
    left_f = lax.all_gather(left, p_axis, axis=0, tiled=True)
    right_f = lax.all_gather(right, p_axis, axis=0, tiled=True)
    img = left_f if lor == 0 else right_f
    other = right_f if lor == 0 else left_f
    if cfg.aggregation == "aws":
        # AWS weights shift the other view by the slice's ACTUAL disparity
        # (calvm_AWS h:1326-1336) — pass the block's disparity indices
        from mystereomatching_tpu.ops.aws import aws_aggregate

        ds = lax.axis_index(p_axis) * db + jnp.arange(db, dtype=jnp.int32)
        li, ri = (img, other) if lor == 0 else (other, img)
        out = aws_aggregate(blk, li, cfg, ri, lor=lor, disps=ds)
    else:
        out = aggregate(blk, cfg, img, to_gray(img), arms_int=None,
                        other_image=other, lor=lor)
    note_all_gather(out, nr, stage=f"agg_{cfg.aggregation}_to_bands")
    out = lax.all_to_all(out, p_axis, split_axis=1, concat_axis=0,
                         tiled=True)
    return out[:d]


def _minplus_vert_band(voln, awn, pn, order_idx, perm, n_chunks: int,
                       p_axis: str = "row"):
    """Chunked-wavefront vertical min-plus recursion over row bands —
    FIF_Improve's V-pass core (cpp:4797-4890). voln: [D, hb, W] oriented
    so the scan runs top->bottom in band order ``order_idx``; awn: [hb, W]
    weight coupling the predecessor scan row into each row (0 at the
    global first scan row). Same pipelining as :func:`_wavefront_scan`:
    device p runs W-chunk c at step t = c + p, carry [D, cw] rows hop to
    the next band over ppermute. Row order and per-element arithmetic are
    exactly the dense ``ops.fif._mp`` lax.scan."""
    d_, h, w = voln.shape
    cw = -(-w // n_chunks)
    wpad = cw * n_chunks
    volp = jnp.pad(voln, ((0, 0), (0, 0), (0, wpad - w)))
    awp = jnp.pad(awn, ((0, 0), (0, wpad - w)))
    big = jnp.asarray(3.4e38, voln.dtype)

    out = volp * 0
    state = volp[:, 0, :cw] * 0

    def chunk_scan(chunk, awc, init):
        def sstep(y_prev, inp):
            c, aw = inp
            up = jnp.concatenate([jnp.full((1, cw), big, c.dtype),
                                  y_prev[:-1]], 0)
            dn = jnp.concatenate([y_prev[1:],
                                  jnp.full((1, cw), big, c.dtype)], 0)
            y = c + aw * jnp.minimum(y_prev, jnp.minimum(up, dn) + pn)
            return y, y

        _, ys = lax.scan(sstep, init,
                         (jnp.moveaxis(chunk, 1, 0), awc[:, None, :]))
        return jnp.moveaxis(ys, 0, 1)

    def step(t, carry):
        out, state = carry
        c = t - order_idx
        cc = jnp.clip(c, 0, n_chunks - 1)
        active = (c >= 0) & (c < n_chunks)
        chunk = lax.dynamic_slice(volp, (0, 0, cc * cw), (d_, h, cw))
        awc = lax.dynamic_slice(awp, (0, cc * cw), (h, cw))
        init = jnp.where(order_idx == 0, jnp.zeros_like(state), state)
        res = chunk_scan(chunk, awc, init)
        out = jnp.where(active,
                        lax.dynamic_update_slice(out, res, (0, 0, cc * cw)),
                        out)
        state = lax.ppermute(res[:, -1, :], p_axis, perm)
        return out, state

    n_dev = lax.axis_size(p_axis)
    from mystereomatching_tpu.parallel.counters import note_wavefront

    note_wavefront(n_chunks + n_dev - 1, state.shape, state.dtype,
                   stage="fif_improve")
    out, _ = lax.fori_loop(0, n_chunks + n_dev - 1, step, (out, state))
    return out[:, :, :w]


def _fif_improve_band(vol, image, cfg: MatchConfig, n_chunks: int):
    """FIF_Improve (cpp:4707-4890) on a row band: the H pass is band-local
    (full rows present), the V pass is the dense min-plus lax.scan
    wavefront-pipelined across bands. The disparity ±1 coupling inside the
    recursion makes FIF_Improve the one aggregation that cannot re-shard
    over D-blocks (unlike :func:`_dshard_aggregate_band`); its V pass is
    instead the same first-order band wavefront the vertical SGM scan
    uses. Bit-identical to the dense ``ops.fif.fif_improve``."""
    from mystereomatching_tpu.ops import fif as fif_ops

    h, w = image.shape[:2]
    sigma, pn = cfg.fif_sigma, cfg.fif_pn
    # vertical edge weights need the next band's first row (1-row halo);
    # wv_full[i] = weight of the edge (global r0+i-1, r0+i)
    img_ext = exchange_rows(image, 1, row_axis=0, pad_mode="edge")
    imgf = img_ext.astype(jnp.float32) / 255.0
    dv = jnp.sum((imgf[1:] - imgf[:-1]) ** 2, axis=-1)      # [hb+1, W]
    wv_full = jnp.exp(-dv / (sigma * sigma))
    wh, _ = fif_ops._edge_weights(image, sigma)             # row-local

    hres = (fif_ops._mp(vol, wh, pn)
            + fif_ops._mp(vol[..., ::-1], fif_ops._rev_w(wh),
                          pn)[..., ::-1]
            - vol)

    n_dev = lax.axis_size("row")
    grow = lax.axis_index("row") * h + jnp.arange(h, dtype=jnp.int32)
    aw_fwd = jnp.where((grow == 0)[:, None], 0.0, wv_full[:h])
    aw_bwd = jnp.where((grow == n_dev * h - 1)[:, None], 0.0, wv_full[1:])

    oi_d, perm_d = _band_order(True)
    fwd = _minplus_vert_band(hres, aw_fwd, pn, oi_d, perm_d, n_chunks)
    oi_u, perm_u = _band_order(False)
    bwd = _minplus_vert_band(hres[:, ::-1], aw_bwd[::-1], pn, oi_u,
                             perm_u, n_chunks)[:, ::-1]
    return fwd + bwd - hres


def _true_border_arm_clamp(arms: jnp.ndarray, halo: int, min_arm: int,
                           axis_name: str = "row") -> jnp.ndarray:
    """Clamp vertical arms of a halo-extended band to the TRUE picture
    borders. ``cross_arms`` on an extended band sees reflect-101 halo rows
    as real pixels, so a pixel at true image row 0 can grow an up-arm into
    them — the dense path's PAD_FAIL stops it at the border. Equivalent to
    the dense semantics: arm = max(min(raw, dist), min(min_arm, dist))
    with dist the distance to the true border (raw and dense growth agree
    up to dist because the halo rows ARE the reflect-101 values the dense
    pad would produce)."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    hext = arms.shape[1]
    h = hext - 2 * halo
    g = idx * h + jnp.arange(hext, dtype=jnp.int32) - halo   # global row
    hg = n * h
    dist_u = jnp.clip(g, 0, None)[:, None]
    dist_d = jnp.clip(hg - 1 - g, 0, None)[:, None]

    def cl(a, dist):
        return jnp.maximum(jnp.minimum(a, dist),
                           jnp.minimum(jnp.int32(min_arm), dist))

    return jnp.stack([arms[0], arms[1], cl(arms[2], dist_u),
                      cl(arms[3], dist_d)])


def _band_grad_y(gray_ext: jnp.ndarray, halo: int,
                 axis_name: str = "row") -> jnp.ndarray:
    """y-gradient of a halo-extended band matching the dense
    ``central_gradient`` bit-for-bit: central differences everywhere, with
    the one-sided edge rows at the TRUE picture borders (the band's own
    array edges sit halo rows away, inside the exactness margin)."""
    from mystereomatching_tpu.ops.cost import central_gradient

    g = central_gradient(gray_ext, 0)
    hext = gray_ext.shape[0]
    h = hext - 2 * halo
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    grow = idx * h + jnp.arange(hext, dtype=jnp.int32) - halo
    hg = n * h
    diff = gray_ext[1:] - gray_ext[:-1]
    down = jnp.concatenate([diff, jnp.zeros_like(gray_ext[:1])], 0)
    up = jnp.concatenate([jnp.zeros_like(gray_ext[:1]), diff], 0)
    g = jnp.where((grow == 0)[:, None], down, g)
    return jnp.where((grow == hg - 1)[:, None], up, g)


def _match_pair_band(left, right, cfg: MatchConfig, n_chunks: int,
                     d_shard: bool = False):
    """Per-band pipeline body (runs inside shard_map over 'row'; with
    ``d_shard`` also over 'disp' for the volume-building stage)."""
    halo = _cost_halo(cfg)
    left_ext = exchange_rows(left, halo, row_axis=0, pad_mode="reflect101")
    right_ext = exchange_rows(right, halo, row_axis=0, pad_mode="reflect101")
    gl, gr = to_gray(left_ext), to_gray(right_ext)

    need_arms = cfg.aggregation == "cbca" or (
        cfg.cost in ("grad", "census_grad", "ad_grad", "ad_census_grad")
        and cfg.grad_use_2dir and cfg.grad_fuse_adaptive) or (
        cfg.do_refine and (cfg.do_region_vote or cfg.do_rv_whole_image))
    arms_pair = (None, None)
    if need_arms:
        arms_pair = tuple(
            _true_border_arm_clamp(arms_ops.build_arms(img, cfg), halo,
                                   cfg.cbca_min_arm)
            for img in (left_ext, right_ext))
    gy_pair = None
    if cfg.cost in ("grad", "census_grad", "ad_grad",
                    "ad_census_grad") and cfg.grad_use_2dir:
        gy_pair = (_band_grad_y(gl, halo), _band_grad_y(gr, halo))

    n_imgs = 2 if (cfg.compute_both_volumes and cfg.do_lr_consis) else 1
    vols = {}
    for lor in range(n_imgs):
        if d_shard:
            # disparity-block parallelism (SURVEY §2.7): each 'disp' device
            # builds cost + CBCA for its D-block (the D-streaming builders
            # bound the [4, Db, H, W] arm tensor per device), then the full
            # volume is reassembled along ICI for the optimization stage
            nd_dev = lax.axis_size("disp")
            db = cfg.num_disp // nd_dev
            ds = lax.axis_index("disp") * db + jnp.arange(db,
                                                          dtype=jnp.int32)
            blk = cost_ops.block_cost_builder(
                left_ext, right_ext, gl, gr, cfg, lor,
                arms=arms_pair[lor], grad_y_pair=gy_pair)(ds)
            if cfg.aggregation == "cbca":
                from mystereomatching_tpu.ops.aggregation import cbca

                arms_int = arms_ops.intersect_arms_block(
                    arms_pair[0], arms_pair[1], ds, lor)
                blk = cbca(blk, arms_int, cfg.cbca_iterations,
                           max_arm=cfg.arm_l_out)
            elif cfg.aggregation != "none":
                raise NotImplementedError(
                    f"D-sharded aggregation {cfg.aggregation!r} unsupported")
            from mystereomatching_tpu.parallel.counters import (
                note_all_gather)

            note_all_gather(blk, nd_dev, stage="d_shard_volume")
            vol = lax.all_gather(blk, "disp", axis=0, tiled=True)
        else:
            vol = cost_ops.compute_cost_volume(left_ext, right_ext, gl, gr,
                                               cfg, lor,
                                               arms=arms_pair[lor],
                                               grad_y_pair=gy_pair)
            if cfg.aggregation == "cbca":
                from mystereomatching_tpu.ops.aggregation import cbca

                vol2 = None
                if cfg.cbca_double_win:
                    # double-window CBCA (cpp:4337-4357): large-window pass
                    # on the raw volume; arms rebuilt at index-1 params on
                    # the same halo-extended band
                    w1 = cfg.window1()
                    arms2 = tuple(
                        _true_border_arm_clamp(arms_ops.build_arms(img, w1),
                                               halo, w1.cbca_min_arm)
                        for img in (left_ext, right_ext))
                    arms2_int = arms_ops.intersect_arms(
                        arms2[0], arms2[1], cfg.num_disp, lor)
                    vol2 = cbca(vol, arms2_int, cfg.cbca_iterations,
                                max_arm=w1.arm_l_out)
                arms_int = arms_ops.intersect_arms(arms_pair[0],
                                                   arms_pair[1],
                                                   cfg.num_disp, lor)
                vol = cbca(vol, arms_int, cfg.cbca_iterations,
                           max_arm=cfg.arm_l_out)
                if vol2 is not None:
                    from mystereomatching_tpu.ops import combine as comb_ops

                    # pointwise merges (cpp:4283-4331) on the extended band
                    if cfg.cbca_combine == 1:
                        vol = comb_ops.combine2vm_pkr(vol, vol2)
                    elif cfg.cbca_combine == 2:
                        vol = comb_ops.combine2vm_arm_limit(
                            vol, vol2, arms_pair[lor])
                    elif cfg.cbca_combine == 3:
                        vol = comb_ops.combine2vm_min(vol, vol2)
                    else:
                        vol = comb_ops.combine2vm_4(vol, vol2, arms_pair[0])
            elif cfg.aggregation == "bf":
                from mystereomatching_tpu.ops.aggregation import (
                    box_filter_volume)

                vol = box_filter_volume(vol, cfg.bf_radius)
            elif cfg.aggregation in ("gf", "jbf", "aws", "nl", "gfnl",
                                     "fif"):
                # full-extent aggregations (round-5 port): FIF_Improve
                # keeps the band layout (V-pass wavefront); the rest
                # re-shard to D-blocks for the dense op
                vol = crop_rows(vol, halo, row_axis=1)
                if cfg.aggregation == "fif" and cfg.fif_improve:
                    vol = _fif_improve_band(
                        vol, left if lor == 0 else right, cfg, n_chunks)
                else:
                    vol = _dshard_aggregate_band(vol, cfg, left, right, lor)
                vols[lor] = vol
                continue
            elif cfg.aggregation != "none":
                raise NotImplementedError(
                    f"sharded aggregation {cfg.aggregation!r} not supported")
        vols[lor] = crop_rows(vol, halo, row_axis=1)

    if cfg.pyramid_levels > 1:
        vols = _crossscale_band(vols, left, right, cfg)

    # --- optimization (mirrors pipeline.optimize) ---
    images = {0: left, 1: right}
    if cfg.optimization == "sgm":
        for lor in vols:
            vols[lor] = _sgm_sharded(vols[lor], images[lor], cfg, n_chunks)
    if cfg.optimization == "so":
        # SO's per-row DP + backtrace run along W — row-local by
        # construction (cpp:6272-6416; disc map is a column roll)
        from mystereomatching_tpu.ops import so as so_ops

        dl = so_ops.scanline_optimize(vols[0], left, cfg)
        dr = (so_ops.scanline_optimize(vols[1], right, cfg)
              if 1 in vols else None)
    elif cfg.do_vmtop:
        dl = _vmtop_band(vols[0], left, cfg)
        dr = _vmtop_band(vols[1], right, cfg) if 1 in vols else None
    else:
        if 1 in vols:
            dl = wta_ops.wta(vols[0], cfg.choose_small)
            dr = wta_ops.wta(vols[1], cfg.choose_small)
        elif cfg.do_refine and cfg.do_lr_consis:
            # cooperative WTA from the left volume (wta_Co): row-local
            dl, dr = wta_ops.wta_pair_cooperative(vols[0], cfg.choose_small)
        else:
            dl = wta_ops.wta(vols[0], cfg.choose_small)
            dr = None
        if cfg.uniq_check:
            # UniqCk (wta_Co cpp:2763-2775): pointwise over the band
            bad = wta_ops.uniqueness_mask(vols[0], dl, cfg.uniqueness_ratio)
            dl = jnp.where(bad, cfg.disp_inv, dl)

    if not cfg.do_refine:
        from mystereomatching_tpu.pipeline import apply_sub_ipol

        return apply_sub_ipol(dl, dl, vols[0], cfg).astype(jnp.float32)

    # --- refinement (mirrors pipeline.refine stage order, halo per stage) ---
    d = dl
    if cfg.do_fill_surrounding:
        d = _fill_surrounding_band(d, cfg)
        if dr is not None:
            dr = _fill_surrounding_band(dr, cfg)
    if cfg.do_lr_consis and dr is not None:                       # row-local
        if cfg.lrc_classify:
            d = refine_ops.lr_consistency_classify(
                d, dr, cfg.num_disp, cfg.lr_max_diff,
                cfg.disp_occ, cfg.disp_mis)
        else:
            d = refine_ops.lr_consistency(d, dr, cfg.lr_max_diff,
                                          num_disp=cfg.num_disp)
    lrc_fail = d < 0
    if cfg.do_pkr:                                                # pointwise
        d = refine_ops.apply_pkr(d, vols[0], cfg.pkr_thresh, cfg.disp_pkr)
    hr = cfg.arm_l_out
    arms0 = (crop_rows(arms_pair[0], halo - hr, row_axis=1)
             if arms_pair[0] is not None else None)
    if cfg.do_region_vote:
        arms_tilt0 = None
        if cfg.rv_use_combine_bg and cfg.reg_vote_type > 0:
            # tilted arms (calTileDis cpp:3362-3443) on the halo-extended
            # band; every tilt direction has a vertical component, so all
            # four are clamped to the true picture borders
            arms_tilt0 = crop_rows(
                _true_border_tilt_clamp(
                    arms_ops.build_arms(left_ext, cfg,
                                        directions=arms_ops.TILT_DIRECTIONS),
                    halo, cfg.cbca_min_arm), halo - hr, row_axis=1)
        for _ in range(cfg.region_vote_iters):
            if cfg.rv_use_combine_bg:
                d = _rv_combine_bg_band(d, arms0, arms_tilt0, left, cfg, hr)
            else:
                d_ext = exchange_rows(d, hr, row_axis=0, pad_mode=-1)
                d_ext = refine_ops.region_vote(d_ext, arms0, cfg.num_disp,
                                               cfg.rv_s_thres,
                                               cfg.rv_h_ratio,
                                               cfg.rv_int_ratio_quirk,
                                               max_arm=cfg.arm_l_out)
                d = crop_rows(d_ext, hr, row_axis=0)
    if cfg.do_proper_ipol:
        hp = 2 * cfg.pi_search_depth
        li_ext = exchange_rows(left, hp, row_axis=0, pad_mode="edge")
        for _ in range(cfg.proper_ipol_iters):
            d_ext = exchange_rows(d, hp, row_axis=0, pad_mode=-1)
            d_ext = refine_ops.proper_interpolation(d_ext, li_ext,
                                                    cfg.pi_search_depth,
                                                    cfg.disp_occ)
            d = crop_rows(d_ext, hp, row_axis=0)
    if cfg.do_bg_ipol:
        if cfg.bg_ipol_kitti:
            # column extrapolation crosses row bands; the map is [H, W] —
            # gather it (negligible next to volume traffic, like _da_band)
            d = _gathered_map_band(
                d, lambda df: refine_ops.interpolate_background_kitti(
                    df, cfg.ipol_threshold), stage="kitti_bg")
        else:
            d = refine_ops.bg_interpolation(d, cfg.num_disp)      # row-local
    if cfg.do_wm:
        # weighted median: fixed wm_win halo; the dense kernel's _shift2d
        # border fills (-1 disp / 1e4 color / False mask) are reproduced at
        # the TRUE image borders by the exchange pad modes
        hw = cfg.wm_win
        d_ext = exchange_rows(d, hw, row_axis=0, pad_mode=-1)
        li_ext = exchange_rows(left, hw, row_axis=0, pad_mode=1e4)
        m_ext = exchange_rows(lrc_fail, hw, row_axis=0, pad_mode="zero")
        d = crop_rows(
            refine_ops.weighted_median(d_ext, li_ext, m_ext, cfg.num_disp,
                                       cfg.wm_win, cfg.wm_sigma_c,
                                       cfg.wm_sigma_s), hw, row_axis=0)
    if cfg.do_da:
        d = _da_band(d, vols[0], cfg)
    if cfg.do_subpixel:
        sub = refine_ops.subpixel_enhance(d, vols[0])             # pointwise
        hm = cfg.median_kernel // 2
        sub_ext = exchange_rows(sub, hm, row_axis=0, pad_mode="edge")
        return crop_rows(refine_ops.median_blur_disp(sub_ext,
                                                     cfg.median_kernel),
                         hm, row_axis=0).astype(jnp.float32)
    if cfg.do_last_median:
        hm = cfg.median_kernel // 2
        d_ext = exchange_rows(d, hm, row_axis=0, pad_mode="edge")
        d = crop_rows(refine_ops.median_blur_disp(d_ext, cfg.median_kernel),
                      hm, row_axis=0)
    if cfg.do_rv_whole_image:
        d_ext = exchange_rows(d, hr, row_axis=0, pad_mode=-1)
        d = crop_rows(refine_ops.region_vote_whole_image(
            d_ext, arms0, cfg.num_disp, max_arm=cfg.arm_l_out),
            hr, row_axis=0)
    from mystereomatching_tpu.pipeline import apply_sub_ipol

    return apply_sub_ipol(d, dl, vols[0], cfg).astype(jnp.float32)


def _fill_surrounding_band(d: jnp.ndarray, cfg: MatchConfig,
                           axis_name: str = "row") -> jnp.ndarray:
    """fillSurronding (cpp:2214-2260) on a row band: column bands are
    local; the W_V-row top/bottom bands go by GLOBAL row index."""
    h, w = d.shape
    g0 = lax.axis_index(axis_name) * h
    hg = lax.axis_size(axis_name) * h
    v = g0 + jnp.arange(h, dtype=jnp.int32)[:, None]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    border = (v < cfg.census_rv) | (v >= hg - cfg.census_rv) \
        | (u < cfg.census_ru) | (u >= w - cfg.census_ru)
    return jnp.where(border, jnp.asarray(cfg.disp_inv, d.dtype), d)


def _da_band(d: jnp.ndarray, vol: jnp.ndarray, cfg: MatchConfig,
             axis_name: str = "row") -> jnp.ndarray:
    """Discontinuity adjustment on a row band, bit-exact vs dense.

    The edge map's recipe is global — equalizeHist needs the full-image
    histogram and the hysteresis dilation chains are unbounded — but it is
    only [H, W] u8, a negligible all_gather next to the volume traffic. The
    full-map Canny runs replicated per band (cheap), the band slices its
    rows (+1 halo), and the ±1-neighbor adjustment runs on 1-row-extended
    disp/vol; the dense kernel's border-row exclusion is restored by
    global-row masking."""
    from mystereomatching_tpu.ops.canny import canny_edges

    h, w = d.shape
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    hg = n * h
    from mystereomatching_tpu.parallel.counters import note_all_gather

    note_all_gather(d, n, stage="da_edges")
    d_full = lax.all_gather(d, axis_name, axis=0, tiled=True)     # [Hg, W]
    d8 = jnp.clip(d_full, 0, 255).astype(jnp.uint8)
    edges_full = canny_edges(d8, low=20.0, high=60.0, equalize=True,
                             blur_sigma=4.0)
    ep = jnp.pad(edges_full, ((1, 1), (0, 0)))
    e_ext = lax.dynamic_slice(ep, (idx * h, 0), (h + 2, w))

    d_ext = exchange_rows(d, 1, row_axis=0, pad_mode=-1)
    v_ext = exchange_rows(vol, 1, row_axis=1, pad_mode="edge")
    out = refine_ops.discontinuity_adjust(d_ext, v_ext, edges=e_ext)
    out = crop_rows(out, 1, row_axis=0)
    # dense 'inner' mask: true top/bottom image rows stay untouched
    g = idx * h + jnp.arange(h, dtype=jnp.int32)[:, None]
    return jnp.where((g == 0) | (g == hg - 1), d, out)


def _gathered_map_band(d: jnp.ndarray, fn, stage: str,
                       axis_name: str = "row") -> jnp.ndarray:
    """Run an image-global [H, W]-map stage on the all_gathered full map
    and slice this band's rows back out. Bit-exact by construction; the
    [H, W] gather is negligible next to volume traffic (same pattern as
    _da_band's edge map)."""
    from mystereomatching_tpu.parallel.counters import note_all_gather

    h = d.shape[0]
    idx = lax.axis_index(axis_name)
    note_all_gather(d, lax.axis_size(axis_name), stage=stage)
    d_full = lax.all_gather(d, axis_name, axis=0, tiled=True)
    out = fn(d_full)
    return lax.dynamic_slice(out, (idx * h,) + (0,) * (out.ndim - 1),
                             (h,) + out.shape[1:])


def _vmtop_band(vol: jnp.ndarray, image: jnp.ndarray, cfg: MatchConfig,
                axis_name: str = "row") -> jnp.ndarray:
    """vmTop (cpp:1514-1885) on a row band, bit-exact vs dense.

    Candidate extraction is pointwise over D (band-local). Method 0's
    Jacobi vote reaches 1 row per iteration — candidates get an
    n_iters-row halo whose true-border pads equal the dense _shift2d
    fills (cand -1 / cost 0 / count 0 -> all-invalid), and the
    keep-candidate-0 border rule follows the GLOBAL row index. Methods
    1/2 are column scans along W — row-local as-is."""
    from mystereomatching_tpu.ops import vmtop as vmtop_ops

    cand_d, cand_c, count = vmtop_ops.select_top_costs(
        vol, max(cfg.vmtop_num, 2), cfg.vmtop_thres)
    method = cfg.vmtop_method
    if method == 1:
        return vmtop_ops.disp_from_top_method1(cand_d, count)
    if method == 2:
        return vmtop_ops.disp_from_top_method2(cand_d, count, image)
    n_iters = 2
    h = vol.shape[1]
    cde = exchange_rows(cand_d, n_iters, row_axis=1, pad_mode=-1)
    cce = exchange_rows(cand_c, n_iters, row_axis=1, pad_mode="zero")
    cnte = exchange_rows(count, n_iters, row_axis=0, pad_mode="zero")
    g0 = lax.axis_index(axis_name) * h
    v_coords = g0 - n_iters + jnp.arange(h + 2 * n_iters, dtype=jnp.int32)
    out = vmtop_ops.disp_from_top_method0(cde, cce, cnte, cfg,
                                          n_iters=n_iters,
                                          v_coords=v_coords)
    return crop_rows(out, n_iters, row_axis=0)


def _true_border_tilt_clamp(arms: jnp.ndarray, halo: int, min_arm: int,
                            axis_name: str = "row") -> jnp.ndarray:
    """Tilted-arm analog of :func:`_true_border_arm_clamp`: every 45-degree
    direction has a vertical component, so each raw arm grown on the
    halo-extended band is clamped to the true-border distance (the
    horizontal component is exact already — bands span the full width).
    Direction order: LT(-1,-1), RD(1,1), RU(-1,1), LD(1,-1)."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    hext = arms.shape[1]
    h = hext - 2 * halo
    g = idx * h + jnp.arange(hext, dtype=jnp.int32) - halo
    hg = n * h
    dist_u = jnp.clip(g, 0, None)[:, None]
    dist_d = jnp.clip(hg - 1 - g, 0, None)[:, None]

    def cl(a, dist):
        return jnp.maximum(jnp.minimum(a, dist),
                           jnp.minimum(jnp.int32(min_arm), dist))

    return jnp.stack([cl(arms[0], dist_u), cl(arms[1], dist_d),
                      cl(arms[2], dist_u), cl(arms[3], dist_d)])


def _rv_combine_bg_band(d: jnp.ndarray, arms0, arms_tilt0,
                        left: jnp.ndarray, cfg: MatchConfig,
                        hr: int) -> jnp.ndarray:
    """RV_combine_BG (cpp:7146-7216) on a row band: the vote runs on an
    hr-row halo (HV and tilted supports both reach <= arm_l_out rows); the
    2-direction background fill is row-local; the 4-direction fill's
    vertical rays cross bands -> gathered-map fallback."""
    d_ext = exchange_rows(d, hr, row_axis=0, pad_mode=-1)
    rv = None
    if cfg.interpolate_type in (0, 2, 3):
        rv = crop_rows(
            refine_ops.region_vote_core(d_ext, arms0, arms_tilt0,
                                        cfg.num_disp, cfg.rv_s_thres,
                                        cfg.rv_h_ratio, cfg.reg_vote_type,
                                        max_arm=cfg.arm_l_out),
            hr, row_axis=0)
    bg = None
    if cfg.interpolate_type in (1, 2, 3):
        if cfg.bg_ip_dir == 4:
            from mystereomatching_tpu.parallel.counters import (
                note_all_gather)

            n = lax.axis_size("row")
            note_all_gather(left, n, stage="bg4_image")
            img_full = lax.all_gather(left, "row", axis=0, tiled=True)
            bg = _gathered_map_band(
                d, lambda df: refine_ops.bg_fill_4dir(df, img_full,
                                                      cfg.bg_ipl_depth),
                stage="bg4_fill")
        else:
            bg, _ = refine_ops.bg_fill_2dir(d, cfg.bg_ipl_depth,
                                            cfg.num_disp)
    return refine_ops.rv_bg_policy(d, rv, bg, cfg.interpolate_type,
                                   cfg.disp_occ, cfg.disp_mis)


def _crossscale_band(vols, left, right, cfg: MatchConfig,
                     axis_name: str = "row"):
    """Cross-scale aggregation (SolveAll cpp:2142-2208) over row bands.

    The finest level is the local band; coarser levels (<= 1/8 the finest
    volume at level 1) are computed REPLICATED from the all_gathered
    images and indexed at this band's global rows — exact vs dense, and
    the replicated coarse work is bounded by sum(1/8^s) of a frame."""
    from mystereomatching_tpu.ops.crossscale import pyr_down, solve_all
    from mystereomatching_tpu.parallel.counters import note_all_gather
    from mystereomatching_tpu.pipeline import compute_volumes

    h = left.shape[0]
    n = lax.axis_size(axis_name)
    note_all_gather(left, n, stage="crossscale_images")
    note_all_gather(right, n, stage="crossscale_images")
    l = lax.all_gather(left, axis_name, axis=0, tiled=True)
    r = lax.all_gather(right, axis_name, axis=0, tiled=True)
    per = {lor: [vols[lor]] for lor in vols}
    c = cfg
    for _ in range(1, cfg.pyramid_levels):
        l, r = pyr_down(l), pyr_down(r)
        c = c.replace(max_disp=c.max_disp // 2 + 1)
        vs, _ = compute_volumes(l, r, c)
        for lor in vols:
            per[lor].append(vs[lor])
    row0 = lax.axis_index(axis_name) * h
    return {lor: solve_all(per[lor], cfg.reg_lambda, row0=row0)
            for lor in vols}


def check_sharded_support(cfg: MatchConfig) -> None:
    """Loud guard: every MatchConfig flag either runs with the SAME
    meaning as the dense path (bit-exact, tests/test_sharding.py) or
    raises here — no silent drops. After the round-4 tail ports the
    unsupported set is down to the genuinely irregular remainder."""
    if cfg.optimization not in ("sgm", "wta", "so"):
        raise NotImplementedError(
            f"sharded optimization {cfg.optimization!r} not supported")
    if cfg.aggregation not in ("cbca", "bf", "none", "gf", "jbf", "aws",
                               "fif", "nl", "gfnl"):
        raise NotImplementedError(
            f"sharded aggregation {cfg.aggregation!r} not supported")
    for flag, why in (
            ("do_cbbi", "flood-fill segmentation is image-global"),
            ("nl_post_process", "use parallel/nl_sharded.py"),
            ("d_stream_block", "use a 'disp' mesh axis instead"),
    ):
        if getattr(cfg, flag):
            raise NotImplementedError(f"sharded pipeline: {flag} ({why})")


def sharded_match_pair(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: MatchConfig,
    mesh: Mesh,
    n_chunks: int = 8,
) -> jnp.ndarray:
    """Batched, sharded pipeline. left/right: [B, H, W, 3] float32.

    B shards over 'data', H over 'row'; when the mesh has a 'disp' axis,
    the volume-building stage additionally shards the disparity axis
    (inputs replicated over 'disp', the aggregated volume all_gathered
    back). Returns [B, H, W] disparity.
    """
    check_sharded_support(cfg)
    d_shard = "disp" in mesh.axis_names
    if d_shard:
        if cfg.cbca_double_win:
            raise NotImplementedError(
                "cbca_double_win under a 'disp' mesh axis (per-D-block "
                "double-window build unimplemented; use 'row' sharding)")
        n_dd = mesh.shape["disp"]
        if cfg.num_disp % n_dd:
            raise ValueError(
                f"num_disp={cfg.num_disp} must divide over the 'disp' axis "
                f"({n_dd} devices)")
    band = functools.partial(_match_pair_band, cfg=cfg, n_chunks=n_chunks,
                             d_shard=d_shard)

    def local(lb, rb):
        # lb: [B_loc, h_loc, W, 3]
        return jax.vmap(band)(lb, rb)

    kw = {}
    if d_shard:
        # the result IS replicated over 'disp' (everything after the
        # all_gather is identical per disp-device), but the varying-axis
        # tracker cannot prove it — disable the check
        try:
            fn = shard_map(local, mesh=mesh,
                           in_specs=(P("data", "row"), P("data", "row")),
                           out_specs=P("data", "row"), check_vma=False)
        except TypeError:                      # older jax: check_rep
            fn = shard_map(local, mesh=mesh,
                           in_specs=(P("data", "row"), P("data", "row")),
                           out_specs=P("data", "row"), check_rep=False)
    else:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("data", "row"), P("data", "row")),
                       out_specs=P("data", "row"))
    return fn(left.astype(jnp.float32), right.astype(jnp.float32))
