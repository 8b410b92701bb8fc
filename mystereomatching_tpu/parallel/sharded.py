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
        h = max(h, cfg.cbca_cross_l_out + 1)    # adaptive weight needs arms
    if cfg.aggregation == "cbca":
        # each iteration's V pass reaches l_out; arms reach l_out beyond that
        h = max(h, cfg.cbca_iterations * cfg.cbca_cross_l_out
                + cfg.cbca_cross_l_out + cfg.census_rv + 1)
    if cfg.aggregation == "bf":
        h = max(h, cfg.bf_radius + 1)
    return h


def _vertical_sgm_band(vol, pscale, down: bool, p1, p2, n_chunks: int):
    """Wavefront-pipelined vertical SGM scan over row bands.

    vol: local [D, h, W]; pscale: [h, W] for this direction (predecessor
    row diff, from a 1-row image halo). ``down``: scan top->bottom
    (predecessor above) vs bottom->top. Exact equivalent of the dense
    vertical costScan across the full image height.
    """
    d_, h, w = vol.shape
    p_axis = "row"
    n_dev = lax.axis_size(p_axis)
    my = lax.axis_index(p_axis)

    # orientation: normalize to a downward scan
    voln = vol if down else vol[:, ::-1]
    psn = pscale if down else pscale[::-1]
    # device order reverses for upward scans
    order_idx = my if down else (n_dev - 1 - my)

    cw = -(-w // n_chunks)
    wpad = cw * n_chunks
    volp = jnp.pad(voln, ((0, 0), (0, 0), (0, wpad - w)))
    psp = jnp.pad(psn, ((0, 0), (0, wpad - w)), constant_values=1.0)

    out = volp * 0
    state = volp[:, 0, :cw] * 0                  # boundary Lr for next chunk
    perm = [(i, i + 1) for i in range(n_dev - 1)] if down else \
           [(i, i - 1) for i in range(1, n_dev)]

    def step(t, carry):
        out, state = carry
        c = t - order_idx
        cc = jnp.clip(c, 0, n_chunks - 1)
        active = (c >= 0) & (c < n_chunks)
        chunk = lax.dynamic_slice(volp, (0, 0, cc * cw), (d_, h, cw))
        psc = lax.dynamic_slice(psp, (0, cc * cw), (h, cw))
        init = jnp.where(order_idx == 0, jnp.zeros_like(state), state)
        from mystereomatching_tpu.ops import pallas_kernels as pk

        if pk.tpu_backend():
            res = pk.sgm_scan_pallas(chunk[None], psc[None], p1=p1, p2=p2,
                                     init=init[None])[0]
        else:
            res = sgm_ops._scan_down(chunk, psc, p1, p2, init=init)
        out = jnp.where(active,
                        lax.dynamic_update_slice(out, res, (0, 0, cc * cw)),
                        out)
        boundary = res[:, -1, :]
        state = lax.ppermute(boundary, p_axis, perm)
        return out, state

    out, _ = lax.fori_loop(0, n_chunks + n_dev - 1, step, (out, state))
    out = out[:, :, :w]
    return out if down else out[:, ::-1]


def _sgm_sharded(vol, image, cfg: MatchConfig, n_chunks: int):
    """4-direction SGM on a row band: horizontal local, vertical wavefront."""
    img_ext = exchange_rows(image, 1, row_axis=0, pad_mode="edge")
    imgf = img_ext.astype(jnp.float32)
    # pscale rows: down-scan predecessor is the row above (h:2219-2230)
    d_up = jnp.max(jnp.abs(imgf[1:-1] - imgf[:-2]), axis=-1)     # vs row above
    d_dn = jnp.max(jnp.abs(imgf[1:-1] - imgf[2:]), axis=-1)      # vs row below
    scale_up = jnp.where(d_up > cfg.sgm_cor_dif_thres, 1.0 / cfg.sgm_redu_coeff, 1.0)
    scale_dn = jnp.where(d_dn > cfg.sgm_cor_dif_thres, 1.0 / cfg.sgm_redu_coeff, 1.0)

    out = jnp.zeros_like(vol)
    # vertical: predecessor above (-1,0) scans down; (1,0) scans up
    out = out + _vertical_sgm_band(vol, scale_up, True, cfg.sgm_p1, cfg.sgm_p2, n_chunks)
    out = out + _vertical_sgm_band(vol, scale_dn, False, cfg.sgm_p1, cfg.sgm_p2, n_chunks)
    # horizontal: row-local (batched into one kernel on TPU)
    out = out + sgm_ops.sgm_directions(
        [vol], [image], ((0, 1), (0, -1)), cfg.sgm_p1, cfg.sgm_p2,
        cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff)[0]
    return out


def _match_pair_band(left, right, cfg: MatchConfig, n_chunks: int):
    """Per-band pipeline body (runs inside shard_map over 'row')."""
    halo = _cost_halo(cfg)
    left_ext = exchange_rows(left, halo, row_axis=0, pad_mode="reflect101")
    right_ext = exchange_rows(right, halo, row_axis=0, pad_mode="reflect101")
    gl, gr = to_gray(left_ext), to_gray(right_ext)

    need_arms = cfg.aggregation == "cbca" or (
        cfg.cost in ("grad", "census_grad", "ad_grad", "ad_census_grad")
        and cfg.grad_use_2dir and cfg.grad_fuse_adaptive) or (
        cfg.do_refine and cfg.do_region_vote)
    arms_pair = (None, None)
    if need_arms:
        arms_pair = tuple(
            arms_ops.cross_arms(img, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                                cfg.cbca_c_thresh, cfg.cbca_c_thresh_out,
                                cfg.cbca_min_arm)
            for img in (left_ext, right_ext))

    n_imgs = 2 if (cfg.compute_both_volumes and cfg.do_lr_consis) else 1
    vols = {}
    for lor in range(n_imgs):
        vol = cost_ops.compute_cost_volume(left_ext, right_ext, gl, gr, cfg,
                                           lor, arms=arms_pair[lor])
        if cfg.aggregation == "cbca":
            arms_int = arms_ops.intersect_arms(arms_pair[0], arms_pair[1],
                                               cfg.num_disp, lor)
            from mystereomatching_tpu.ops.aggregation import cbca

            vol = cbca(vol, arms_int, cfg.cbca_iterations,
                       max_arm=cfg.cbca_cross_l_out)
        elif cfg.aggregation == "bf":
            from mystereomatching_tpu.ops.aggregation import box_filter_volume

            vol = box_filter_volume(vol, cfg.bf_radius)
        elif cfg.aggregation != "none":
            raise NotImplementedError(
                f"sharded aggregation {cfg.aggregation!r} not yet supported")
        vols[lor] = crop_rows(vol, halo, row_axis=1)

    # --- optimization ---
    images = {0: left, 1: right}
    if cfg.optimization == "sgm":
        for lor in vols:
            vols[lor] = _sgm_sharded(vols[lor], images[lor], cfg, n_chunks)
    elif cfg.optimization != "wta":
        raise NotImplementedError(
            f"sharded optimization {cfg.optimization!r} not yet supported")
    dl = wta_ops.wta(vols[0], cfg.choose_small)
    dr = wta_ops.wta(vols[1], cfg.choose_small) if 1 in vols else None

    if not cfg.do_refine:
        return dl.astype(jnp.float32)

    # --- refinement (halo per stage) ---
    d = dl
    if cfg.do_lr_consis and dr is not None:
        d = refine_ops.lr_consistency(d, dr, cfg.lr_max_diff)     # row-local
    if cfg.do_region_vote:
        hr = cfg.cbca_cross_l_out
        arms0 = tuple(crop_rows(a, halo - hr, row_axis=1) for a in (arms_pair[0],))[0]
        for _ in range(cfg.region_vote_iters):
            d_ext = exchange_rows(d, hr, row_axis=0, pad_mode=-1)
            d_ext = refine_ops.region_vote(d_ext, arms0, cfg.num_disp,
                                           cfg.rv_s_thres, cfg.rv_h_ratio,
                                           cfg.rv_int_ratio_quirk,
                                           max_arm=cfg.cbca_cross_l_out)
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
        d = refine_ops.bg_interpolation(d)                        # row-local
    if cfg.do_last_median:
        hm = cfg.median_kernel // 2
        d_ext = exchange_rows(d, hm, row_axis=0, pad_mode="edge")
        d = crop_rows(refine_ops.median_blur_disp(d_ext, cfg.median_kernel),
                      hm, row_axis=0)
    return d.astype(jnp.float32)


def sharded_match_pair(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: MatchConfig,
    mesh: Mesh,
    n_chunks: int = 8,
) -> jnp.ndarray:
    """Batched, sharded pipeline. left/right: [B, H, W, 3] float32.

    B shards over 'data', H over 'row'. Returns [B, H, W] disparity.
    """
    band = functools.partial(_match_pair_band, cfg=cfg, n_chunks=n_chunks)

    def local(lb, rb):
        # lb: [B_loc, h_loc, W, 3]
        return jax.vmap(band)(lb, rb)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("data", "row"), P("data", "row")),
                   out_specs=P("data", "row"))
    return fn(left.astype(jnp.float32), right.astype(jnp.float32))
