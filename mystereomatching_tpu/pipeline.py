"""End-to-end stereo pipeline: cost -> aggregation -> optimization -> refine.

The TPU-native equivalent of the reference call stack (SURVEY.md §3.1):
``costCalculate()`` (cpp:945) -> ``dispOptimize()`` (cpp:1046) ->
``refine()`` (cpp:1138), composed as one pure jittable function over
device-resident arrays. Stage selection is static (closed over from
:class:`MatchConfig`), so XLA sees a single fused program per config.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops import aggregation as agg_ops
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import refine as refine_ops
from mystereomatching_tpu.ops import sgm as sgm_ops
from mystereomatching_tpu.ops import wta as wta_ops


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB->gray exactly as the reference consumes it.

    The reference loads gray via ``cv::imread(path, 0)`` (main_.cpp:122),
    which decodes through libpng's rgb_to_gray: BT.601 weights floored to
    15-bit fixed point as (9797*R + 19234*G + 3737*B) >> 15 (libpng derives
    each coefficient as floor(w * 32768) with the blue weight absorbing the
    remainder). Verified bit-exact against imread on all refbuild scenes;
    using cvtColor-style rounding instead flips ~50% of pixels by 1 gray
    level and cascades into census-bit/grad divergence vs the reference.
    """
    r = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    b = img[..., 2].astype(jnp.int32)
    return ((9797 * r + 19234 * g + 3737 * b) >> 15).astype(jnp.float32)


def _needs_arms_for_cost(cfg: MatchConfig) -> bool:
    grad_costs = {"grad", "census_grad", "ad_grad", "ad_census_grad"}
    return cfg.cost in grad_costs and cfg.grad_use_2dir and cfg.grad_fuse_adaptive


def compute_volumes(left, right, cfg: MatchConfig, host_trees=None):
    """L1+L2: cost volumes for the needed views, aggregated.

    Returns (vols, arms_pair): vols is a dict {0: volL, 1: volR?};
    arms_pair is (HVL0, HVL1) cross arms or (None, None).
    host_trees: optional {lor: (parent, weight)} precomputed rooted MSTs
    (the NL host-build hybrid — see ops/nl.build_tree_host).
    """
    gl, gr = to_gray(left), to_gray(right)
    n_imgs = 2 if (cfg.compute_both_volumes and cfg.do_lr_consis) else 1

    need_arms = _needs_arms_for_cost(cfg) or cfg.aggregation == "cbca" or (
        cfg.do_refine and (cfg.do_region_vote or cfg.do_rv_whole_image))
    arms_pair = (None, None)
    if need_arms:
        arms_pair = tuple(arms_ops.build_arms(img, cfg)
                          for img in (left, right))
    arms2_pair = (None, None)
    if cfg.aggregation == "cbca" and cfg.cbca_double_win:
        # double-window CBCA (CBCA() cpp:4337-4357): a second arm build at
        # the index-1 (large-window) parameters feeds a parallel CBCA pass
        if cfg.d_stream_block:
            raise NotImplementedError(
                "cbca_double_win has no D-streaming form")
        arms2_pair = tuple(arms_ops.build_arms(img, cfg.window1())
                           for img in (left, right))

    vols = {}
    for lor in range(n_imgs):
        if cfg.d_stream_block:
            vols[lor] = _volume_dstream(left, right, gl, gr, cfg, lor,
                                        arms_pair)
            continue
        vol = cost_ops.compute_cost_volume(left, right, gl, gr, cfg, lor,
                                           arms=arms_pair[lor])
        if cfg.vol_dtype != "float32":
            # fast mode: bf16 volumes halve the bandwidth of every
            # aggregation/optimization pass; disparity decisions may flip
            # on near-ties (~0.4% relative cost error)
            vol = vol.astype(jnp.dtype(cfg.vol_dtype))
        if cfg.aggregation == "cbca":
            vol2 = None
            if cfg.cbca_double_win:
                # large-window pass first on a copy of the raw volume
                # (cpp:4339-4343), then the small-window pass on vol
                arms2_int = arms_ops.intersect_arms(
                    arms2_pair[0], arms2_pair[1], cfg.num_disp, lor)
                vol2 = agg_ops.cbca(vol, arms2_int, cfg.cbca_iterations,
                                    max_arm=cfg.window1().arm_l_out)
            arms_int = arms_ops.intersect_arms(arms_pair[0], arms_pair[1],
                                               cfg.num_disp, lor)
            vol = agg_ops.cbca(vol, arms_int, cfg.cbca_iterations,
                               max_arm=cfg.arm_l_out)
            if vol2 is not None:
                from mystereomatching_tpu.ops import combine as combine_ops

                if cfg.cbca_combine == 1:
                    vol = combine_ops.combine2vm_pkr(vol, vol2)
                elif cfg.cbca_combine == 2:
                    vol = combine_ops.combine2vm_arm_limit(
                        vol, vol2, arms_pair[lor])
                elif cfg.cbca_combine == 3:
                    vol = combine_ops.combine2vm_min(vol, vol2)
                elif cfg.cbca_combine == 4:
                    # combine2Vm_4 derives its mask from the LEFT image's
                    # small-window arms for both volumes (cpp:4288-4296)
                    vol = combine_ops.combine2vm_4(vol, vol2, arms_pair[0])
                else:
                    raise ValueError(
                        f"unknown cbca_combine {cfg.cbca_combine}")
        else:
            img, g = (left, gl) if lor == 0 else (right, gr)
            oth = right if lor == 0 else left
            tree = None
            if host_trees is not None and lor in host_trees:
                from mystereomatching_tpu.ops.mst import RootedTree

                p, w_ = host_trees[lor]
                tree = RootedTree(parent=p, weight=w_, shape=left.shape[:2])
            vol = agg_ops.aggregate(vol, cfg, img, g, other_image=oth,
                                    lor=lor, tree=tree)
        vols[lor] = vol
    return vols, arms_pair


def _volume_dstream(left, right, gl, gr, cfg: MatchConfig, lor, arms_pair):
    """Cost + aggregation streamed over disparity blocks.

    The full-res configurations (BASELINE config 5 at true 2014 scale,
    2880x1988 D=256) cannot materialize the [4,D,H,W] intersected-arm
    tensor (SURVEY.md §7 hard-part 3). Cost and CBCA are per-disparity
    independent, so a ``fori_loop`` over D-blocks builds the aggregated
    volume with only one block's arms/cost live at a time, writing
    ``vol_dtype`` results in place into the [D,H,W] carry.
    """
    db = cfg.d_stream_block
    nd = cfg.num_disp
    block_fn = cost_ops.block_cost_builder(left, right, gl, gr, cfg, lor,
                                           arms=arms_pair[lor])
    vdt = jnp.dtype(cfg.vol_dtype)
    out = jnp.zeros((nd,) + left.shape[:2], vdt)

    def body(i, out):
        d0 = i * db
        ds = d0 + jnp.arange(db, dtype=jnp.int32)
        blk = block_fn(ds).astype(vdt)
        if cfg.aggregation == "cbca":
            arms_int = arms_ops.intersect_arms_block(
                arms_pair[0], arms_pair[1], ds, lor)
            blk = agg_ops.cbca(blk, arms_int, cfg.cbca_iterations,
                               max_arm=cfg.arm_l_out)
        elif cfg.aggregation != "none":
            raise NotImplementedError(
                f"aggregation {cfg.aggregation!r} has no D-streaming form")
        return jax.lax.dynamic_update_slice(out, blk.astype(vdt), (d0, 0, 0))

    return jax.lax.fori_loop(0, nd // db, body, out)


def optimize(vols, left, right, cfg: MatchConfig):
    """L3 (dispOptimize cpp:1046-1136): SGM/SO per volume then WTA.

    Returns (d_left, d_right_or_None, vol_left_after_opt)."""
    images = {0: left, 1: right}
    if cfg.optimization == "sgm":
        run = functools.partial(
            sgm_ops.sgm, num_directions=cfg.sgm_scan_num, p1=cfg.sgm_p1_eff,
            p2=cfg.sgm_p2_eff, cor_dif_thres=cfg.sgm_cor_dif_thres,
            redu_coeff=cfg.sgm_redu_coeff)
        if len(vols) == 2:
            # batch the left/right volumes into the same vmapped scans:
            # halves the number of latency-bound sequential scan steps
            res = jax.vmap(run)(jnp.stack([vols[0], vols[1]]),
                                jnp.stack([left, right]))
            vols = {0: res[0], 1: res[1]}
        else:
            for lor in list(vols):
                vols[lor] = run(vols[lor], images[lor])
    elif cfg.optimization == "so":
        from mystereomatching_tpu.ops import so as so_ops

        d0 = so_ops.scanline_optimize(vols[0], left, cfg)
        d1 = None
        if 1 in vols:
            d1 = so_ops.scanline_optimize(vols[1], right, cfg)
        return d0, d1, vols[0]

    if cfg.do_vmtop:
        from mystereomatching_tpu.ops import vmtop as vmtop_ops

        dl = vmtop_ops.disp_from_top(vols[0], left, cfg, cfg.vmtop_method)
        dr = (vmtop_ops.disp_from_top(vols[1], right, cfg, cfg.vmtop_method)
              if 1 in vols else None)
        return dl, dr, vols[0]
    if 1 in vols:
        dl = wta_ops.wta(vols[0], cfg.choose_small)
        dr = wta_ops.wta(vols[1], cfg.choose_small)
    elif cfg.do_refine and cfg.do_lr_consis:
        # cooperative WTA (wta_Co cpp:2709-2792): derive the right map by
        # reindexing the LEFT volume — no right volume needed (halves HBM
        # for the full-res D=256 configuration)
        dl, dr = wta_ops.wta_pair_cooperative(vols[0], cfg.choose_small)
    else:
        dl = wta_ops.wta(vols[0], cfg.choose_small)
        dr = None
    if cfg.uniq_check:
        # UniqCk (wta_Co cpp:2763-2775 / caldisp_SSD h:524-538): the WTA
        # disparity is invalidated (DISP_INV) when any non-neighbor d beats
        # cost*uniquenessRatio; invalid pixels are filled by refinement
        bad = wta_ops.uniqueness_mask(vols[0], dl, cfg.uniqueness_ratio)
        dl = jnp.where(bad, cfg.disp_inv, dl)
    return dl, dr, vols[0]


def refine(d_left, d_right, vol_left, left, arms0, cfg: MatchConfig):
    """L4 (refine() cpp:1347-1511): fixed stage order on the left map."""
    d = d_left
    if cfg.do_fill_surrounding:
        # fillSurronding (cpp:2214-2260): census-window border band ->
        # DISP_INV on both maps before LRC (the SSD own-WTA flow, h:490)
        d = refine_ops.fill_surrounding(d, cfg.census_rv, cfg.census_ru,
                                        cfg.disp_inv)
        if d_right is not None:
            d_right = refine_ops.fill_surrounding(
                d_right, cfg.census_rv, cfg.census_ru, cfg.disp_inv)
    if cfg.do_lr_consis and d_right is not None:
        if cfg.lrc_classify:
            d = refine_ops.lr_consistency_classify(
                d, d_right, cfg.num_disp, cfg.lr_max_diff,
                cfg.disp_occ, cfg.disp_mis)
        else:
            d = refine_ops.lr_consistency(d, d_right, cfg.lr_max_diff,
                                          num_disp=cfg.num_disp)
    lrc_fail = d < 0
    if cfg.do_pkr:
        d = refine_ops.apply_pkr(d, vol_left, cfg.pkr_thresh, cfg.disp_pkr)
    if cfg.do_region_vote:
        arms_tilt = None
        if cfg.rv_use_combine_bg and cfg.reg_vote_type > 0:
            arms_tilt = arms_ops.build_arms(
                left, cfg, directions=arms_ops.TILT_DIRECTIONS)
        for _ in range(cfg.region_vote_iters):
            if cfg.rv_use_combine_bg:
                d = refine_ops.rv_combine_bg(
                    d, arms0, arms_tilt, left, cfg.num_disp, cfg.rv_s_thres,
                    cfg.rv_h_ratio, cfg.interpolate_type, cfg.reg_vote_type,
                    cfg.bg_ipl_depth, cfg.bg_ip_dir, cfg.disp_occ,
                    cfg.disp_mis, max_arm=cfg.arm_l_out)
            else:
                d = refine_ops.region_vote(
                    d, arms0, cfg.num_disp, cfg.rv_s_thres, cfg.rv_h_ratio,
                    cfg.rv_int_ratio_quirk, max_arm=cfg.arm_l_out)
    if cfg.do_cbbi:
        from mystereomatching_tpu.ops import cbbi as cbbi_ops

        d = cbbi_ops.cbbi(d, left, cfg)
    if cfg.do_proper_ipol:
        for _ in range(cfg.proper_ipol_iters):
            d = refine_ops.proper_interpolation(d, left, cfg.pi_search_depth,
                                                cfg.disp_occ)
    if cfg.do_bg_ipol:
        if cfg.bg_ipol_kitti:
            d = refine_ops.interpolate_background_kitti(d, cfg.ipol_threshold)
        else:
            d = refine_ops.bg_interpolation(d, cfg.num_disp)
    if cfg.do_wm:
        d = refine_ops.weighted_median(d, left, lrc_fail, cfg.num_disp,
                                       cfg.wm_win, cfg.wm_sigma_c, cfg.wm_sigma_s)
    if cfg.do_da:
        d = refine_ops.discontinuity_adjust(d, vol_left)
    if cfg.do_subpixel:
        sub = refine_ops.subpixel_enhance(d, vol_left)
        sub = refine_ops.median_blur_disp(sub, cfg.median_kernel)
        return sub  # float map (reference keeps a separate SE buffer)
    if cfg.do_last_median:
        d = refine_ops.median_blur_disp(d, cfg.median_kernel)
    if cfg.do_rv_whole_image:
        d = refine_ops.region_vote_whole_image(d, arms0, cfg.num_disp,
                                               max_arm=cfg.arm_l_out)
    return d


def match_pair(left: jnp.ndarray, right: jnp.ndarray, cfg: MatchConfig,
               host_trees=None) -> Dict[str, jnp.ndarray]:
    """Full pipeline. left/right: [H,W,3] uint8/float32 RGB.

    Returns dict with 'disparity' (float32 [H,W], negatives = sentinel
    codes), 'disp_left_raw', 'disp_right_raw' (pre-refinement int32).
    host_trees: optional {lor: (parent, weight)} for the NL host-build
    hybrid (cfg.nl_tree_host; computed by StereoPipeline outside jit).
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    if cfg.aggregation == "nl" and cfg.nl_post_process:
        # the standalone qx NL flow (disparity(..., true), NL/qx_nonlocal_
        # cost_aggregation.cpp:72-109) owns optimization + refinement:
        # filter raw volume with BOTH trees, occlusion-detect, rebuild,
        # re-filter at sigma/2 — golden-tested in tests/test_nl_golden.py
        from mystereomatching_tpu.ops import nl as nl_ops
        from mystereomatching_tpu.ops.mst import RootedTree

        gl, gr = to_gray(left), to_gray(right)
        vol = cost_ops.compute_cost_volume(left, right, gl, gr, cfg, 0)
        trees = None
        if host_trees is not None and 0 in host_trees and 1 in host_trees:
            trees = tuple(
                RootedTree(parent=host_trees[i][0], weight=host_trees[i][1],
                           shape=left.shape[:2]) for i in (0, 1))
        d, d_raw = nl_ops.nl_disparity(vol, left, right, cfg.nl_sigma,
                                       post_process=True, trees=trees,
                                       neighbors=cfg.nl_neighbors)
        return {"disparity": d.astype(jnp.float32), "disp_left_raw": d_raw}
    vols, arms_pair = compute_volumes(left, right, cfg, host_trees)
    if cfg.pyramid_levels > 1:
        # cross-scale aggregation (SolveAll, cpp:2142-2208): build coarser
        # aggregated volumes on a Gaussian pyramid (maxdisp/2+1 per level,
        # main_.cpp:152) and fuse at the finest level
        from mystereomatching_tpu.ops.crossscale import pyr_down, solve_all

        per_level = {lor: [vols[lor]] for lor in vols}
        l, r, c = left, right, cfg
        for _ in range(1, cfg.pyramid_levels):
            l, r = pyr_down(l), pyr_down(r)
            c = c.replace(max_disp=c.max_disp // 2 + 1)
            vs, _ = compute_volumes(l, r, c)
            for lor in vols:
                per_level[lor].append(vs[lor])
        vols = {lor: solve_all(per_level[lor], cfg.reg_lambda) for lor in vols}
    dl, dr, vol0 = optimize(vols, left, right, cfg)
    out = {"disp_left_raw": dl}
    if dr is not None:
        out["disp_right_raw"] = dr
    if cfg.do_refine:
        d = refine(dl, dr, vol0, left, arms_pair[0], cfg)
    else:
        d = dl
    d = apply_sub_ipol(d, dl, vol0, cfg)
    out["disparity"] = d.astype(jnp.float32)
    return out


def apply_sub_ipol(d, dl_raw, vol0, cfg: MatchConfig):
    """SubIpl (wta_Co cpp:2778-2784 / caldisp_SSD h:540-556): quadratic
    subpixel at DECISION time, quantized to 1/DISP_SCALE exactly like the
    reference's short fixed-point map.

    Composition with refinement (the reference never composes them — the
    flag only lives in the dead wta_Co and the SSD own-WTA flow): pixels
    the refinement chain changed keep their refined value; pixels still
    holding the raw WTA disparity get the decision-time subpixel offset.
    ``do_subpixel`` (subpixelEnhancement, a refit around the FINAL value)
    supersedes it; SO/vmTop decisions are not plain WTA, so it is a no-op
    there, matching the reference call graph."""
    if not cfg.sub_ipol or cfg.do_subpixel or cfg.do_vmtop \
            or cfg.optimization == "so":
        return d
    sub = wta_ops.subpixel_quadratic(vol0, jnp.maximum(dl_raw, 0))
    subq = jnp.round(sub * cfg.disp_scale) / cfg.disp_scale
    keep = (d == dl_raw) & (dl_raw >= 0)
    return jnp.where(keep, subq, d.astype(jnp.float32))


def match_pair_nl_batch(lefts: jnp.ndarray, rights: jnp.ndarray,
                        cfg: MatchConfig) -> Dict[str, jnp.ndarray]:
    """Batched NL pipeline over B frames ([B,H,W,3] inputs).

    Cost volumes, WTA, and refinement vmap per frame; the MST build and
    tree filter run ONCE over the stacked [B*H, W] forest
    (ops/mst.build_tree_batch + ops/nl.nl_aggregate_batch), so the
    Borůvka/peel/ranking round latencies amortize across the batch and
    the rooting's lax.cond stays a single scalar branch (a vmapped cond
    would execute both branches per frame). Per-frame disparities are
    bit-identical to :func:`match_pair`.
    """
    from mystereomatching_tpu.ops import nl as nl_ops

    if cfg.aggregation != "nl" or cfg.nl_post_process or cfg.d_stream_block:
        raise NotImplementedError(
            "match_pair_nl_batch supports the single-volume NL preset")
    lefts = lefts.astype(jnp.float32)
    rights = rights.astype(jnp.float32)
    need_arms = _needs_arms_for_cost(cfg) or (
        cfg.do_refine and (cfg.do_region_vote or cfg.do_rv_whole_image))

    def raw_volume(l, r):
        gl, gr = to_gray(l), to_gray(r)
        arms = arms_ops.build_arms(l, cfg) if need_arms else None
        vol = cost_ops.compute_cost_volume(l, r, gl, gr, cfg, 0, arms=arms)
        return vol, (arms if arms is not None else jnp.zeros((), jnp.int8))

    vols, arms0 = jax.vmap(raw_volume)(lefts, rights)
    avols = nl_ops.nl_aggregate_batch(vols, lefts, cfg.nl_sigma)

    def tail(vol, l, r, arms):
        dl, dr, vol0 = optimize({0: vol}, l, r, cfg)
        if cfg.do_refine:
            d = refine(dl, dr, vol0, l,
                       arms if need_arms else None, cfg)
        else:
            d = dl
        return d.astype(jnp.float32), dl

    d, dl = jax.vmap(tail)(avols, lefts, rights, arms0)
    return {"disparity": d, "disp_left_raw": dl}


class StereoPipeline:
    """Jitted pipeline wrapper; one compiled executable per (config, shape).

    With ``cfg.nl_tree_host`` (NL/GFNL aggregation), the MST is built on the
    host by the native C++ runtime before dispatch — the tree is a pure
    function of the input frame, so it enters the jitted program as two [N]
    arguments instead of ~400ms of device Borůvka + list-ranking gathers.
    """

    def __init__(self, cfg: MatchConfig):
        self.cfg = cfg.validate()
        self._host_trees = (cfg.nl_tree_host
                            and cfg.aggregation in ("nl", "gfnl"))
        self._fn = jax.jit(functools.partial(match_pair, cfg=self.cfg))

    def _trees(self, left, right):
        import numpy as np

        from mystereomatching_tpu.ops.nl import build_tree_host

        n_imgs = 2 if (self.cfg.nl_post_process
                       or (self.cfg.compute_both_volumes
                           and self.cfg.do_lr_consis)) else 1
        trees = {}
        for lor, img in ((0, left), (1, right))[:n_imgs]:
            t = build_tree_host(np.asarray(img),
                                neighbors=self.cfg.nl_neighbors)
            trees[lor] = (t.parent, t.weight)
        return trees

    def __call__(self, left, right) -> Dict[str, jnp.ndarray]:
        if self._host_trees:
            return self._fn(jnp.asarray(left), jnp.asarray(right),
                            host_trees=self._trees(left, right))
        return self._fn(jnp.asarray(left), jnp.asarray(right))

    def lower(self, left, right):
        return self._fn.lower(jnp.asarray(left), jnp.asarray(right))
