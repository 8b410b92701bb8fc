"""Cost aggregation (L2): cost-volume filtering.

TPU-native re-design of the reference aggregation family. This module holds
CBCA (the default) and the box filter; guided/FIF/NL/AWS live in their own
modules and are dispatched from :func:`aggregate`.

CBCA (cross-based cost aggregation, cpp:4333-4402 / cbca_core 5585-5666):
two iterations of orthogonal 1-D arm-bounded integral aggregation over
per-disparity intersected cross arms, alternating H->V then V->H, each
iteration normalized by the aggregated support area. The reference's
sequential running sums (gen1DCumu cpp:3896-3926) become ``cumsum`` +
gather-differences (:func:`mystereomatching_tpu.ops.arms.arm_bounded_sum`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops.arms import (
    arm_bounded_sum, arm_bounded_sum_with_area, cross_arms, intersect_arms)


def cbca(
    vol: jnp.ndarray,
    arms_int: jnp.ndarray,
    iterations: int = 2,
    max_arm: int = 34,
) -> jnp.ndarray:
    """Cross-based aggregation with per-disparity intersected arms.

    vol: [D,H,W]; arms_int: [4,D,H,W] (left,right,up,down). Iteration i
    runs H->V when i is even, V->H when odd (cbca_core cpp:5605-5616);
    the support-area volume receives the identical transform and divides
    the result (genfinalVm_cbca cpp:3969-3992).

    Per iteration, the first pass derives the area directly from the arms
    (count = armN + armP + 1); the second pass aggregates vol and area
    together in one fused tap loop ([2,D,H,W] stack).

    On TPU the passes run as sublane Pallas kernels with explicit layout
    management: the W-axis passes operate on one pre-transposed [D,W,H]
    copy of the horizontal arms instead of transposing arms per call.
    """
    from mystereomatching_tpu.ops import pallas_kernels as pk

    armL, armR, armU, armD = (arms_int[i] for i in range(4))

    def area_of(an, ap):
        return jnp.broadcast_to(
            (jnp.minimum(an, max_arm) + jnp.minimum(ap, max_arm) + 1
             ).astype(vol.dtype), vol.shape)

    if pk.tpu_backend():
        swap = lambda x: jnp.swapaxes(x, -1, -2)
        armLT, armRT = swap(armL), swap(armR)            # [D, W, H]
        h_, w_ = vol.shape[-2:]
        # fused second pass: the area channel is built IN-KERNEL from the
        # first-direction arm blocks (sublane_pass_area) instead of being
        # materialized + stacked — saves ~1.4 ms/vol of stack/broadcast
        # traffic at Teddy B=16 (profile_cbca_stage.py); falls back to
        # the stacked div_pair kernel when the 2-channel block would
        # overflow scoped VMEM (full-res D-streamed shapes)
        fused = (pk.sublane_pass_fits(2, h_, max_arm)
                 and pk.sublane_pass_fits(2, w_, max_arm)
                 and not os.environ.get("MYSM_CBCA_NO_FUSED_AREA"))
        armUT = armDT = None
        for it in range(iterations):
            if it % 2 == 0:                              # H-dir pass, then V
                volT = pk.sublane_pass_auto(swap(vol)[None], armLT, armRT,
                                            max_arm)[0]
                if fused:
                    vol = pk.sublane_pass_area(swap(volT), armL, armR,
                                               armU, armD, max_arm)
                else:
                    stacked = jnp.stack([swap(volT), area_of(armL, armR)])
                    vol = pk.sublane_pass_auto(stacked, armU, armD, max_arm,
                                               div_pair=True)[0]
            else:                                        # V-dir pass, then H
                v1 = pk.sublane_pass_auto(vol[None], armU, armD, max_arm)[0]
                if fused:
                    if armUT is None:
                        armUT, armDT = swap(armU), swap(armD)
                    vol = swap(pk.sublane_pass_area(swap(v1), armUT, armDT,
                                                    armLT, armRT, max_arm))
                else:
                    stackedT = pk.sublane_pass_auto(
                        swap(jnp.stack([v1, area_of(armU, armD)])),
                        armLT, armRT, max_arm, div_pair=True)
                    vol = swap(stackedT[0])
        return vol

    for it in range(iterations):
        p1, p2 = (((2, armL, armR), (1, armU, armD)) if it % 2 == 0 else
                  ((1, armU, armD), (2, armL, armR)))
        ax, an, ap = p1
        vol, area = arm_bounded_sum_with_area(vol, an, ap, axis=ax,
                                              max_arm=max_arm)
        ax, an, ap = p2
        stacked = jnp.stack([vol, area])
        stacked = arm_bounded_sum(stacked, an[None], ap[None], axis=ax + 1,
                                  max_arm=max_arm)
        vol = stacked[0] / jnp.maximum(stacked[1], 1.0)
    return vol


def cbca_nonintersect(vol: jnp.ndarray, arms: jnp.ndarray,
                      iterations: int = 2, max_arm: int = 34) -> jnp.ndarray:
    """CBCA variant with per-pixel (non-intersected) arms [4,H,W]
    (cbca_intersect=false path of cbca_core). Also the support-aggregation
    engine reused by region vote (cal_histogram_for_HV cpp:6830-6862)."""
    armL, armR, armU, armD = (arms[i][None] for i in range(4))
    for it in range(iterations):
        p1, p2 = (((2, armL, armR), (1, armU, armD)) if it % 2 == 0 else
                  ((1, armU, armD), (2, armL, armR)))
        ax, an, ap = p1
        vol, area = arm_bounded_sum_with_area(vol, an, ap, axis=ax,
                                              max_arm=max_arm)
        ax, an, ap = p2
        stacked = jnp.stack([vol, area])
        stacked = arm_bounded_sum(stacked, an[None], ap[None], axis=ax + 1,
                                  max_arm=max_arm)
        vol = stacked[0] / jnp.maximum(stacked[1], 1.0)
    return vol


def box_filter_volume(vol: jnp.ndarray, radius: int = 6) -> jnp.ndarray:
    """BF aggregation (cpp:1023-1043): normalized 2r x 2r box mean on each
    disparity slice (cv::boxFilter 12x12 -> window [-(r-1), r] per axis)."""
    from mystereomatching_tpu.ops.cost import _box_sum

    lo, hi = -(radius - 1), radius
    s = _box_sum(vol, radius, radius, lo, hi, lo, hi)
    ones = jnp.ones(vol.shape[-2:], vol.dtype)
    area = _box_sum(ones, radius, radius, lo, hi, lo, hi)
    return s / area


def aggregate(
    vol: jnp.ndarray,
    cfg: MatchConfig,
    image: jnp.ndarray,
    gray: jnp.ndarray,
    arms_int: Optional[jnp.ndarray] = None,
    other_image: Optional[jnp.ndarray] = None,
    lor: int = 0,
    tree=None,
) -> jnp.ndarray:
    """Aggregation dispatcher (cost-volume filtering stage of costCalculate).

    image/gray: the reference image of this volume (guide for GF/NL/AWS);
    other_image: the opposite view (AWS joint weights).
    arms_int: precomputed [4,D,H,W] intersected arms for CBCA.
    tree: optional precomputed RootedTree for NL/GFNL (host-build hybrid).
    """
    method = cfg.aggregation
    if method == "none":
        return vol
    if method == "cbca":
        assert arms_int is not None
        return cbca(vol, arms_int, cfg.cbca_iterations)
    if method == "bf":
        return box_filter_volume(vol, cfg.bf_radius)
    if method == "gf":
        from mystereomatching_tpu.ops.guided import guided_filter_volume

        guide = image if cfg.gf_color_guide else gray
        return guided_filter_volume(vol, guide, cfg.gf_radius, cfg.gf_eps)
    if method == "fif":
        from mystereomatching_tpu.ops.fif import fif_improve, fif

        fn = fif_improve if cfg.fif_improve else fif
        return fn(vol, image, sigma=cfg.fif_sigma, pn=cfg.fif_pn)
    if method == "nl":
        from mystereomatching_tpu.ops.nl import nl_aggregate

        cdt = (None if cfg.nl_filter_dtype == "float32"
               else cfg.nl_filter_dtype)
        return nl_aggregate(vol, image, sigma=cfg.nl_sigma, tree=tree,
                            compute_dtype=cdt, neighbors=cfg.nl_neighbors)
    if method == "gfnl":
        from mystereomatching_tpu.ops.nl import gfnl_aggregate

        return gfnl_aggregate(vol, image, gray, cfg, tree=tree)
    if method == "aws":
        from mystereomatching_tpu.ops.aws import aws_aggregate

        left_img = image if lor == 0 else other_image
        right_img = other_image if lor == 0 else image
        return aws_aggregate(vol, left_img, cfg, right_img, lor=lor)
    if method == "jbf":
        from mystereomatching_tpu.ops.aws import jbf_volume

        return jbf_volume(vol, image, cfg.jbf_radius, cfg.jbf_sigma_c,
                          cfg.jbf_sigma_s)
    raise ValueError(f"unknown aggregation {method!r}")
