"""Named pipeline presets mirroring the reference's method zoo.

Cost strings (main_.cpp:15: censusGrad, BT, grad, TruncAD, ADCensusZNCC,
SSD, Census, ZNCC, S-D, AD-CBCA, ADCensus-CBCA, AWS, BF ...), aggregation
strings (main_.cpp:16: CBCA, ASW, GF, FIF, NL, BF, GFNL) and optimizers
(main_.cpp:17: sgm, so) become declarative presets. BASELINE.json's five
benchmark configurations are included by name.
"""

from __future__ import annotations

from typing import Callable, Dict

from mystereomatching_tpu.config import MatchConfig, default_config, fast_config

MODEL_REGISTRY: Dict[str, Callable[..., MatchConfig]] = {}


def register(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


@register("census_grad_cbca_sgm")
def _default(max_disp: int = 59, **kw) -> MatchConfig:
    """The reference's measured default (BASELINE.md)."""
    return default_config(max_disp=max_disp, **kw)


@register("ad_census_wta")
def _baseline1(max_disp: int = 15, **kw) -> MatchConfig:
    """BASELINE.json config 1: AD+census cost + WTA (Tsukuba D=16)."""
    base = dict(cost="ad_census", aggregation="none", optimization="wta",
                do_refine=False, do_lr_consis=False, compute_both_volumes=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("census_wta")
def _census_wta(max_disp: int = 15, **kw) -> MatchConfig:
    return fast_config(max_disp=max_disp, **kw)


@register("census_cbca_lrc")
def _baseline2(max_disp: int = 63, **kw) -> MatchConfig:
    """BASELINE.json config 2: census + CBCA + LR check (Teddy/Cones)."""
    base = dict(cost="census", aggregation="cbca", optimization="wta",
                do_refine=True, do_lr_consis=True, do_region_vote=False,
                do_proper_ipol=False, do_last_median=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("sgm8_full")
def _baseline3(max_disp: int = 59, **kw) -> MatchConfig:
    """BASELINE.json config 3: 8-path SGM + uniqueness + subpixel + median."""
    base = dict(cost="census_grad", aggregation="cbca", optimization="sgm",
                sgm_scan_num=8, uniq_check=True, sub_ipol=True,
                do_refine=True, do_subpixel=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("nl_tree_filter")
def _baseline4(max_disp: int = 59, **kw) -> MatchConfig:
    """BASELINE.json config 4: NL MST tree-filter aggregation pipeline.

    Single-volume like the reference's NL path: occlusions come from
    left/right maps of the SAME volume (qx_detect_occlusion_left_right,
    NL/qx_basic.cpp:603; cooperative WTA here) — one tree build instead
    of two."""
    base = dict(cost="ad_grad", aggregation="nl", optimization="wta",
                do_refine=True, do_lr_consis=True,
                compute_both_volumes=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("nl_8nr")
def _nl_8nr(max_disp: int = 59, **kw) -> MatchConfig:
    """nl_tree_filter with the reference's selectable 8-neighbor MST edge
    mode (init(..., nr_neighbor=8), qx_mst_kruskals_image.h:12,37 /
    qx_mst_compute_edges_8neighbor cpp:71-86)."""
    base = dict(cost="ad_grad", aggregation="nl", optimization="wta",
                do_refine=True, do_lr_consis=True,
                compute_both_volumes=False, nl_neighbors=8)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("nl_post")
def _nl_post(max_disp: int = 59, **kw) -> MatchConfig:
    """The standalone qx NL pipeline WITH non-local post-processing
    (qx_nonlocal_cost_aggregation::disparity(..., true), NL/qx_nonlocal_
    cost_aggregation.cpp:72-109): color+gradient cost, left+right MST tree
    filters, exact-agreement occlusion detect, |d-d_hat| rebuild, sigma/2
    re-filter, 5x5 ctmf medians between stages."""
    base = dict(cost="qx_ad_grad", aggregation="nl", optimization="wta",
                nl_post_process=True, compute_both_volumes=False,
                do_refine=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("nl_census_post")
def _nl_census_post(max_disp: int = 59, **kw) -> MatchConfig:
    """Same flow with the NL path's 80-bit 9x9 wraparound census cost
    (my_matching_cost_from_cencus, cpp:110-189, the USE_CENCUS alternative)."""
    base = dict(cost="qx_census", aggregation="nl", optimization="wta",
                nl_post_process=True, compute_both_volumes=False,
                do_refine=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("fullres_occfill")
def _baseline5(max_disp: int = 255, **kw) -> MatchConfig:
    """BASELINE.json config 5: full-res D<=256 with occlusion fill +
    ctmf-equivalent median post-processing."""
    base = dict(cost="census_grad", aggregation="cbca", optimization="sgm",
                do_refine=True, do_lr_consis=True, lrc_classify=True,
                do_region_vote=True, do_proper_ipol=True, do_bg_ipol=True,
                do_last_median=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("cbca_double")
def _cbca_double(max_disp: int = 59, **kw) -> MatchConfig:
    """Double-window CBCA (cbca_double_win, CBCA() cpp:4337-4357): CBCA at
    arm scales 0 and 1, merged by the smoothed max-arm mask combine2Vm_4
    (cpp:4273-4331, the active merge at cpp:4354)."""
    base = dict(cost="census_grad", aggregation="cbca", optimization="sgm",
                cbca_double_win=True, cbca_combine=4, do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("bt_so")
def _bt_so(max_disp: int = 59, **kw) -> MatchConfig:
    base = dict(cost="bt", aggregation="cbca", optimization="so",
                do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("ad_grad_gf")
def _adgrad_gf(max_disp: int = 59, **kw) -> MatchConfig:
    """AD+gradient cost with guided-filter aggregation (CostFilter-style)."""
    base = dict(cost="ad_grad", aggregation="gf", optimization="wta",
                do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("census_fif_sgm")
def _fif(max_disp: int = 59, **kw) -> MatchConfig:
    base = dict(cost="census_grad", aggregation="fif", optimization="sgm")
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("zncc_bf_wta")
def _zncc(max_disp: int = 59, **kw) -> MatchConfig:
    base = dict(cost="zncc", aggregation="bf", optimization="wta",
                do_refine=False, do_lr_consis=False, compute_both_volumes=False)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("aws_wta")
def _aws(max_disp: int = 59, **kw) -> MatchConfig:
    base = dict(cost="trunc_ad", aggregation="aws", optimization="wta",
                do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("gfnl_wta")
def _gfnl(max_disp: int = 59, **kw) -> MatchConfig:
    base = dict(cost="ad_grad", aggregation="gfnl", optimization="wta",
                do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


@register("census_cbca_vmtop")
def _vmtop(max_disp: int = 59, **kw) -> MatchConfig:
    """Top-K candidate voting decision (Do_vmTop path, cpp:1112-1126)."""
    base = dict(cost="census_grad", aggregation="cbca", optimization="sgm",
                do_vmtop=True, do_refine=True)
    base.update(kw)
    return MatchConfig(max_disp=max_disp, **base).validate()


def list_models():
    return sorted(MODEL_REGISTRY)


def get_model(name: str, max_disp: int = 59, **kw) -> MatchConfig:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    return MODEL_REGISTRY[name](max_disp=max_disp, **kw)


def build(name: str, max_disp: int = 59, **kw):
    """Jitted pipeline for a named preset."""
    from mystereomatching_tpu.pipeline import StereoPipeline

    return StereoPipeline(get_model(name, max_disp, **kw))
