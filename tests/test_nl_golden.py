"""Golden test: NL disparity flow vs the reference binary.

tests/golden/*_nl_{nopost,post}.bin are disparity maps from the actual
qx_nonlocal_cost_aggregation::disparity(out, {false,true}) flow
(NL/qx_nonlocal_cost_aggregation.cpp:72-109; built and driven by
refbuild/nl_driver.cpp) on a deterministic injected cost volume
(scripts/export_nl_golden.py). This validates the full NL stack — MST
build (tie order), unnormalized two-pass tree filter, WTA, 5x5 ctmf
median, flip_corr_vol edge quirk, exact-agreement occlusion detection,
|d-d_hat| rebuild, and the sigma/2 re-filter — end to end.

The reference filters in float64; we filter in float32, so WTA argmins can
flip on near-ties. A small per-scene tie budget absorbs that; the post-
processed map must agree except at those flips.
"""
import os

import numpy as np
import pytest

from mystereomatching_tpu import data
from mystereomatching_tpu.ops import nl

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

SCENES = {
    "small_scale": dict(h=144, w=192, max_disp=23, seed=3),
    "tsukuba_scale": dict(h=288, w=384, max_disp=15, seed=1),
    # teddy scale — the scale the NL bench row quotes (VERDICT r2 item 7)
    "teddy_scale": dict(h=375, w=450, max_disp=59, seed=0),
    # adversarial: slanted planes + periodic + low texture (item 4)
    "adv_small": dict(h=144, w=192, max_disp=23, seed=3, adversarial=True),
}


def _make_pair(scene):
    kw = dict(SCENES[scene])
    gen = (data.make_adversarial_pair if kw.pop("adversarial", False)
           else data.make_synthetic_pair)
    return gen(name=scene, **kw)


def load_u8(path):
    with open(path, "rb") as f:
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        m = np.frombuffer(f.read(h * w), np.uint8).reshape(h, w)
    return m.astype(np.int32)


def make_nl_vol(pair, num_disp):
    gl = np.asarray(pair.left)[:, :, 1].astype(np.float32)
    gr = np.asarray(pair.right)[:, :, 1].astype(np.float32)
    h, w = gl.shape
    vol = np.empty((num_disp, h, w), np.float32)
    for d in range(num_disp):
        shifted = np.concatenate([np.repeat(gr[:, :1], d, 1), gr[:, :w - d]], 1)
        vol[d] = np.minimum(np.abs(gl - shifted), 30.0)
    return vol


def _run(scene, tie_budget):
    import jax.numpy as jnp

    params = SCENES[scene]
    pair = _make_pair(scene)
    vol = make_nl_vol(pair, params["max_disp"] + 1)

    ref_nopost = load_u8(os.path.join(GOLDEN, f"{scene}_nl_nopost.bin"))
    ref_post = load_u8(os.path.join(GOLDEN, f"{scene}_nl_post.bin"))

    d_post, d_nopost = nl.nl_disparity(
        jnp.asarray(vol), jnp.asarray(pair.left), jnp.asarray(pair.right),
        sigma=0.1, post_process=True)
    d_post, d_nopost = np.asarray(d_post), np.asarray(d_nopost)

    n_nopost = int((d_nopost != ref_nopost).sum())
    n_post = int((d_post != ref_post).sum())
    assert n_nopost <= tie_budget, f"nopost differs at {n_nopost} px"
    assert n_post <= tie_budget, f"post differs at {n_post} px"


def test_nl_disparity_matches_reference_small():
    _run("small_scale", tie_budget=8)


@pytest.mark.slow
def test_nl_disparity_matches_reference_tsukuba():
    _run("tsukuba_scale", tie_budget=16)


def _run_preset(scene, preset, mode, budget):
    """Full standalone NL presets vs the reference binary computing its OWN
    cost (nldriver adgrad/census modes): validates qx_ad_grad_volume /
    census_code_qx80 + the whole disparity flow together. census is
    bit-exact; adgrad has a documented ±1-gray divergence on C-double
    boundary triples (ops/cost._qx_gray), hence the small budget."""
    import jax.numpy as jnp

    from mystereomatching_tpu import pipeline
    from mystereomatching_tpu.models.presets import MODEL_REGISTRY

    params = SCENES[scene]
    pair = _make_pair(scene)
    cfg = MODEL_REGISTRY[preset](max_disp=params["max_disp"])
    out = pipeline.match_pair(jnp.asarray(pair.left), jnp.asarray(pair.right),
                              cfg)
    dn = np.asarray(out["disp_left_raw"])
    dp = np.asarray(out["disparity"]).astype(np.int32)
    rn = load_u8(os.path.join(GOLDEN, f"{scene}_{mode}_nl_nopost.bin"))
    rp = load_u8(os.path.join(GOLDEN, f"{scene}_{mode}_nl_post.bin"))
    n_n, n_p = int((dn != rn).sum()), int((dp != rp).sum())
    assert n_n <= budget, f"nopost differs at {n_n} px"
    assert n_p <= budget, f"post differs at {n_p} px"


def test_nl_post_preset_matches_reference():
    _run_preset("small_scale", "nl_post", "adgrad", budget=10)


def test_nl_census_post_preset_matches_reference():
    _run_preset("small_scale", "nl_census_post", "census", budget=0)


@pytest.mark.slow
def test_nl_post_preset_matches_reference_tsukuba():
    _run_preset("tsukuba_scale", "nl_post", "adgrad", budget=30)


@pytest.mark.slow
def test_nl_census_post_preset_matches_reference_tsukuba():
    _run_preset("tsukuba_scale", "nl_census_post", "census", budget=0)


# --- teddy scale + adversarial (VERDICT r2 items 4+7) ----------------------
# Measured flip counts when the fixtures were generated (2026-08-19, on the
# real chip): teddy injected-volume 0/0, teddy census 0/0 (BIT-identical),
# teddy adgrad 71 nopost / 1 post (the documented +-1-gray _qx_gray C-double
# boundary class — 71 of 168750 = 0.04%), adv_small injected 0/0,
# adv_small adgrad 3/3, adv_small census 0/0. Budgets: recorded counts x2
# (0 stays 0 — those paths are exact).


@pytest.mark.slow
def test_nl_disparity_matches_reference_teddy():
    _run("teddy_scale", tie_budget=0)


@pytest.mark.slow
def test_nl_post_preset_matches_reference_teddy():
    _run_preset("teddy_scale", "nl_post", "adgrad", budget=142)


@pytest.mark.slow
def test_nl_census_post_preset_matches_reference_teddy():
    _run_preset("teddy_scale", "nl_census_post", "census", budget=0)


def test_nl_disparity_matches_reference_adversarial():
    _run("adv_small", tie_budget=0)


def test_nl_post_preset_matches_reference_adversarial():
    _run_preset("adv_small", "nl_post", "adgrad", budget=6)


def test_nl_census_post_preset_matches_reference_adversarial():
    _run_preset("adv_small", "nl_census_post", "census", budget=0)
