"""Breadth coverage: SO variants, census variants, KITTI fill, cross-scale
pipeline, diagnostics, checkpoint, CBBI, DA."""

import numpy as np
import pytest


def _so_change_oracle(vol, image, ref_disp, pn2=1.2, pn3=3.6, thres=15):
    d_, h, w = vol.shape
    vm = vol.copy()
    trace = np.zeros((h, w, d_), np.int32)
    img = image.astype(np.float32)
    for v in range(h):
        for u in range(1, w):
            disc = np.mean(np.abs(img[v, u] - img[v, u - 1])) > thres
            s = 0.5 if disc else 1.0
            rd = min(max(int(ref_disp[v, u - 1]), 0), d_ - 1)
            pre = vm[:, v, u - 1]
            for d in range(d_):
                cands = [(pre[d], d)]
                if d > 0:
                    cands.append((pre[d - 1] + pn2 * s, d - 1))
                if d < d_ - 1:
                    cands.append((pre[d + 1] + pn2 * s, d + 1))
                cands.append((pre[rd] + pn3 * s, rd))
                if d - 2 >= 0:
                    cands.append((pre[d - 2] + 2.0, d - 2))
                if d + 2 < d_:
                    cands.append((pre[d + 2] + 2.0, d + 2))
                best_c, best_d = cands[0]
                for c, dd in cands[1:]:
                    if c < best_c:
                        best_c, best_d = c, dd
                vm[d, v, u] += best_c
                trace[v, u, d] = best_d
    out = np.zeros((h, w), np.int32)
    for v in range(h):
        dmin = int(np.argmin(vm[:, v, w - 1]))
        out[v, w - 1] = dmin
        for u in range(w - 1, 0, -1):
            dmin = trace[v, u, dmin]
            out[v, u - 1] = dmin
    return out


def test_so_change_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.ops.so import scanline_optimize_change

    r = np.random.default_rng(5)
    vol = (r.random((5, 8, 12)) * 4).astype(np.float32)
    img = r.integers(0, 256, (8, 12, 3)).astype(np.uint8)
    ref = r.integers(0, 5, (8, 12)).astype(np.int32)
    cfg = default_config(max_disp=4)
    got = np.asarray(scanline_optimize_change(
        jnp.asarray(vol), jnp.asarray(img, jnp.float32), jnp.asarray(ref), cfg))
    want = _so_change_oracle(vol, img, ref)
    np.testing.assert_array_equal(got, want)


def test_so_l2r_produces_valid_disparities(small_pair):
    import jax.numpy as jnp
    from mystereomatching_tpu import StereoPipeline
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.utils.metrics import evaluate

    p = small_pair
    cfg = MatchConfig(max_disp=p.max_disp, cost="census_grad",
                      aggregation="cbca", optimization="so",
                      do_refine=False, do_lr_consis=False,
                      compute_both_volumes=False).validate()
    out = StereoPipeline(cfg)(p.left, p.right)
    m = evaluate(out["disparity"], p.gt,
                 {"nonocc": np.asarray(p.masks["nonocc"])})
    assert float(m["nonocc_bad"]) < 0.2, m


@pytest.mark.parametrize("func", [0, 1, 2, 4, 5])
def test_census_variants_shapes(func):
    import jax.numpy as jnp
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.ops.cost import compute_cost_volume

    r = np.random.default_rng(6)
    img = jnp.asarray(r.integers(0, 256, (10, 14, 3)), jnp.float32)
    gray = jnp.asarray(r.integers(0, 256, (10, 14)), jnp.float32)
    cfg = MatchConfig(max_disp=4, cost="census", census_func=func,
                      census_rv=2, census_ru=2).validate()
    vol = compute_cost_volume(img, img, gray, gray, cfg, 0)
    assert vol.shape == (5, 10, 14)
    # identical images: zero cost at d=0 for center-compare variants
    if func in (0, 1, 2, 4):
        assert float(vol[0].min()) == 0.0


def test_kitti_background_fill():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import interpolate_background_kitti

    d = np.array([
        [5, -1, -1, 2, -1],
        [-1, -1, 7, -1, -1],
        [-1, -1, -1, -1, -1],
    ], np.int32)
    got = np.asarray(interpolate_background_kitti(jnp.asarray(d)))
    # row 0: run between 5 and 2 -> min=2; trailing -> extrapolate 2
    np.testing.assert_array_equal(got[0], [5, 2, 2, 2, 2])
    # row 1: edges extrapolate the single valid 7
    np.testing.assert_array_equal(got[1], [7, 7, 7, 7, 7])
    # row 2: empty row -> column extrapolation from above/below
    np.testing.assert_array_equal(got[2], got[1])


def test_cross_scale_pipeline_runs(small_pair):
    from mystereomatching_tpu import StereoPipeline
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.utils.metrics import evaluate

    p = small_pair
    cfg = default_config(max_disp=p.max_disp, pyramid_levels=2)
    out = StereoPipeline(cfg)(p.left, p.right)
    m = evaluate(out["disparity"], p.gt,
                 {"nonocc": np.asarray(p.masks["nonocc"])})
    assert float(m["nonocc_bad"]) < 0.15, m


def test_diagnostics_and_checkpoint(tmp_path):
    from mystereomatching_tpu.utils.diagnostics import (
        disp_change_image, interpolation_effect, draw_arms,
        assert_shard_consistent)
    from mystereomatching_tpu.utils.checkpoint import save_stage, load_stage

    r = np.random.default_rng(7)
    before = r.integers(-1, 5, (8, 10)).astype(np.int32)
    after = before.copy()
    after[before < 0] = 2
    gt = np.full((8, 10), 2.0, np.float32)
    img = disp_change_image(before, after, gt)
    assert img.shape == (8, 10, 3)
    eff = interpolation_effect(before, after, gt)
    assert eff["filled"] == int((before < 0).sum())
    assert eff["filled_correct"] == eff["filled"]

    arms = r.integers(0, 4, (4, 8, 10)).astype(np.int32)
    vis = draw_arms(r.integers(0, 255, (8, 10)).astype(np.uint8), arms, [(4, 5)])
    assert vis.shape == (8, 10, 3)

    assert_shard_consistent(before, before)
    with pytest.raises(AssertionError):
        assert_shard_consistent(before, after)

    f = save_stage(str(tmp_path), "stage1", {"disp": after})
    back = load_stage(str(tmp_path), "stage1")
    np.testing.assert_array_equal(back["disp"], after)


def test_cbbi_fills_within_segments():
    import jax.numpy as jnp
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.ops.cbbi import cbbi, segment_labels

    # two flat regions separated by a strong vertical edge
    img = np.zeros((20, 24, 3), np.uint8)
    img[:, :12] = 40
    img[:, 12:] = 220
    disp = np.full((20, 24), -1, np.int32)
    disp[:, :2] = 3   # valid seeds in the left segment
    disp[:, 22:] = 9  # valid seeds in the right segment
    cfg = default_config(max_disp=15)
    out = np.asarray(cbbi(jnp.asarray(disp), jnp.asarray(img, jnp.float32),
                          cfg, n_sweeps=16))
    # fills must not cross the segment boundary
    assert np.all(out[:, 3:10] != 9)
    assert np.all(out[:, 14:21] != 3)


def test_discontinuity_adjust_runs():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import discontinuity_adjust

    r = np.random.default_rng(8)
    disp = np.full((16, 20), 3, np.int32)
    disp[:, 10:] = 9
    vol = jnp.asarray(r.random((12, 16, 20)), jnp.float32)
    out = discontinuity_adjust(jnp.asarray(disp), vol)
    assert out.shape == (16, 20)


def test_jbf_aggregation_smooths_and_preserves_edges(rng):
    """JBF (JBF_STANDARD path, cpp:5738-5767): constant volume is a fixed
    point; noisy volume variance drops; guide edges limit cross-talk."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.aws import jbf_volume

    h, w, d = 24, 32, 6
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2:] = 200.0
    const = jnp.ones((d, h, w), jnp.float32) * 3.0
    out = jbf_volume(const, jnp.asarray(img), radius=3)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)

    noisy = jnp.asarray(rng.random((d, h, w)), jnp.float32)
    sm = np.asarray(jbf_volume(noisy, jnp.asarray(img), radius=3))
    assert sm.var() < np.asarray(noisy).var() * 0.5


def test_jbf_pipeline_runs(small_pair):
    import numpy as np

    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.pipeline import StereoPipeline

    cfg = default_config(max_disp=small_pair.max_disp, aggregation="jbf",
                         jbf_radius=4, do_refine=False, do_lr_consis=False,
                         compute_both_volumes=False)
    out = StereoPipeline(cfg)(small_pair.left, small_pair.right)
    d = np.asarray(out["disparity"])
    assert d.shape == small_pair.left.shape[:2]


def test_show_params_marks_overrides():
    from mystereomatching_tpu.config import default_config

    s = default_config(max_disp=15, aggregation="gf").show_params()
    assert "aggregation" in s and "*" in s


def test_save_and_top_diagnostics(tmp_path, rng):
    import jax.numpy as jnp

    from mystereomatching_tpu.utils import diagnostics as D

    vol = jnp.asarray(rng.random((8, 16, 20)), jnp.float32)
    img = D.save_from_vm(vol, str(tmp_path / "vm.png"))
    assert img.shape == (16, 20, 3)
    D.save_from_disp(rng.integers(-1, 8, (16, 20)), 8, str(tmp_path / "d.png"))

    cd = rng.integers(-1, 8, (16, 20, 3))
    gt = rng.integers(0, 8, (16, 20)).astype(np.float32)
    sig = D.sign_correct_from_top(cd, gt)
    assert set(np.unique(sig)) <= {0, 64, 128, 255}
    D.top_candidates_csv(str(tmp_path / "top.csv"), cd,
                         rng.random((16, 20, 3)), gt, stride=8)
    assert (tmp_path / "top.csv").read_text().count("\n") > 1


def test_middlebury_loader_roundtrip(tmp_path, small_pair):
    """End-to-end exercise of the Middlebury directory loader
    (main_.cpp:92-129 semantics): write a synthetic pair as a
    teddy-layout object dir (im2/im6/disp2 + nonocc mask), load it back,
    and check images, GT scaling (/coeff=4), and mask decoding."""
    import numpy as np
    from mystereomatching_tpu.data import load_middlebury_object
    from mystereomatching_tpu.utils.imio import imwrite

    p = small_pair
    d = tmp_path / "teddy"
    imwrite(str(d / "im2.png"), np.clip(p.left, 0, 255).astype(np.uint8))
    imwrite(str(d / "im6.png"), np.clip(p.right, 0, 255).astype(np.uint8))
    gt_png = np.clip(np.round(p.gt * 4), 0, 255).astype(np.uint8)
    imwrite(str(d / "disp2.png"), gt_png)
    mask = (p.masks["nonocc"].astype(np.uint8)) * 255
    imwrite(str(d / "nonocc.png"), mask)

    obj = load_middlebury_object(str(tmp_path), "teddy")
    assert obj.left.shape == p.left.shape and obj.left.shape[-1] == 3
    np.testing.assert_array_equal(
        obj.left, np.clip(p.left, 0, 255).astype(np.uint8))
    # GT comes back divided by the per-object scale factor
    np.testing.assert_allclose(obj.gt, gt_png.astype(np.float32) / 4.0)
    np.testing.assert_array_equal(obj.masks["nonocc"], p.masks["nonocc"])
    assert obj.max_disp == 59
