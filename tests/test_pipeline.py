"""Golden-pipeline tests on synthetic stereo pairs (SURVEY.md §4b)."""

import numpy as np
import pytest


def test_fast_config_quality(small_pair):
    """Config 1 (BASELINE.json): census + WTA must solve an easy synthetic
    scene reasonably well on non-occluded pixels."""
    from mystereomatching_tpu import StereoPipeline
    from mystereomatching_tpu.config import fast_config
    from mystereomatching_tpu.utils.metrics import evaluate

    p = small_pair
    pipe = StereoPipeline(fast_config(max_disp=p.max_disp))
    out = pipe(p.left, p.right)
    m = evaluate(out["disparity"], p.gt,
                 {"nonocc": np.asarray(p.masks["nonocc"])}, thresh=1.0)
    assert float(m["nonocc_bad"]) < 0.25, f"bad-1.0 too high: {m}"


def test_default_config_quality(small_pair):
    """Default pipeline (censusGrad+CBCA+SGM+refine) must beat plain WTA."""
    from mystereomatching_tpu import StereoPipeline
    from mystereomatching_tpu.config import default_config, fast_config
    from mystereomatching_tpu.utils.metrics import evaluate

    p = small_pair
    pipe = StereoPipeline(default_config(max_disp=p.max_disp))
    out = pipe(p.left, p.right)
    m = evaluate(out["disparity"], p.gt,
                 {"nonocc": np.asarray(p.masks["nonocc"])}, thresh=1.0)

    fast = StereoPipeline(fast_config(max_disp=p.max_disp))
    mf = evaluate(fast(p.left, p.right)["disparity"], p.gt,
                  {"nonocc": np.asarray(p.masks["nonocc"])}, thresh=1.0)

    assert float(m["nonocc_bad"]) < 0.15, f"default pipeline bad-1.0: {m}"
    assert float(m["nonocc_bad"]) <= float(mf["nonocc_bad"]) + 0.02


def test_pipeline_is_jittable_and_pure(small_pair):
    """Same input twice -> identical output (pure function under jit)."""
    from mystereomatching_tpu import StereoPipeline
    from mystereomatching_tpu.config import fast_config

    p = small_pair
    pipe = StereoPipeline(fast_config(max_disp=p.max_disp))
    a = np.asarray(pipe(p.left, p.right)["disparity"])
    b = np.asarray(pipe(p.left, p.right)["disparity"])
    np.testing.assert_array_equal(a, b)


def test_metrics_counts_invalid_as_errors():
    import jax.numpy as jnp
    from mystereomatching_tpu.utils.metrics import bad_pixel_stats

    gt = jnp.ones((4, 4)) * 5.0
    disp = jnp.full((4, 4), 5.0).at[0, 0].set(-1.0)  # one invalid
    bad, rms = bad_pixel_stats(disp, gt)
    assert abs(float(bad) - 1 / 16) < 1e-6


def test_bf16_volume_mode_close_to_f32(small_pair):
    """vol_dtype='bfloat16' (fast mode): disparity-level agreement with the
    f32 pipeline on all but near-tie pixels."""
    import numpy as np

    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.pipeline import StereoPipeline

    cfg32 = default_config(max_disp=small_pair.max_disp)
    cfg16 = cfg32.replace(vol_dtype="bfloat16")
    d32 = np.asarray(StereoPipeline(cfg32)(small_pair.left, small_pair.right)["disparity"])
    d16 = np.asarray(StereoPipeline(cfg16)(small_pair.left, small_pair.right)["disparity"])
    assert np.mean(d16 != d32) < 0.02


def test_cooperative_wta_single_volume_lrc(small_pair):
    """compute_both_volumes=False + LRC: the right map comes from the left
    volume (wta_Co cpp:2709-2792); quality stays close to the 2-volume
    pipeline."""
    import numpy as np

    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.pipeline import StereoPipeline

    cfg2 = default_config(max_disp=small_pair.max_disp)
    cfg1 = cfg2.replace(compute_both_volumes=False)
    d2 = np.asarray(StereoPipeline(cfg2)(small_pair.left, small_pair.right)["disparity"])
    d1 = np.asarray(StereoPipeline(cfg1)(small_pair.left, small_pair.right)["disparity"])
    gt, m = small_pair.gt, (small_pair.gt > 0) & small_pair.masks["nonocc"]

    def bad(d):
        return (((np.abs(d - gt) > 1) | (d < 0)) & m).sum() / m.sum()

    assert bad(d1) < bad(d2) + 0.03


def test_d_streamed_volume_matches_dense(small_pair):
    """d_stream_block builds cost+CBCA in disparity blocks
    (pipeline._volume_dstream, full-res HBM path) — disparity-exact vs the
    dense pipeline."""
    from mystereomatching_tpu.models.presets import get_model
    from mystereomatching_tpu.pipeline import StereoPipeline

    kw = dict(max_disp=small_pair.max_disp, compute_both_volumes=False)
    dense = get_model("fullres_occfill", **kw)
    streamed = dense.replace(d_stream_block=4)
    dd = np.asarray(StereoPipeline(dense)(small_pair.left, small_pair.right)["disparity"])
    ds = np.asarray(StereoPipeline(streamed)(small_pair.left, small_pair.right)["disparity"])
    np.testing.assert_array_equal(dd, ds)
