"""Model presets, experiment runner, combiners, cross-scale fusion."""

import os

import numpy as np
import pytest


def test_registry_lists_and_validates():
    from mystereomatching_tpu import models

    names = models.list_models()
    assert "census_grad_cbca_sgm" in names
    assert "nl_tree_filter" in names
    for n in names:
        cfg = models.get_model(n, max_disp=15)
        assert cfg.num_disp == 16

    with pytest.raises(KeyError):
        models.get_model("nope")


def test_runner_synthetic_and_resume(tmp_path):
    from mystereomatching_tpu.runner import run_suite

    out = str(tmp_path)
    rows = run_suite("census_wta", synthetic=1, out_dir=out)
    assert len(rows) == 1
    assert "nonocc_bad" in rows[0]
    assert os.path.exists(os.path.join(out, "census_wta.csv"))
    assert os.path.exists(os.path.join(out, "synthetic0_disp.png"))
    # resume: same object is skipped
    rows2 = run_suite("census_wta", synthetic=1, out_dir=out)
    assert rows2 == []


def test_combiners():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops import combine

    r = np.random.default_rng(0)
    vm0 = jnp.asarray(r.random((4, 8, 10)), jnp.float32)
    vm1 = jnp.asarray(r.random((4, 8, 10)), jnp.float32)
    arms = jnp.asarray(r.integers(0, 12, (4, 8, 10)), jnp.int32)
    arms_int = jnp.asarray(r.integers(0, 6, (4, 4, 8, 10)), jnp.int32)

    assert np.all(np.asarray(combine.min_combine(vm0, vm1))
                  == np.minimum(np.asarray(vm0), np.asarray(vm1)))
    out = combine.exp_adaptive_fuse(vm0, vm1, arms, 13.0, 1.0)
    assert out.shape == vm0.shape and np.all(np.isfinite(np.asarray(out)))
    out = combine.combine2vm_pkr(vm0, vm1)
    assert out.shape == vm0.shape
    out = combine.combine2vm_arm_limit(vm0, vm1, arms, arm_limit=5)
    assert out.shape == vm0.shape
    out = combine.combine_cross_fw(vm0, vm1, arms_int, fw_type=4)
    # where arms tiny the result must be <= cross volume (min with FW)
    take = (np.asarray(arms_int[:4]).sum(0) < 8) \
        & ((np.asarray(arms_int[0]) + np.asarray(arms_int[1])) < 6) \
        & ((np.asarray(arms_int[2]) + np.asarray(arms_int[3])) < 6)
    got = np.asarray(out)
    assert np.all(got[take] <= np.asarray(vm0)[take] + 1e-6)


def test_tilted_arms_and_dir_sum():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import (
        cross_arms, TILT_DIRECTIONS, arm_bounded_sum_dir)

    r = np.random.default_rng(1)
    img = jnp.asarray(r.integers(0, 256, (12, 14, 3)), jnp.float32)
    t = cross_arms(img, 4, 8, 20, 6, 1, directions=TILT_DIRECTIONS)
    assert t.shape == (4, 12, 14)
    # corner pixel can't extend left-up
    assert int(t[0, 0, 0]) == 0

    x = jnp.zeros((12, 14), jnp.float32).at[6, 7].set(1.0)
    an = jnp.full((12, 14), 2, jnp.int32)
    ap = jnp.full((12, 14), 2, jnp.int32)
    s = np.asarray(arm_bounded_sum_dir(x, an, ap, step=(1, 1), max_arm=4))
    # diagonal neighbors of (6,7) along (1,1) within distance 2 see the 1
    assert s[6, 7] == 1 and s[5, 6] == 1 and s[4, 5] == 1 and s[3, 4] == 0
    assert s[7, 8] == 1 and s[8, 9] == 1 and s[9, 10] == 0


def test_cross_scale_solve_all():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.crossscale import solve_all, reg_inverse_weights

    r = np.random.default_rng(2)
    v0 = jnp.asarray(r.random((8, 16, 20)), jnp.float32)
    v1 = jnp.asarray(r.random((5, 8, 10)), jnp.float32)
    out = np.asarray(solve_all([v0, v1], 0.3))
    w = reg_inverse_weights(2, 0.3)
    # check one entry manually: (d,y,x)=(3,10,13) -> coarse (2,5,6)
    want = w[0] * float(v0[3, 10, 13]) + w[1] * float(v1[2, 5, 6])
    assert abs(out[3, 10, 13] - want) < 1e-5


def test_vmtop_select_and_methods():
    import jax.numpy as jnp
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.ops.vmtop import (
        select_top_costs, disp_from_top_method1, disp_from_top)

    r = np.random.default_rng(3)
    vol = jnp.asarray(r.random((6, 10, 12)), jnp.float32)
    d, c, n = select_top_costs(vol, 3, 1.5)
    assert d.shape == (3, 10, 12)
    base = np.asarray(vol)
    np.testing.assert_array_equal(np.asarray(d[0]), base.argmin(0))
    # second candidate is the second-smallest cost's disparity where counted
    assert np.all(np.asarray(c[1]) >= np.asarray(c[0]))

    out1 = disp_from_top_method1(d, n)
    assert out1.shape == (10, 12)

    cfg = default_config(max_disp=5)
    out0 = disp_from_top(vol, None, cfg, method=0)
    assert out0.shape == (10, 12)
    assert np.all(np.asarray(out0) >= 0) and np.all(np.asarray(out0) < 6)
