"""Distributed tests: sharded pipeline == dense pipeline (SURVEY.md §4c).

Runs on the 8-virtual-CPU-device topology from conftest. The row-sharded
pipeline (halo exchange + wavefront vertical SGM) must reproduce the dense
single-device result at disparity level.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.sharding


def _small_cfg():
    from mystereomatching_tpu.config import default_config

    # arm/halo sizes scaled so each row band (H/4) still covers the halo
    return default_config(
        max_disp=7,
        census_rv=2, census_ru=3,
        cbca_cross_l=3, cbca_cross_l_out=5, cbca_iterations=2,
        pi_search_depth=4,
        rv_s_thres=4,
    )


@pytest.fixture(scope="module")
def pair():
    from mystereomatching_tpu.data import make_synthetic_pair

    return make_synthetic_pair(h=96, w=64, max_disp=7, seed=5)


def test_sharded_equals_dense(pair):
    import jax
    import jax.numpy as jnp
    from mystereomatching_tpu.pipeline import match_pair
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import sharded_match_pair

    cfg = _small_cfg()
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)

    dense = np.asarray(match_pair(left, right, cfg)["disparity"])

    mesh = make_mesh(n_row=4, n_data=2)
    lb = jnp.stack([left, left])
    rb = jnp.stack([right, right])
    sharded = np.asarray(sharded_match_pair(lb, rb, cfg, mesh, n_chunks=4))

    # disparity-level equality, bit-exact (round-1's 1% tolerance was
    # root-caused to cross_arms on halo-extended bands ignoring the true
    # picture borders — fixed by _true_border_arm_clamp)
    for b in range(2):
        mism = np.mean(sharded[b] != dense)
        assert mism == 0.0, f"batch {b}: {mism:.4f} mismatching pixels"


def test_sharded_wta_only_exact(pair):
    import jax.numpy as jnp
    from mystereomatching_tpu.config import fast_config
    from mystereomatching_tpu.pipeline import match_pair
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import sharded_match_pair

    cfg = fast_config(max_disp=7, census_rv=2, census_ru=3)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    dense = np.asarray(match_pair(left, right, cfg)["disparity"])

    mesh = make_mesh(n_row=8, n_data=1)
    sharded = np.asarray(sharded_match_pair(left[None], right[None], cfg,
                                            mesh, n_chunks=2))[0]
    np.testing.assert_array_equal(sharded, dense)


def test_sharded_sgm8_exact(pair):
    """All 8 SGM directions across row bands (vertical + diagonal
    wavefronts) must be bit-identical to the dense scans."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.ops import sgm as sgm_ops
    from mystereomatching_tpu.ops import cost as cost_ops
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel import sharded as sh
    from mystereomatching_tpu.pipeline import to_gray

    cfg = default_config(max_disp=7, sgm_scan_num=8)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    gl, gr = to_gray(left), to_gray(right)
    vol = cost_ops.compute_cost_volume(left, right, gl, gr,
                                       cfg.replace(cost="census"), 0)

    dense = np.asarray(sgm_ops.sgm(vol, left, 8, cfg.sgm_p1_eff, cfg.sgm_p2_eff,
                                   cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff))

    mesh = make_mesh(n_row=4, n_data=1)
    body = functools.partial(sh._sgm_sharded, cfg=cfg, n_chunks=4)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(None, "row", None), P("row", None, None)),
                   out_specs=P(None, "row", None))
    with mesh:
        got = np.asarray(fn(vol, left))
    np.testing.assert_array_equal(got, dense)


def test_dshard_equals_dense(pair):
    """Disparity-block parallelism: mesh ('data','row','disp') with the
    volume stage sharded over D must reproduce the dense disparity
    bit-exactly."""
    import jax.numpy as jnp
    from mystereomatching_tpu.pipeline import match_pair
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import sharded_match_pair

    cfg = _small_cfg()
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    dense = np.asarray(match_pair(left, right, cfg)["disparity"])

    mesh = make_mesh(n_row=2, n_data=2, n_disp=2)
    lb = jnp.stack([left, left])
    rb = jnp.stack([right, right])
    sharded = np.asarray(sharded_match_pair(lb, rb, cfg, mesh, n_chunks=2))
    for b in range(2):
        np.testing.assert_array_equal(sharded[b], dense)


def test_dryrun_entrypoints():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out["disparity"].shape == args[0].shape[:2]


def _assert_sharded_matches_dense(pair, cfg, n_row=4, n_chunks=4,
                                  float_atol=0.0):
    import jax.numpy as jnp
    from mystereomatching_tpu.pipeline import match_pair
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import sharded_match_pair

    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    dense = np.asarray(match_pair(left, right, cfg)["disparity"])
    mesh = make_mesh(n_row=n_row, n_data=1)
    sharded = np.asarray(sharded_match_pair(left[None], right[None], cfg,
                                            mesh, n_chunks=n_chunks))[0]
    if float_atol:
        np.testing.assert_allclose(sharded, dense, atol=float_atol, rtol=0)
    else:
        np.testing.assert_array_equal(sharded, dense)


def test_sharded_sgm8_full_preset(pair):
    """The ACTUAL sgm8_full benchmark preset (8-dir SGM + uniqueness +
    decision-time subpixel + subpixel enhancement) vs dense — no
    MatchConfig flag may silently change meaning between paths.

    The float SUBPIXEL map carries a documented ulp-level tolerance: the
    band pipeline's CBCA prefix sums accumulate from the band origin, not
    image row 0, so cancellation in the arm-bounded differences lands on
    different last bits; integer disparities are unaffected (the
    bit-exact integer suites above), but the quadratic fit's offsets
    inherit ~1e-6. Same class as any resharded-reduction float drift."""
    from mystereomatching_tpu import models

    cfg = models.get_model(
        "sgm8_full", max_disp=7, census_rv=2, census_ru=3,
        cbca_cross_l=3, cbca_cross_l_out=5, pi_search_depth=4, rv_s_thres=4)
    _assert_sharded_matches_dense(pair, cfg, float_atol=1e-4)
    # the underlying integer decisions must still agree exactly
    cfg_int = cfg.replace(do_subpixel=False, sub_ipol=False)
    _assert_sharded_matches_dense(pair, cfg_int)


def test_sharded_fullres_occfill_preset(pair):
    """The ACTUAL fullres_occfill preset (classifying LRC + region vote +
    proper interpolation + BG fill + median) bit-exact vs dense."""
    from mystereomatching_tpu import models

    cfg = models.get_model(
        "fullres_occfill", max_disp=7, census_rv=2, census_ru=3,
        cbca_cross_l=3, cbca_cross_l_out=5, pi_search_depth=4, rv_s_thres=4)
    _assert_sharded_matches_dense(pair, cfg)


def test_sharded_full_refine_flags(pair):
    """Every remaining sharded-supported refine stage at once: PKR,
    weighted median, discontinuity adjustment (global-equalized Canny via
    all_gather), fillSurronding, whole-image region vote — bit-exact."""
    from mystereomatching_tpu.config import default_config

    cfg = default_config(
        max_disp=7, census_rv=2, census_ru=3,
        cbca_cross_l=3, cbca_cross_l_out=5, pi_search_depth=4, rv_s_thres=4,
        do_pkr=True, do_wm=True, do_da=True, do_fill_surrounding=True,
        do_rv_whole_image=True, do_bg_ipol=True, wm_win=5)
    _assert_sharded_matches_dense(pair, cfg)


def test_sharded_unsupported_flags_raise(pair):
    """Unsupported combinations must refuse loudly, never silently drop."""
    import jax.numpy as jnp
    from mystereomatching_tpu.config import default_config
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import (
        check_sharded_support, sharded_match_pair)

    base = default_config(max_disp=7, census_rv=2, census_ru=3,
                          cbca_cross_l=3, cbca_cross_l_out=5)
    bad = [base.replace(do_cbbi=True),
           base.replace(nl_post_process=True),
           base.replace(d_stream_block=4)]
    for cfg in bad:
        with pytest.raises(NotImplementedError):
            check_sharded_support(cfg)
    mesh = make_mesh(n_row=4, n_data=1)
    left = jnp.asarray(pair.left, jnp.float32)[None]
    with pytest.raises(NotImplementedError):
        sharded_match_pair(left, left, bad[0], mesh)


def test_sharded_so_exact(pair):
    """SO optimization (cpp:6272-6416) is row-local DP — bit-exact."""
    cfg = _small_cfg().replace(optimization="so")
    _assert_sharded_matches_dense(pair, cfg)


@pytest.mark.parametrize("method", [0, 1, 2])
def test_sharded_vmtop_exact(pair, method):
    """vmTop (cpp:1514-1885): method 0's Jacobi vote runs on an
    n_iters-row candidate halo; methods 1/2 are row scans."""
    cfg = _small_cfg().replace(do_vmtop=True, vmtop_method=method,
                               vmtop_num=3)
    _assert_sharded_matches_dense(pair, cfg)


@pytest.mark.parametrize("itype,rvt,bgdir", [(2, 0, 2), (3, 1, 2),
                                             (0, 2, 2), (2, 0, 4)])
def test_sharded_rv_combine_bg(pair, itype, rvt, bgdir):
    """RV_combine_BG (cpp:7146-7216) incl. the tilted-arm vote
    (cpp:6864-6911) and 2-/4-direction BG fills."""
    cfg = _small_cfg().replace(
        rv_use_combine_bg=True, interpolate_type=itype, reg_vote_type=rvt,
        bg_ip_dir=bgdir, lrc_classify=True)
    _assert_sharded_matches_dense(pair, cfg)


def test_sharded_kitti_bg(pair):
    """KITTI background fill (cpp:5864-5948): gathered-map stage."""
    cfg = _small_cfg().replace(do_bg_ipol=True, bg_ipol_kitti=True,
                               lrc_classify=True)
    _assert_sharded_matches_dense(pair, cfg)


@pytest.mark.parametrize("comb", [2, 4])
def test_sharded_double_window(pair, comb):
    """Double-window CBCA + combine2Vm (cpp:4142-4331) on row bands."""
    cfg = _small_cfg().replace(
        cbca_double_win=True, cbca_combine=comb,
        cbca_cross_ls=(3, 4, 5), cbca_cross_l_outs=(5, 6, 7),
        cbca_c_threshes=(20, 30, 30), cbca_c_thresh_outs=(6, 0, 0))
    _assert_sharded_matches_dense(pair, cfg)


def test_sharded_crossscale(pair):
    """Cross-scale SolveAll (cpp:2142-2208): local finest band fused with
    replicated coarse levels at global row indices."""
    cfg = _small_cfg().replace(pyramid_levels=2)
    _assert_sharded_matches_dense(pair, cfg)


@pytest.mark.parametrize("agg,extra", [
    ("gf", dict(gf_color_guide=True, gf_radius=3)),
    ("gf", dict(gf_color_guide=False, gf_radius=3)),
    ("jbf", dict(jbf_radius=3)),
    ("aws", dict(aws_win=3)),
    ("fif", dict(fif_improve=True)),
    ("fif", dict(fif_improve=False)),
    ("nl", dict()),
    ("gfnl", dict(gf_radius=3)),
])
def test_sharded_aggregation_family_exact(pair, agg, extra):
    """Round-5 port (VERDICT r4 item 7): GF gray+color (cpp:4404-4539),
    JBF (cpp:5738-5767), AWS (cpp:5692-5801), FIF + FIF_Improve
    (cpp:4541-4890), NL (cpp:4892-4917) and GFNL (cpp:4421-4490) on row
    bands. All but FIF_Improve re-shard H-bands -> D-blocks (all_to_all)
    and run the dense op per block (per-disparity-slice independence =>
    bit-exact); FIF_Improve's ±1-disparity min-plus recursion instead
    wavefronts its V pass across bands like vertical SGM."""
    cfg = _small_cfg().replace(aggregation=agg, **extra)
    _assert_sharded_matches_dense(pair, cfg)
