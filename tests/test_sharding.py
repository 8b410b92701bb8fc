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

    dense = np.asarray(sgm_ops.sgm(vol, left, 8, cfg.sgm_p1, cfg.sgm_p2,
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
