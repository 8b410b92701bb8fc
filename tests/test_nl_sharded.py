"""Multi-chip NL: D-sharded filter + distributed Borůvka == dense NL."""
import numpy as np
import pytest


def test_qx_right_volume_equals_flip():
    """Direct lor=1 build == qx_stereo_flip_corr_vol of the left volume
    (the clamp identity, ops/cost.qx_ad_grad_volume docstring)."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import qx_ad_grad_volume
    from mystereomatching_tpu.ops.nl import flip_corr_vol

    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 256, (14, 18, 3)).astype(np.float32))
    r = jnp.asarray(rng.integers(0, 256, (14, 18, 3)).astype(np.float32))
    vl = qx_ad_grad_volume(l, r, 8, 0)
    direct = qx_ad_grad_volume(l, r, 8, 1)
    np.testing.assert_array_equal(np.asarray(direct),
                                  np.asarray(flip_corr_vol(vl)))


def test_qx_volume_block_matches_dense():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import qx_ad_grad_volume

    rng = np.random.default_rng(1)
    l = jnp.asarray(rng.integers(0, 256, (10, 16, 3)).astype(np.float32))
    r = jnp.asarray(rng.integers(0, 256, (10, 16, 3)).astype(np.float32))
    full = np.asarray(qx_ad_grad_volume(l, r, 8, 0))
    blk = np.asarray(qx_ad_grad_volume(l, r, 8, 0,
                                       disps=jnp.arange(2, 6)))
    np.testing.assert_array_equal(full[2:6], blk)


@pytest.mark.sharding
@pytest.mark.parametrize("host_trees", [False, True])
def test_nl_dshard_equals_dense(host_trees):
    import jax.numpy as jnp
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.data import make_synthetic_pair
    from mystereomatching_tpu.ops import nl as nl_ops
    from mystereomatching_tpu.ops.cost import qx_ad_grad_volume
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.nl_sharded import nl_disparity_dshard

    # h divisible by 8 so the distributed Boruvka rounds shard evenly
    p = make_synthetic_pair(h=48, w=40, max_disp=7, seed=2)
    cfg = MatchConfig(max_disp=7, aggregation="nl", cost="qx_ad_grad",
                      nl_post_process=True).validate()
    left = jnp.asarray(p.left, jnp.float32)
    right = jnp.asarray(p.right, jnp.float32)

    trees = None
    if host_trees:
        trees = (nl_ops.build_tree_host(p.left), nl_ops.build_tree_host(p.right))

    vol = qx_ad_grad_volume(left, right, cfg.num_disp, 0)
    dense, _ = nl_ops.nl_disparity(vol, left, right, cfg.nl_sigma,
                                   post_process=True, trees=trees)

    mesh = make_mesh(n_row=1, n_data=1, n_disp=8)
    got = nl_disparity_dshard(left, right, cfg, mesh, trees=trees)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(dense))
