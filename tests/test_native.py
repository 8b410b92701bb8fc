"""Native C++ host runtime vs the JAX device path (cross-validation)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from mystereomatching_tpu import native as nat

    try:
        nat._load()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")
    return nat


def test_median3x3_matches_numpy(native):
    r = np.random.default_rng(0)
    img = r.integers(0, 256, (20, 30), np.uint8)
    got = native.median3x3(img)
    pad = np.pad(img, 1, mode="edge")
    want = np.empty_like(img)
    for v in range(20):
        for u in range(30):
            want[v, u] = np.median(pad[v:v + 3, u:u + 3])
    np.testing.assert_array_equal(got, want)


def test_median_hist_matches_bruteforce(native):
    r = np.random.default_rng(1)
    img = r.integers(0, 256, (18, 25), np.uint8)
    rad = 4
    got = native.median_hist(img, rad)
    for v in (0, 7, 17):
        for u in (0, 11, 24):
            v0, v1 = max(0, v - rad), min(18, v + rad + 1)
            u0, u1 = max(0, u - rad), min(25, u + rad + 1)
            win = np.sort(img[v0:v1, u0:u1].ravel())
            want = win[(len(win) + 1) // 2 - 1]
            assert got[v, u] == want, (v, u)


def test_native_mst_weight_matches_jax_boruvka(native):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import (boruvka_mst, grid_edge_weights,
                                              _flatten_edges)

    r = np.random.default_rng(2)
    img = r.integers(0, 256, (12, 16, 3), np.uint8)
    wr, wd = grid_edge_weights(jnp.asarray(img, jnp.float32), prefilter=False)
    mask = np.asarray(boruvka_mst(wr, wd))
    _, _, ew = (np.asarray(x) for x in _flatten_edges(wr, wd))
    jax_total = int(ew[mask].sum())

    parent, weight, order = native.mst_grid(img)
    native_total = int(weight.sum())
    assert native_total == jax_total

    # rooted tree validity
    n = 12 * 16
    assert parent[order[0]] == order[0] == 0
    seen = np.zeros(n, bool)
    seen[0] = True
    for x in order[1:]:
        assert seen[parent[x]], "order must put parents before children"
        seen[x] = True
    assert seen.all()


def test_native_tree_filter_matches_jax(native):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import RootedTree, tree_filter as jax_tf

    r = np.random.default_rng(3)
    img = r.integers(0, 256, (10, 12, 3), np.uint8)
    parent, weight, order = native.mst_grid(img)
    vals = r.random((120, 4)).astype(np.float32)

    got_native = native.tree_filter(parent, weight, order, vals, 0.1)
    tree = RootedTree(parent=jnp.asarray(parent), weight=jnp.asarray(weight),
                      shape=(10, 12))
    got_jax = np.asarray(jax_tf(tree, jnp.asarray(vals), 0.1))
    np.testing.assert_allclose(got_native, got_jax, rtol=1e-4, atol=1e-4)


def test_host_nl_aggregate_smoke(native):
    r = np.random.default_rng(4)
    img = r.integers(0, 256, (14, 18, 3), np.uint8)
    vol = r.random((5, 14, 18)).astype(np.float32)
    out = native.nl_aggregate_host(vol, img)
    assert out.shape == vol.shape
    const = native.nl_aggregate_host(np.full((2, 14, 18), 3.0, np.float32), img)
    np.testing.assert_allclose(const, 3.0, rtol=1e-5)
