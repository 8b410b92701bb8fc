"""MST + tree filter: Borůvka vs scipy Kruskal; doubling filter vs brute force."""

import numpy as np
import pytest


def _grid_graph(wr, wd):
    h, w = wr.shape[0], wr.shape[1] + 1
    edges = []
    for v in range(h):
        for u in range(w - 1):
            edges.append((v * w + u, v * w + u + 1, int(wr[v, u])))
    for u in range(w):
        for v in range(h - 1):
            edges.append((v * w + u, (v + 1) * w + u, int(wd[v, u])))
    return edges


def _kruskal_oracle(edges, n):
    """Kruskal with (weight, index) order — the reference's stable counting
    sort (qx_basic.h:76) + union-find scan."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    order = sorted(range(len(edges)), key=lambda i: (edges[i][2], i))
    for i in order:
        a, b, _ = edges[i]
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            chosen.append(i)
    return set(chosen)


@pytest.fixture(scope="module")
def weights():
    r = np.random.default_rng(17)
    h, w = 10, 13
    wr = r.integers(0, 40, (h, w - 1)).astype(np.int32)
    wd = r.integers(0, 40, (h - 1, w)).astype(np.int32)
    return wr, wd


def test_boruvka_weight_matches_kruskal(weights):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import boruvka_mst, _flatten_edges

    wr, wd = weights
    h, w = wr.shape[0], wr.shape[1] + 1
    got_mask = np.asarray(boruvka_mst(jnp.asarray(wr), jnp.asarray(wd)))
    eu, ev, ew = (np.asarray(x) for x in _flatten_edges(jnp.asarray(wr), jnp.asarray(wd)))

    edges = [(int(eu[i]), int(ev[i]), int(ew[i])) for i in range(len(eu))]
    want = _kruskal_oracle(edges, h * w)

    assert got_mask.sum() == h * w - 1, "MST must have N-1 edges"
    got_weight = sum(e[2] for i, e in enumerate(edges) if got_mask[i])
    want_weight = sum(edges[i][2] for i in want)
    assert got_weight == want_weight, "MST total weight must match Kruskal"


def test_rooted_tree_is_valid(weights):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import boruvka_mst, root_tree

    wr, wd = weights
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    mask = boruvka_mst(jnp.asarray(wr), jnp.asarray(wd))
    tree = root_tree(mask, jnp.asarray(wr), jnp.asarray(wd))
    par = np.asarray(tree.parent)

    assert par[0] == 0
    # every non-root node reaches the root (acyclic, connected)
    for v in range(n):
        seen = set()
        x = v
        while x != 0:
            assert x not in seen, f"cycle at {v}"
            seen.add(x)
            x = par[x]
    # parent edges are grid-adjacent
    for v in range(1, n):
        dv = abs(v // w - par[v] // w)
        du = abs(v % w - par[v] % w)
        assert dv + du == 1


def test_tree_filter_matches_bruteforce(weights):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import boruvka_mst, root_tree, tree_filter

    wr, wd = weights
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    sigma = 0.1
    mask = boruvka_mst(jnp.asarray(wr), jnp.asarray(wd))
    tree = root_tree(mask, jnp.asarray(wr), jnp.asarray(wd))
    par = np.asarray(tree.parent)
    wgt = np.asarray(tree.weight)

    r = np.random.default_rng(0)
    vals = r.random((n, 3)).astype(np.float32)

    got = np.asarray(tree_filter(tree, jnp.asarray(vals), sigma))

    # brute force: S(p) = sum_q prod(sim along path p..q) * C(q)
    sim = np.exp(-wgt / (255.0 * sigma))
    # build adjacency with per-edge sim (edge v<->par[v] has sim[v])
    adj = {i: [] for i in range(n)}
    for v in range(1, n):
        adj[v].append((par[v], sim[v]))
        adj[par[v]].append((v, sim[v]))

    want = np.zeros_like(vals)
    for p in range(n):
        # BFS accumulating path products
        stack = [(p, 1.0, -1)]
        while stack:
            q, wprod, prev = stack.pop()
            want[p] += wprod * vals[q]
            for nb, s in adj[q]:
                if nb != prev:
                    stack.append((nb, wprod * s, q))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nl_aggregate_smoke():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.nl import nl_aggregate

    r = np.random.default_rng(1)
    img = r.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    vol = r.random((4, 12, 16)).astype(np.float32)
    out = np.asarray(nl_aggregate(jnp.asarray(vol), jnp.asarray(img, jnp.float32)))
    assert out.shape == vol.shape
    assert np.all(np.isfinite(out))
    # filtering preserves the scale of a constant volume after normalization
    cvol = jnp.ones((2, 12, 16), jnp.float32) * 5.0
    cout = np.asarray(nl_aggregate(cvol, jnp.asarray(img, jnp.float32)))
    np.testing.assert_allclose(cout, 5.0, rtol=1e-4)


def test_host_tree_matches_device_tree(rng):
    """Hybrid host-C++ Kruskal build (nl.build_tree_host) produces the SAME
    rooted tree as the device Borůvka + Euler-tour path: both break weight
    ties by edge index, so the MST is identical, and parent/weight are
    determined by the tree + root."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.mst import build_tree
    from mystereomatching_tpu.ops.nl import build_tree_host

    img = jnp.asarray(rng.integers(0, 255, (23, 31, 3)), jnp.float32)
    dev = build_tree(img, prefilter=False)
    host = build_tree_host(img, prefilter=False)
    np.testing.assert_array_equal(np.asarray(dev.parent), np.asarray(host.parent))
    np.testing.assert_array_equal(np.asarray(dev.weight), np.asarray(host.weight))


def test_tree_filter_forest_bit_exact(rng):
    """Two trees laid side by side in one forest filter exactly as each
    tree alone (disjoint segment sums keep identical op order) — the
    basis for fusing the L/R filter stages of the NL flow."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import RootedTree, build_tree, tree_filter

    h, w, d = 12, 14, 7
    img_a = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    img_b = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    ta = build_tree(jnp.asarray(img_a))
    tb = build_tree(jnp.asarray(img_b))
    n = h * w
    va = jnp.asarray(rng.random((n, d)), jnp.float32)
    vb = jnp.asarray(rng.random((n, d)), jnp.float32)

    sep_a = tree_filter(ta, va, 0.1)
    sep_b = tree_filter(tb, vb, 0.1)

    forest = RootedTree(
        parent=jnp.concatenate([ta.parent, tb.parent + n]),
        weight=jnp.concatenate([ta.weight, tb.weight]),
        shape=(2 * h, w))
    both = tree_filter(forest, jnp.concatenate([va, vb]), 0.1)
    np.testing.assert_array_equal(np.asarray(both[:n]), np.asarray(sep_a))
    np.testing.assert_array_equal(np.asarray(both[n:]), np.asarray(sep_b))


def test_flip_corr_vol_matches_gather_form(rng):
    """Gather-free flip_corr_vol == the take_along_axis formulation
    (qx_stereo_flip_corr_vol border-replication quirk), incl. W < D."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.nl import flip_corr_vol
    from mystereomatching_tpu.ops.volume import flip_volume_lr

    for d_, h, w in ((7, 6, 20), (9, 5, 6)):
        vol = jnp.asarray(rng.random((d_, h, w)), jnp.float32)
        vr = flip_volume_lr(vol)
        d_idx = jnp.arange(d_, dtype=jnp.int32)[:, None, None]
        d_max = (w - 1) - jnp.arange(w, dtype=jnp.int32)[None, None, :]
        d_eff = jnp.minimum(d_idx, jnp.maximum(d_max, 0))
        want = jnp.take_along_axis(
            vr, jnp.broadcast_to(d_eff, (d_, h, w)), 0)
        got = flip_corr_vol(vol)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tree_filter_bf16_fast_mode():
    """nl_filter_dtype="bfloat16" (the documented-approximate NL fast
    mode): peel phases filter in bf16, the tree build and compacted core
    stay exact. Measured on the 96x128 oracle scene: bad-1.0 0.0438 (f32)
    vs 0.0439 (bf16), 0.22% disparity flips."""
    import jax.numpy as jnp
    import numpy as np

    from mystereomatching_tpu import models
    from mystereomatching_tpu.data import make_synthetic_pair
    from mystereomatching_tpu.pipeline import match_pair

    p = make_synthetic_pair(h=64, w=96, max_disp=11, seed=2)
    f32 = models.get_model("nl_tree_filter", max_disp=11)
    b16 = models.get_model("nl_tree_filter", max_disp=11,
                           nl_filter_dtype="bfloat16")
    d32 = np.asarray(match_pair(p.left, p.right, f32)["disparity"])
    d16 = np.asarray(match_pair(p.left, p.right, b16)["disparity"])
    assert np.isfinite(d16).all()
    assert (d32 != d16).mean() < 0.02, "bf16 filter diverged"


def test_boruvka8_weight_matches_kruskal(weights):
    """8-neighbor mode (qx_mst_compute_edges_8neighbor cpp:71-86): device
    Borůvka total weight == Kruskal with the reference's edge enumeration
    and (weight, index) tie order."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.mst import boruvka_mst8, _flatten_edges8

    wr, wd = weights
    h, w = wr.shape[0], wr.shape[1] + 1
    r = np.random.default_rng(23)
    wdr = r.integers(0, 40, (h - 1, w - 1)).astype(np.int32)
    wdl = r.integers(0, 40, (h - 1, w - 1)).astype(np.int32)
    args = tuple(jnp.asarray(x) for x in (wr, wd, wdr, wdl))
    got_mask = np.asarray(boruvka_mst8(*args))
    eu, ev, ew = (np.asarray(x) for x in _flatten_edges8(*args))
    edges = [(int(eu[i]), int(ev[i]), int(ew[i])) for i in range(len(eu))]
    want = _kruskal_oracle(edges, h * w)
    assert got_mask.sum() == h * w - 1
    got_weight = sum(e[2] for i, e in enumerate(edges) if got_mask[i])
    want_weight = sum(edges[i][2] for i in want)
    assert got_weight == want_weight
    # with distinct (weight, index) keys the MST is unique edge-by-edge
    assert set(np.flatnonzero(got_mask)) == want


def test_host_tree_matches_device_tree_8nr(rng):
    """nr_neighbor=8: host C++ Kruskal build == device Borůvka + Euler
    rooting, parent and weight arrays bit-equal."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.mst import build_tree
    from mystereomatching_tpu.ops.nl import build_tree_host

    img = jnp.asarray(rng.integers(0, 255, (19, 27, 3)), jnp.float32)
    dev = build_tree(img, prefilter=False, neighbors=8)
    host = build_tree_host(img, prefilter=False, neighbors=8)
    np.testing.assert_array_equal(np.asarray(dev.parent),
                                  np.asarray(host.parent))
    np.testing.assert_array_equal(np.asarray(dev.weight),
                                  np.asarray(host.weight))
    # diagonal edges actually selectable: some parent is a diagonal neighbor
    par = np.asarray(dev.parent)
    w = 27
    deltas = np.abs(par - np.arange(par.shape[0]))
    assert np.any((deltas == w - 1) | (deltas == w + 1)), \
        "8-neighbor tree never used a diagonal edge"


def test_nl_8nr_pipeline_smoke(rng):
    """nl_8nr preset end-to-end; 8-neighbor tree filter stays finite and
    normalization-exact on a constant volume."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.nl import nl_aggregate

    img = jnp.asarray(rng.integers(0, 256, (14, 18, 3)), jnp.float32)
    cvol = jnp.ones((3, 14, 18), jnp.float32) * 4.0
    out = np.asarray(nl_aggregate(cvol, img, neighbors=8))
    np.testing.assert_allclose(out, 4.0, rtol=1e-4)

    from mystereomatching_tpu import models
    from mystereomatching_tpu.data import make_synthetic_pair
    from mystereomatching_tpu.pipeline import match_pair

    p = make_synthetic_pair(h=48, w=64, max_disp=7, seed=3)
    cfg = models.get_model("nl_8nr", max_disp=7)
    d = np.asarray(match_pair(p.left, p.right, cfg)["disparity"])
    assert np.isfinite(d).all()
