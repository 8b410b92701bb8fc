"""Semantic tests for CBBI: component labeling vs BFS, fill rule vs a
per-pixel transcription of the 16-direction same-segment rule
(cpp:7694-7753). The reference's in-place raster sweep propagates fills
within a sweep; ours is Jacobi (snapshot per sweep) — the single-sweep
rule is identical, which is what the fill oracle pins down.
"""
import numpy as np

_DIR_X = (1, 1, 1, 0, 0, -1, -1, -1, 2, 2, 1, -1, -2, -2, -1, 1)
_DIR_Y = (0, -1, 1, -1, 1, -1, 1, 0, 1, -1, -2, -3, 1, 2, 2, 0)


def bfs_components(c_l, c_r, c_u, c_d):
    """Min-flat-index component labels by BFS over the same edges."""
    h, w = c_l.shape
    lab = -np.ones((h, w), np.int64)
    for v in range(h):
        for u in range(w):
            if lab[v, u] >= 0:
                continue
            comp = [(v, u)]
            lab[v, u] = v * w + u
            stack = [(v, u)]
            while stack:
                y, x = stack.pop()
                nbrs = []
                if x > 0 and c_l[y, x]:
                    nbrs.append((y, x - 1))
                if x < w - 1 and c_r[y, x]:
                    nbrs.append((y, x + 1))
                if y > 0 and c_u[y, x]:
                    nbrs.append((y - 1, x))
                if y < h - 1 and c_d[y, x]:
                    nbrs.append((y + 1, x))
                for ny, nx in nbrs:
                    if lab[ny, nx] < 0:
                        lab[ny, nx] = lab[v, u]
                        stack.append((ny, nx))
    return lab


def test_label_components_matches_bfs():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cbbi import label_components

    rng = np.random.default_rng(0)
    h, w = 20, 26
    # symmetric undirected edges, then derive the four directed masks
    er = rng.random((h, w - 1)) < 0.45        # (v,u)~(v,u+1)
    ed = rng.random((h - 1, w)) < 0.45        # (v,u)~(v+1,u)
    c_r = np.zeros((h, w), bool); c_r[:, :-1] = er
    c_l = np.zeros((h, w), bool); c_l[:, 1:] = er
    c_d = np.zeros((h, w), bool); c_d[:-1] = ed
    c_u = np.zeros((h, w), bool); c_u[1:] = ed

    ours = np.asarray(label_components(jnp.asarray(c_l), jnp.asarray(c_r),
                                       jnp.asarray(c_u), jnp.asarray(c_d)))
    exp = bfs_components(c_l, c_r, c_u, c_d)
    np.testing.assert_array_equal(ours, exp)


def test_fill_sweep_matches_oracle():
    import jax.numpy as jnp
    import mystereomatching_tpu.ops.cbbi as cbbi_mod

    rng = np.random.default_rng(1)
    h, w = 18, 22
    disp = rng.integers(0, 12, (h, w)).astype(np.int32)
    disp[rng.random((h, w)) < 0.4] = -16
    labels = rng.integers(0, 5, (h, w)).astype(np.int32)

    # one Jacobi sweep oracle: first direction (table order) whose
    # neighbor is in-image, same segment, and has disp > 0
    exp = disp.copy()
    for v in range(h):
        for u in range(w):
            if disp[v, u] >= 0:
                continue
            for k in range(16):
                nv, nu = v + _DIR_Y[k], u + _DIR_X[k]
                if not (0 <= nv < h and 0 <= nu < w):
                    continue
                if labels[nv, nu] == labels[v, u] and disp[nv, nu] > 0:
                    exp[v, u] = disp[nv, nu]
                    break

    # drive ONE sweep of the implementation with fixed labels
    import mystereomatching_tpu.ops.cbbi as m
    orig = m.segment_labels
    try:
        m.segment_labels = lambda img: jnp.asarray(labels)
        got = np.asarray(m.cbbi(jnp.asarray(disp), jnp.zeros((h, w, 3)),
                                None, n_sweeps=1))
    finally:
        m.segment_labels = orig
    np.testing.assert_array_equal(got, exp)
