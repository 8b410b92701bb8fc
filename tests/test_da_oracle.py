"""Oracle test for discontinuity adjustment (discontinuityAdjust,
cpp:6057-6136): per-pixel transcription of the direction priority
(including the elided-horizontal quirk) and the asymmetric cost gates,
driven by an injected edge map (the Canny recipe itself is approximate —
see ops/canny.py). Snapshot semantics: the oracle reads the input map,
matching our Jacobi formulation (documented divergence from the
reference's in-place raster scan)."""
import numpy as np

_DIRS_H = (-1, 1, -1, 1, -1, 1, 0, 0)
_DIRS_W = (-1, 1, 0, 0, 1, -1, -1, 1)


def oracle_da(disp, vol, edges):
    h, w = disp.shape
    out = disp.copy()
    for v in range(1, h - 1):
        for u in range(1, w - 1):
            if not edges[v, u]:
                continue
            e = edges
            direction = -1
            if e[v - 1, u - 1] and e[v + 1, u + 1]:
                direction = 4
            elif e[v - 1, u + 1] and e[v + 1, u - 1]:
                direction = 0
            elif e[v - 1, u] or e[v - 1, u - 1] or e[v - 1, u + 1]:
                if e[v + 1, u] or e[v + 1, u - 1] or e[v + 1, u + 1]:
                    direction = 6
            else:
                if e[v - 1, u - 1] or e[v, u - 1] or e[v + 1, u - 1]:
                    if e[v - 1, u + 1] or e[v, u + 1] or e[v + 1, u + 1]:
                        direction = 2
            if direction == -1:
                continue
            dp = disp[v, u]
            if dp >= 0:
                cost = vol[dp, v, u]
                v1, u1 = v + _DIRS_H[direction], u + _DIRS_W[direction]
                v2 = v + _DIRS_H[direction + 1]
                u2 = u + _DIRS_W[direction + 1]
                d1, d2 = disp[v1, u1], disp[v2, u2]
                cost1 = vol[d1, v1, u1] if d1 >= 0 else -1.0
                cost2 = vol[d2, v2, u2] if d2 >= 0 else -1.0
                if cost1 >= 0 and cost1 < cost:
                    dp, cost = d1, cost1
                if cost2 != -1 and cost2 < cost:
                    dp = d2
            out[v, u] = dp
    return out


def test_da_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import discontinuity_adjust

    rng = np.random.default_rng(0)
    h, w, d = 20, 24, 8
    disp = rng.integers(0, d, (h, w)).astype(np.int32)
    disp[rng.random((h, w)) < 0.15] = -16
    vol = rng.random((d, h, w)).astype(np.float32)
    edges = rng.random((h, w)) < 0.3

    ours = np.asarray(discontinuity_adjust(jnp.asarray(disp),
                                           jnp.asarray(vol),
                                           edges=jnp.asarray(edges)))
    exp = oracle_da(disp, vol, edges)
    np.testing.assert_array_equal(ours, exp)


def test_da_negative_cost_gates():
    """The >=0 / !=-1 asymmetry: negative costs skipped as d1, taken as d2."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import discontinuity_adjust

    rng = np.random.default_rng(1)
    h, w, d = 12, 14, 5
    disp = rng.integers(0, d, (h, w)).astype(np.int32)
    vol = (rng.random((d, h, w)).astype(np.float32) - 0.5) * 2  # negatives
    edges = rng.random((h, w)) < 0.4
    ours = np.asarray(discontinuity_adjust(jnp.asarray(disp),
                                           jnp.asarray(vol),
                                           edges=jnp.asarray(edges)))
    np.testing.assert_array_equal(ours, oracle_da(disp, vol, edges))
