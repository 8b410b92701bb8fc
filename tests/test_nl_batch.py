"""Batched stacked-forest NL path == per-frame NL path, bit-identically.

build_tree_batch stacks B frames into one [B*h, w] grid whose inter-frame
boundary edges carry weight 256 (> any intra-frame weight, which is a
max-channel |dI| <= 255), so by the cut property every frame's MST within
the global unique spanning forest is exactly its standalone MST
(NL/qx_mst_kruskals_image.cpp:8-45 weight rule). The rooting then cuts one
Euler tour per frame root. These tests pin that bit-identity at every
level: tree, aggregate, and full pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mystereomatching_tpu import data, models
from mystereomatching_tpu.ops import mst, nl
from mystereomatching_tpu.pipeline import match_pair, match_pair_nl_batch


def _frames(b=3, h=40, w=48, seed0=5):
    pairs = [data.make_synthetic_pair(h=h, w=w, max_disp=11, seed=seed0 + s,
                                      noise_sigma=0.5) for s in range(b)]
    lefts = jnp.asarray(np.stack([p.left for p in pairs]), jnp.float32)
    rights = jnp.asarray(np.stack([p.right for p in pairs]), jnp.float32)
    return pairs, lefts, rights


def test_build_tree_batch_matches_per_frame():
    _, lefts, _ = _frames()
    b, h, w = lefts.shape[:3]
    batch = jax.jit(mst.build_tree_batch)(lefts)
    for k in range(b):
        single = jax.jit(mst.build_tree)(lefts[k])
        sl = slice(k * h * w, (k + 1) * h * w)
        # batch parents are global node ids; rebase to the frame
        bp = np.asarray(batch.parent[sl]) - k * h * w
        assert (bp >= 0).all() and (bp < h * w).all()
        np.testing.assert_array_equal(bp, np.asarray(single.parent))
        np.testing.assert_array_equal(np.asarray(batch.weight[sl]),
                                      np.asarray(single.weight))


def test_nl_aggregate_batch_matches_per_frame():
    _, lefts, rights = _frames(b=2)
    b, h, w = lefts.shape[:3]
    d = 12
    key = jax.random.PRNGKey(0)
    vols = jax.random.uniform(key, (b, d, h, w), jnp.float32) * 30.0
    batched = jax.jit(nl.nl_aggregate_batch)(vols, lefts)
    for k in range(b):
        single = jax.jit(nl.nl_aggregate)(vols[k], lefts[k])
        np.testing.assert_array_equal(np.asarray(batched[k]),
                                      np.asarray(single))


def test_match_pair_nl_batch_matches_match_pair():
    cfg = models.get_model("nl_tree_filter", max_disp=11)
    _, lefts, rights = _frames(b=2)
    out_b = jax.jit(lambda l, r: match_pair_nl_batch(l, r, cfg))(
        lefts, rights)
    for k in range(lefts.shape[0]):
        out_s = jax.jit(lambda l, r: match_pair(l, r, cfg))(
            lefts[k], rights[k])
        np.testing.assert_array_equal(np.asarray(out_b["disparity"][k]),
                                      np.asarray(out_s["disparity"]))
