"""NL: non-local MST tree-filter cost aggregation (+ GFNL blend).

Re-design of the reference NL path (NL() stereoMatching.cpp:4892-4917 ->
NLCCA::aggreCV NL/NLCCA.cpp:27-96 -> qx_nonlocal_cost_aggregation +
qx_tree_filter). The OpenCV<->qx copy adapter disappears: the volume stays
device-resident; the MST build and both filter passes run as JAX ops
(:mod:`mystereomatching_tpu.ops.mst`).

The reference normalizes by tree-filtering an all-ones volume
(cpp:4899-4910) — kept here even though the symmetric filter gives every
slice the same per-pixel weight (the qx comment notes normalization is
optional; the reference's caller does it, so we do too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mystereomatching_tpu.ops.mst import RootedTree, build_tree, tree_filter


def build_tree_host(image, prefilter: bool = True) -> RootedTree:
    """Hybrid tree build: MST + rooting on the HOST via the native C++
    runtime (counting-sort Kruskal + BFS — the reference's exact algorithm
    and tie order, qx_mst_kruskals_image.cpp:167-277); the tree filter
    stays on device. The device Borůvka path (ops/mst.py) costs ~400ms/
    frame in gather latency at Teddy scale; the host build is ~10ms.

    NOT traceable (the axon PJRT backend rejects pure_callback): call it
    OUTSIDE jit on a concrete host image — the tree depends only on the
    input frame, so ``StereoPipeline`` computes it up front and feeds
    (parent, weight) to the jitted pipeline as arguments.
    """
    import numpy as np

    from mystereomatching_tpu import native

    img = np.asarray(image)
    h, w = img.shape[:2]
    img8 = np.asarray(np.clip(np.round(img), 0, 255), np.uint8)
    if prefilter:
        img8 = native.median3x3(img8)
    parent, weight, _order = native.mst_grid(img8)
    return RootedTree(parent=jnp.asarray(parent, jnp.int32),
                      weight=jnp.asarray(weight, jnp.int32),
                      shape=(h, w))


def nl_aggregate(vol: jnp.ndarray, image: jnp.ndarray, sigma: float = 0.1,
                 prefilter: bool = True, normalize: bool = True,
                 tree: RootedTree = None) -> jnp.ndarray:
    """NL aggregation of [D,H,W] volume guided by [H,W,3] image.

    ``tree``: optional precomputed rooted tree (the host-build hybrid path,
    :func:`build_tree_host`); None builds on device."""
    d_, h, w = vol.shape
    if tree is None:
        tree = build_tree(image, prefilter)
    flat = vol.reshape(d_, h * w).T                   # [N, D]
    filt = tree_filter(tree, flat, sigma)
    if normalize:
        ones = jnp.ones((h * w,), jnp.float32)
        norm = tree_filter(tree, ones, sigma)
        filt = filt / jnp.maximum(norm, 1e-12)[:, None]
    return filt.T.reshape(d_, h, w)


def gfnl_aggregate(vol: jnp.ndarray, image: jnp.ndarray, gray: jnp.ndarray,
                   cfg, tree: RootedTree = None) -> jnp.ndarray:
    """GFNL (cpp:4421-4490): blend GF and NL volumes by local image
    variance — var < 400 takes pure NL, else a 50/50 mix."""
    from mystereomatching_tpu.ops.guided import guided_filter_volume
    from mystereomatching_tpu.ops.cost import _box_sum

    gf_vol = guided_filter_volume(vol, image if cfg.gf_color_guide else gray,
                                  cfg.gf_radius, cfg.gf_eps)
    nl_vol = nl_aggregate(vol, image, cfg.nl_sigma, tree=tree)

    g = gray.astype(jnp.float32)
    r = 1  # 3x3 variance window
    area = (2 * r + 1) ** 2
    mean = _box_sum(g, r, r) / area
    var = _box_sum(g * g, r, r) / area - mean * mean
    blend = jnp.where(var < 400.0, 1.0, 0.5)[None]
    return blend * nl_vol + (1.0 - blend) * gf_vol
