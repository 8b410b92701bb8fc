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


def build_tree_host(image, prefilter: bool = True,
                    neighbors: int = 4) -> RootedTree:
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
    parent, weight, _order = native.mst_grid(img8, neighbors=neighbors)
    return RootedTree(parent=jnp.asarray(parent, jnp.int32),
                      weight=jnp.asarray(weight, jnp.int32),
                      shape=(h, w))


def nl_aggregate(vol: jnp.ndarray, image: jnp.ndarray, sigma: float = 0.1,
                 prefilter: bool = True, normalize: bool = True,
                 tree: RootedTree = None,
                 compute_dtype=None, neighbors: int = 4) -> jnp.ndarray:
    """NL aggregation of [D,H,W] volume guided by [H,W,3] image.

    ``tree``: optional precomputed rooted tree (the host-build hybrid path,
    :func:`build_tree_host`); None builds on device.
    ``compute_dtype``: filter-phase dtype (cfg.nl_filter_dtype) —
    bfloat16 halves the peel phases' HBM traffic (documented-approximate
    fast mode; the tree build and normalization stay exact)."""
    d_, h, w = vol.shape
    if tree is None:
        tree = build_tree(image, prefilter, neighbors=neighbors)
    flat = vol.reshape(d_, h * w).T                   # [N, D]
    if normalize:
        # the all-ones normalization volume rides as column D of the same
        # filter (columns are independent in every pass op, so both halves
        # are bit-identical to separate calls) — one set of doubling
        # rounds instead of two
        vals = jnp.concatenate(
            [flat, jnp.ones((h * w, 1), jnp.float32)], axis=1)
        f = tree_filter(tree, vals, sigma, compute_dtype=compute_dtype,
                        neighbors=neighbors)
        filt = f[:, :d_] / jnp.maximum(f[:, d_:], 1e-12)
    else:
        filt = tree_filter(tree, flat, sigma, compute_dtype=compute_dtype,
                           neighbors=neighbors)
    return filt.T.reshape(d_, h, w)


def nl_aggregate_batch(vols: jnp.ndarray, images: jnp.ndarray,
                       sigma: float = 0.1, prefilter: bool = True,
                       normalize: bool = True) -> jnp.ndarray:
    """NL aggregation of B volumes [B,D,H,W] guided by [B,H,W,3] images.

    One stacked-forest tree build (:func:`mystereomatching_tpu.ops.mst.
    build_tree_batch`) + one forest filter for the whole batch — per-frame
    outputs are bit-identical to :func:`nl_aggregate` per frame (per-frame
    MSTs are exact under the weight-256 boundary trick; forest segments
    are disjoint), while the Borůvka/peel/ranking round costs amortize
    across frames.
    """
    from mystereomatching_tpu.ops.mst import build_tree_batch

    b, d_, h, w = vols.shape
    tree = build_tree_batch(images, prefilter)
    flat = vols.transpose(0, 2, 3, 1).reshape(b * h * w, d_)
    if normalize:
        vals = jnp.concatenate(
            [flat, jnp.ones((b * h * w, 1), jnp.float32)], axis=1)
        f = tree_filter(tree, vals, sigma)
        filt = f[:, :d_] / jnp.maximum(f[:, d_:], 1e-12)
    else:
        filt = tree_filter(tree, flat, sigma)
    return filt.reshape(b, h, w, d_).transpose(0, 3, 1, 2)


def flip_corr_vol(vol: jnp.ndarray) -> jnp.ndarray:
    """Right-view volume with the reference's edge quirk
    (qx_stereo_flip_corr_vol, NL/qx_basic.cpp:577-588): vmR[d,y,x] =
    vmL[d,y,x+d] while x+d < w; past the border it replicates the previous
    disparity's value, which collapses to the largest valid d' = w-1-x.

    The border value vr[w-1-x, y, x] = vol[w-1-x, y, w-1] is just the
    volume's LAST COLUMN reindexed, so the former full-volume
    take_along_axis (a [D,H,W] gather, ~GB/s-slow on TPU) collapses to a
    [W]-row gather of a [D,H] plane plus a dense select."""
    from mystereomatching_tpu.ops.volume import flip_volume_lr

    d_, h, w = vol.shape
    vr = flip_volume_lr(vol)                           # wraps past border
    d_idx = jnp.arange(d_, dtype=jnp.int32)[:, None, None]
    d_max = (w - 1) - jnp.arange(w, dtype=jnp.int32)[None, None, :]
    lastcol = vol[:, :, w - 1]                         # [D, H]
    sel = jnp.clip(w - 1 - jnp.arange(w, dtype=jnp.int32), 0, d_ - 1)
    vb = lastcol[sel].T                                # [H, W]
    return jnp.where(d_idx <= d_max, vr, vb[None])


def detect_occlusion_lr(d_left: jnp.ndarray, d_right: jnp.ndarray) -> jnp.ndarray:
    """Occlusion mask (True = occluded), qx_detect_occlusion_left_right
    (NL/qx_basic.cpp:603-633): a pixel survives only when d > 0, x-d >= 0
    and the right map at x-d agrees EXACTLY (|d - dR| >= 1 rejects)."""
    h, w = d_left.shape
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    xr = x - d_left
    dr = jnp.take_along_axis(d_right, jnp.clip(xr, 0, w - 1), axis=1)
    return (xr < 0) | (d_left == 0) | (d_left != dr)


def nl_disparity(vol: jnp.ndarray, left: jnp.ndarray, right: jnp.ndarray,
                 sigma: float = 0.1, post_process: bool = True,
                 trees=None, median_radius: int = 2, neighbors: int = 4):
    """The standalone NL disparity flow, qx_nonlocal_cost_aggregation::
    disparity(..., use_nonlocal_post_processing) (NL/qx_nonlocal_cost_
    aggregation.cpp:72-109), device-resident end to end:

      1. left tree-filter of the raw volume -> WTA -> 5x5 ctmf median
      2. right tree-filter of the flipped volume -> WTA -> median
      3. exact-agreement occlusion mask (qx_basic.cpp:603)
      4. rebuilt volume |d_hat - d| on non-occluded pixels (zeros spread
         neighbor evidence into occluded ones)
      5. LEFT tree re-filter at sigma/2 (m_tf.update_table(sigma/2))
         -> WTA -> median

    The qx filter never normalizes (combine_tree qx_tree_filter.cpp:43:
    "every slice will have the same weight"), so neither does this path.
    ``trees``: optional (tree_left, tree_right) precomputed (host hybrid).
    Returns (disparity int32 [H,W], d_left_raw) — d_left_raw is the
    pre-post-processing map (stage 1), the reference's non-post output.
    """
    from mystereomatching_tpu.ops.median import median_small

    d_, h, w = vol.shape
    n = h * w
    if trees is None:
        tree_l = build_tree(left, neighbors=neighbors)
        tree_r = build_tree(right, neighbors=neighbors)
    else:
        tree_l, tree_r = trees
    k = 2 * median_radius + 1

    def filt_wta(v, tree, sig):
        f = tree_filter(tree, v.reshape(d_, n).T, sig, neighbors=neighbors)
        d = jnp.argmin(f.T.reshape(d_, h, w), axis=0).astype(jnp.int32)
        return median_small(d, k)

    if not post_process:
        d_l = filt_wta(vol, tree_l, sigma)
        return d_l, d_l

    # stages 1+2 fused: the L and R trees filter as one forest (disjoint
    # segments keep every per-node sum bit-identical to separate passes;
    # test_tree_filter_forest_bit_exact) — one set of doubling rounds and
    # one WTA/median dispatch instead of two
    forest = RootedTree(
        parent=jnp.concatenate([tree_l.parent, tree_r.parent + n]),
        weight=jnp.concatenate([tree_l.weight, tree_r.weight]),
        shape=(2 * h, w))
    vals = jnp.concatenate([vol.reshape(d_, n).T,
                            flip_corr_vol(vol).reshape(d_, n).T])
    filt = tree_filter(forest, vals, sigma, neighbors=neighbors)
    dmaps = jnp.argmin(jnp.stack([filt[:n], filt[n:]], 0)
                       .reshape(2, h, w, d_), axis=-1).astype(jnp.int32)
    d_l, d_r = median_small(dmaps, k)
    occ = detect_occlusion_lr(d_l, d_r)
    dd = jnp.abs(d_l[None].astype(jnp.float32)
                 - jnp.arange(d_, dtype=jnp.float32)[:, None, None])
    vol2 = jnp.where(occ[None], 0.0, dd)
    d_final = filt_wta(vol2, tree_l, sigma / 2)
    return d_final, d_l


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
