"""Multi-chip NL (MST tree-filter) flow: disparity-sharded filtering +
distributed Borůvka tree construction.

The tree filter's pointer-chasing crosses the whole image, so the natural
multi-chip split for NL (SURVEY §2.7) is NOT row bands but:

  * tree CONSTRUCTION: one tree per frame, built once with each Borůvka
    round's component segment-min computed per row band and pmin-merged
    across shards (ops/mst.boruvka_mst ``row_axis``) — or fed from the
    host-Kruskal hybrid (cfg.nl_tree_host);
  * tree FILTERING (the FLOP-heavy stage, [N, D] values x 3 passes):
    sharded over the DISPARITY axis — per-disparity columns are
    independent, so each 'disp' device filters its D-block and WTA
    happens with a two-step pmin (global min cost, then smallest
    achieving disparity — the dense argmin's tie order);
  * the post-processing maps (medians, occlusion detect) are [H,W]-cheap
    and replicated.

Bit-exact vs the dense ops/nl.nl_disparity: the D-block filter is
column-independent, the right volume is built directly (equal to
flip_corr_vol by the clamp identity — ops/cost.qx_ad_grad_volume), and the
pmin WTA reproduces argmin tie order. Asserted in test_sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops.cost import qx_ad_grad_volume
from mystereomatching_tpu.ops.median import median_small
from mystereomatching_tpu.ops.mst import RootedTree, build_tree, tree_filter
from mystereomatching_tpu.ops.nl import detect_occlusion_lr


def _wta_dshard(f_blk: jnp.ndarray, ds: jnp.ndarray,
                axis: str = "disp") -> jnp.ndarray:
    """Global WTA over a D-sharded [Db,H,W] volume: min cost via pmin, then
    the smallest disparity achieving it (argmin-first tie order)."""
    fmin = jnp.min(f_blk, axis=0)
    farg = ds[jnp.argmin(f_blk, axis=0)]
    gmin = lax.pmin(fmin, axis)
    cand = jnp.where(fmin <= gmin, farg, jnp.int32(1 << 30))
    return lax.pmin(cand, axis).astype(jnp.int32)


def _nl_body(left, right, cfg: MatchConfig, tree_arrays, axis="disp"):
    d_ = cfg.num_disp
    ndd = lax.axis_size(axis)
    db = d_ // ndd
    ds = lax.axis_index(axis) * db + jnp.arange(db, dtype=jnp.int32)
    h, w = left.shape[:2]
    n = h * w
    if tree_arrays is not None:
        pl, wl, pr, wr_ = tree_arrays
        tree_l = RootedTree(parent=pl, weight=wl, shape=(h, w))
        tree_r = RootedTree(parent=pr, weight=wr_, shape=(h, w))
    else:
        # distributed build: Borůvka segment-mins sharded over this same
        # axis (acting as the band axis) and pmin-merged
        tree_l = build_tree(left, row_axis=axis)
        tree_r = build_tree(right, row_axis=axis)
    k = 5                                     # ctmf radius 2 (cpp:84)

    def filt_wta(vblk, tree, sig):
        f = tree_filter(tree, vblk.reshape(db, n).T, sig)
        dmap = _wta_dshard(f.T.reshape(db, h, w), ds, axis)
        return median_small(dmap, k)

    vl = qx_ad_grad_volume(left, right, d_, 0, disps=ds)
    d_l = filt_wta(vl, tree_l, cfg.nl_sigma)
    if not cfg.nl_post_process:
        return d_l.astype(jnp.float32)
    vr = qx_ad_grad_volume(left, right, d_, 1, disps=ds)
    d_r = filt_wta(vr, tree_r, cfg.nl_sigma)
    occ = detect_occlusion_lr(d_l, d_r)
    dd = jnp.abs(d_l[None].astype(jnp.float32)
                 - ds.astype(jnp.float32)[:, None, None])
    vol2 = jnp.where(occ[None], 0.0, dd)
    return filt_wta(vol2, tree_l, cfg.nl_sigma / 2).astype(jnp.float32)


def nl_disparity_dshard(left, right, cfg: MatchConfig, mesh: Mesh,
                        trees=None) -> jnp.ndarray:
    """The qx NL disparity flow sharded over the mesh's 'disp' axis.

    left/right: [H,W,3] float32 (replicated). trees: optional
    (tree_left, tree_right) RootedTrees from the host hybrid. Returns
    [H,W] float32 disparity, identical to ops/nl.nl_disparity.
    """
    if cfg.num_disp % mesh.shape["disp"]:
        raise ValueError(
            f"num_disp={cfg.num_disp} must divide over 'disp' "
            f"({mesh.shape['disp']} devices)")
    n_args = []
    if trees is not None:
        tl, tr = trees
        n_args = [tl.parent, tl.weight, tr.parent, tr.weight]

    def local(l, r, *targs):
        return _nl_body(l, r, cfg, tuple(targs) if targs else None)

    specs = (P(),) * (2 + len(n_args))
    try:
        fn = shard_map(local, mesh=mesh, in_specs=specs, out_specs=P(),
                       check_vma=False)
    except TypeError:
        fn = shard_map(local, mesh=mesh, in_specs=specs, out_specs=P(),
                       check_rep=False)
    return fn(left.astype(jnp.float32), right.astype(jnp.float32), *n_args)
