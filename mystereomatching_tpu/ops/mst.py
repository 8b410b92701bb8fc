"""Parallel MST over the image grid + rooted tree extraction — device-resident.

TPU-native replacement for the reference's sequential Kruskal MST
(NL/qx_mst_kruskals_image.cpp:167-277: counting-sorted edges, union-find,
BFS rooting). The sequential algorithms become:

  * **Borůvka** component hooking: O(log N) rounds; each round every
    component picks its minimum outgoing edge (ties broken by edge index,
    making the MST unique and deterministic like Kruskal's sorted order),
    hooks onto the neighbor component, and labels are flattened by pointer
    jumping. All steps are segment-min/gather/scatter over flat arrays.
  * **Euler-tour rooting**: each undirected tree edge becomes two directed
    edges living in 4 fixed per-node slots (R, D, L, U — possible because
    tree edges are grid edges). The tour successor of (u -> v) is v's next
    present slot after the reverse edge; list-ranking the tour by pointer
    doubling orders the 2(N-1) directed edges, and for each tree edge the
    earlier-ranked direction points parent -> child. This replaces the BFS
    parent/children/rank arrays (qx_mst_kruskals_image.cpp:229-277) with
    O(log N) gathers.

Edge weights: max-channel |dI| of the 3x3-median-prefiltered color image
(qx_mst_compute_edges_per_pixel NL/qx_mst_kruskals_image.cpp:7-45; ctmf
prefilter at cpp:174).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mystereomatching_tpu.ops.median import median_small


class RootedTree(NamedTuple):
    """Rooted spanning tree over H*W grid nodes (root = node 0)."""

    parent: jnp.ndarray       # [N] int32; parent[root] = root
    weight: jnp.ndarray       # [N] int32 edge weight (node <-> parent), 0..255
    shape: Tuple[int, int]


def grid_edge_weights(image: jnp.ndarray, prefilter: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(w_right [H,W-1], w_down [H-1,W]) uint8-range int32 max-channel |dI|."""
    img = image
    if img.ndim == 2:
        img = img[..., None]
    if prefilter:
        img = jnp.round(median_small(
            jnp.moveaxis(img.astype(jnp.float32), -1, 0), 3))
        img = jnp.moveaxis(img, 0, -1)
    img = img.astype(jnp.int32)
    wr = jnp.max(jnp.abs(img[:, 1:] - img[:, :-1]), -1)
    wd = jnp.max(jnp.abs(img[1:, :] - img[:-1, :]), -1)
    return wr, wd


def _flatten_edges(wr: jnp.ndarray, wd: jnp.ndarray):
    """Edge arrays (eu, ev, ew): right edges row-major, then down edges
    COLUMN-major — the reference's enumeration order
    (qx_mst_compute_edges_4neighbor cpp:46-69), so index tie-breaking
    mirrors its stable counting sort + Kruskal scan."""
    h, w = wr.shape[0], wr.shape[1] + 1
    ids = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    eu = jnp.concatenate([ids[:, :-1].reshape(-1), ids[:-1, :].T.reshape(-1)])
    ev = jnp.concatenate([ids[:, 1:].reshape(-1), ids[1:, :].T.reshape(-1)])
    ew = jnp.concatenate([wr.reshape(-1), wd.T.reshape(-1)]).astype(jnp.int32)
    return eu, ev, ew


def boruvka_mst(wr: jnp.ndarray, wd: jnp.ndarray,
                row_axis: str = None) -> jnp.ndarray:
    """Minimum spanning tree of the 4-neighbor grid.

    Returns a bool mask [E] over the flattened edge list (right edges then
    down edges) marking MST membership. Deterministic: ties by edge index,
    matching the reference's stable sort + Kruskal order.

    ``row_axis``: inside shard_map, the name of a mesh axis over which each
    round's component segment-min is computed per row band and merged with
    ``lax.pmin`` — the distributed-Borůvka cross-shard merge (each shard
    contributes its boundary components' minima; labels stay replicated).
    Output is bit-identical to the unsharded build.
    """
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    eu, ev, ew = _flatten_edges(wr, wd)
    e = eu.shape[0]
    big_w = jnp.int32(2**31 - 1)   # > any packed key (weight<<idx_bits | idx)
    big_i = jnp.int32(e)

    # inits derived from the (varying) edge weights so the while carries
    # match the body outputs' varying axes under shard_map
    zi = (ew[0] * 0).astype(jnp.int32)
    comp = jnp.arange(n, dtype=jnp.int32) + zi
    in_mst = jnp.zeros((e,), jnp.bool_) | (zi != 0)

    # edge endpoints are grid-structured: comp[eu]/comp[ev] are SLICES of
    # comp reshaped [H, W] (right edges row-major, down edges col-major) —
    # arbitrary-index gathers are ~GB/s on TPU, slices are free
    def end_labels(comp):
        c2 = comp.reshape(h, w)
        cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
        cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
        return cu, cv

    # dense per-edge packed (weight, index) keys: one segment-min per node
    # over its <=4 incident edges happens as 2-D plane math (no gathers),
    # collapsing the component segment-min from edge count (2E = 2.6M
    # scatter elements, 16ms/round measured) to node count (N, ~1ms)
    # (weight << idx_bits) | edge_index packed into int32: weights are
    # 8-bit color diffs, so idx_bits = bit_length(E) works up to E < 2^23
    # (~4 MP images). Beyond that int32 cannot hold both fields — route
    # large frames through build_tree_host (nl_tree_host=1). (ADVICE r1:
    # the former fixed 20-bit field silently corrupted trees > 0.52 MP.)
    idx_bits = max(20, int(e).bit_length())
    if 9 + idx_bits > 31:          # weights reach 256 (batch boundaries)
        raise ValueError(
            f"boruvka_mst: {e} edges need {idx_bits} index bits; "
            "int32 packed keys overflow — use the host tree build "
            "(cfg.nl_tree_host=1) for frames this large")
    eidx_r = jnp.arange(h * (w - 1), dtype=jnp.int32).reshape(h, w - 1)
    eidx_d = (h * (w - 1)
              + jnp.arange(w * (h - 1), dtype=jnp.int32).reshape(w, h - 1).T)
    key_r = (wr << idx_bits) | eidx_r                # [H, W-1]
    key_d = (wd << idx_bits) | eidx_d                # [H-1, W]

    def round_body(state):
        comp, in_mst = state
        c2 = comp.reshape(h, w)
        alive_r = c2[:, :-1] != c2[:, 1:]
        alive_d = c2[:-1, :] != c2[1:, :]
        kr = jnp.where(alive_r, key_r, big_w)
        kd = jnp.where(alive_d, key_d, big_w)
        node_key = jnp.minimum(
            jnp.minimum(jnp.pad(kr, ((0, 0), (0, 1)), constant_values=big_w),
                        jnp.pad(kr, ((0, 0), (1, 0)), constant_values=big_w)),
            jnp.minimum(jnp.pad(kd, ((0, 1), (0, 0)), constant_values=big_w),
                        jnp.pad(kd, ((1, 0), (0, 0)), constant_values=big_w)))
        if row_axis is None or h % jax.lax.axis_size(row_axis):
            minkey = jax.ops.segment_min(node_key.reshape(-1), comp,
                                         num_segments=n)
            if row_axis is not None:
                # replicated compute still needs identical results per
                # shard; pmin is then a no-op value-wise
                minkey = jax.lax.pmin(minkey, row_axis)
        else:
            # distributed round: my row band's per-component minima, merged
            # across shards (pmin over components touching several bands)
            nb = jax.lax.axis_size(row_axis)
            hb = h // nb
            r0 = jax.lax.axis_index(row_axis) * hb
            nk = jax.lax.dynamic_slice(node_key, (r0, 0), (hb, w))
            cb = jax.lax.dynamic_slice(c2, (r0, 0), (hb, w))
            minkey = jax.ops.segment_min(nk.reshape(-1), cb.reshape(-1),
                                         num_segments=n)
            minkey = jax.lax.pmin(minkey, row_axis)
        mine = jnp.where(minkey < big_w, minkey & ((1 << idx_bits) - 1), big_i)
        has = mine < big_i

        # hooking: comp c -> component at the other end of its min edge.
        # Per-edge endpoint LABELS are plane shifts of c2 (edges are grid
        # edges), so one [N,2]-row gather of the label-pair table replaces
        # the former [N,2] endpoint gather + [2N]-row label gather.
        sel = jnp.clip(mine, 0, e - 1)
        cu_e = jnp.concatenate([c2[:, :-1].reshape(-1),
                                c2[:-1, :].T.reshape(-1)])
        cv_e = jnp.concatenate([c2[:, 1:].reshape(-1),
                                c2[1:, :].T.reshape(-1)])
        cuv = jnp.stack([cu_e, cv_e], 1)[sel]                # [N, 2]
        other = jnp.where(cuv[:, 0] == jnp.arange(n, dtype=jnp.int32),
                          cuv[:, 1], cuv[:, 0])
        parent = jnp.where(has, other, jnp.arange(n, dtype=jnp.int32))
        # break 2-cycles: keep hook only from the smaller label
        two_cycle = parent[parent] == jnp.arange(n, dtype=jnp.int32)
        parent = jnp.where(two_cycle & (parent > jnp.arange(n, dtype=jnp.int32)),
                           jnp.arange(n, dtype=jnp.int32), parent)

        # mark chosen edges; a 2-cycle's shared edge is selected by BOTH
        # components (one hook pruned above) — scatter-max keeps it marked
        mark = (has & (parent != jnp.arange(n, dtype=jnp.int32))).astype(jnp.int32)
        chosen = jnp.zeros((e,), jnp.int32).at[sel].max(mark, mode="drop")
        in_mst = in_mst | (chosen > 0)

        # pointer jumping to flatten labels, until stable (typically 3-5
        # jumps — a fixed log2(N) count costs ~4x the whole MST build in
        # TPU gather latency)
        parent = _jump_to_root(parent)
        return (parent[comp], in_mst)

    def has_alive(state):
        comp, _ = state
        cu, cv = end_labels(comp)
        return jnp.any(cu != cv)

    comp, in_mst = jax.lax.while_loop(has_alive, round_body, (comp, in_mst))
    return in_mst


def _jump_to_root(parent: jnp.ndarray) -> jnp.ndarray:
    """Pointer-jump until parent == parent[parent] everywhere.

    The convergence flag is computed inside the body from the gather it
    already does — a `cond` that gathers p[p] itself would double the
    gather count (the whole cost of this loop on TPU)."""
    def body(state):
        p, _ = state
        p2 = p[p]
        return p2, jnp.any(p2 != p)

    # init flag derived from `parent` (not a fresh constant) so the carry
    # is "varying" over enclosing shard_map axes like the body output
    p, _ = jax.lax.while_loop(lambda s: s[1], body,
                              (parent, parent[0] == parent[0]))
    return p


# slot order: 0=right, 1=down, 2=left, 3=up (cyclic for the Euler tour)
_REV_SLOT = (2, 3, 0, 1)
_SLOT_OFF = ((0, 1), (1, 0), (0, -1), (-1, 0))   # (dv, du) per slot
# 8-neighbor extension (nr_neighbor=8, qx_mst_kruskals_image.h:12,37):
# extra slots 4=down-right, 5=down-left, 6=up-left, 7=up-right. Any fixed
# cyclic slot order yields a valid Euler tour; reverse pairs must match.
_REV_SLOT8 = (2, 3, 0, 1, 6, 7, 4, 5)
_SLOT_OFF8 = _SLOT_OFF + ((1, 1), (1, -1), (-1, -1), (-1, 1))


def grid_edge_weights8(image: jnp.ndarray, prefilter: bool = True):
    """(w_right, w_down, w_dr [H-1,W-1], w_dl [H-1,W-1]) for the 8-neighbor
    grid (qx_mst_compute_edges_8neighbor, NL/qx_mst_kruskals_image.cpp:
    71-86): the 4-neighbor edges plus, per cell, the down-right diagonal
    (y,x)-(y+1,x+1) and the down-left diagonal (y,x+1)-(y+1,x)."""
    img = image
    if img.ndim == 2:
        img = img[..., None]
    if prefilter:
        img = jnp.round(median_small(
            jnp.moveaxis(img.astype(jnp.float32), -1, 0), 3))
        img = jnp.moveaxis(img, 0, -1)
    img = img.astype(jnp.int32)
    wr = jnp.max(jnp.abs(img[:, 1:] - img[:, :-1]), -1)
    wd = jnp.max(jnp.abs(img[1:, :] - img[:-1, :]), -1)
    wdr = jnp.max(jnp.abs(img[1:, 1:] - img[:-1, :-1]), -1)
    wdl = jnp.max(jnp.abs(img[1:, :-1] - img[:-1, 1:]), -1)
    return wr, wd, wdr, wdl


def _flatten_edges8(wr, wd, wdr, wdl):
    """8-neighbor edge arrays in the reference's enumeration order
    (qx_mst_compute_edges_8neighbor cpp:71-86): right edges row-major,
    down edges column-major, then per cell row-major the DR diagonal
    followed by the DL diagonal — index tie-breaking mirrors the stable
    counting sort + Kruskal scan."""
    h, w = wr.shape[0], wr.shape[1] + 1
    eu4, ev4, ew4 = _flatten_edges(wr, wd)
    ids = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    eu_d = jnp.stack([ids[:-1, :-1], ids[:-1, 1:]], -1).reshape(-1)
    ev_d = jnp.stack([ids[1:, 1:], ids[1:, :-1]], -1).reshape(-1)
    ew_d = jnp.stack([wdr, wdl], -1).reshape(-1).astype(jnp.int32)
    return (jnp.concatenate([eu4, eu_d]), jnp.concatenate([ev4, ev_d]),
            jnp.concatenate([ew4, ew_d]))


def boruvka_mst8(wr: jnp.ndarray, wd: jnp.ndarray, wdr: jnp.ndarray,
                 wdl: jnp.ndarray) -> jnp.ndarray:
    """MST of the 8-neighbor grid (the reference's selectable
    nr_neighbor=8 mode). Returns a bool mask over :func:`_flatten_edges8`
    order; deterministic Kruskal tie order like :func:`boruvka_mst`."""
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    eu, ev, ew = _flatten_edges8(wr, wd, wdr, wdl)
    e = eu.shape[0]
    big_w = jnp.int32(2**31 - 1)
    big_i = jnp.int32(e)
    idx_bits = max(20, int(e).bit_length())
    if 9 + idx_bits > 31:
        raise ValueError(
            f"boruvka_mst8: {e} edges need {idx_bits} index bits; "
            "int32 packed keys overflow — use the host tree build "
            "(cfg.nl_tree_host=1) for frames this large")
    base4 = h * (w - 1) + w * (h - 1)
    eidx_r = jnp.arange(h * (w - 1), dtype=jnp.int32).reshape(h, w - 1)
    eidx_d = (h * (w - 1)
              + jnp.arange(w * (h - 1), dtype=jnp.int32).reshape(w, h - 1).T)
    cell = jnp.arange((h - 1) * (w - 1), dtype=jnp.int32).reshape(h - 1,
                                                                  w - 1)
    eidx_dr = base4 + 2 * cell
    eidx_dl = base4 + 2 * cell + 1
    key_r = (wr << idx_bits) | eidx_r
    key_d = (wd << idx_bits) | eidx_d
    key_dr = (wdr << idx_bits) | eidx_dr                # [H-1, W-1]
    key_dl = (wdl << idx_bits) | eidx_dl

    def pad2(x, top, bot, lef, rig):
        return jnp.pad(x, ((top, bot), (lef, rig)), constant_values=big_w)

    zi = (ew[0] * 0).astype(jnp.int32)     # varying zero (see boruvka_mst)
    comp = jnp.arange(n, dtype=jnp.int32) + zi
    in_mst = jnp.zeros((e,), jnp.bool_) | (zi != 0)

    def edge_labels(c2):
        """Per-edge endpoint labels, flattened-edge order (plane slices)."""
        cu = jnp.concatenate([
            c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1),
            jnp.stack([c2[:-1, :-1], c2[:-1, 1:]], -1).reshape(-1)])
        cv = jnp.concatenate([
            c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1),
            jnp.stack([c2[1:, 1:], c2[1:, :-1]], -1).reshape(-1)])
        return cu, cv

    def round_body(state):
        comp, in_mst = state
        c2 = comp.reshape(h, w)
        kr = jnp.where(c2[:, :-1] != c2[:, 1:], key_r, big_w)
        kd = jnp.where(c2[:-1, :] != c2[1:, :], key_d, big_w)
        kdr = jnp.where(c2[:-1, :-1] != c2[1:, 1:], key_dr, big_w)
        kdl = jnp.where(c2[:-1, 1:] != c2[1:, :-1], key_dl, big_w)
        node_key = jnp.minimum(
            jnp.minimum(pad2(kr, 0, 0, 0, 1), pad2(kr, 0, 0, 1, 0)),
            jnp.minimum(pad2(kd, 0, 1, 0, 0), pad2(kd, 1, 0, 0, 0)))
        node_key = jnp.minimum(node_key, jnp.minimum(
            jnp.minimum(pad2(kdr, 0, 1, 0, 1), pad2(kdr, 1, 0, 1, 0)),
            jnp.minimum(pad2(kdl, 0, 1, 1, 0), pad2(kdl, 1, 0, 0, 1))))
        minkey = jax.ops.segment_min(node_key.reshape(-1), comp,
                                     num_segments=n)
        mine = jnp.where(minkey < big_w, minkey & ((1 << idx_bits) - 1),
                         big_i)
        has = mine < big_i
        sel = jnp.clip(mine, 0, e - 1)
        cu_e, cv_e = edge_labels(c2)
        cuv = jnp.stack([cu_e, cv_e], 1)[sel]
        iota = jnp.arange(n, dtype=jnp.int32)
        other = jnp.where(cuv[:, 0] == iota, cuv[:, 1], cuv[:, 0])
        parent = jnp.where(has, other, iota)
        two_cycle = parent[parent] == iota
        parent = jnp.where(two_cycle & (parent > iota), iota, parent)
        mark = (has & (parent != iota)).astype(jnp.int32)
        chosen = jnp.zeros((e,), jnp.int32).at[sel].max(mark, mode="drop")
        in_mst = in_mst | (chosen > 0)
        parent = _jump_to_root(parent)
        return (parent[comp], in_mst)

    def has_alive(state):
        cu, cv = edge_labels(state[0].reshape(h, w))
        return jnp.any(cu != cv)

    comp, in_mst = jax.lax.while_loop(has_alive, round_body, (comp, in_mst))
    return in_mst


def _slot_masks(in_mst: jnp.ndarray, h: int, w: int):
    """[4, H, W] bool: node has a tree edge in slot s."""
    e_r = in_mst[: h * (w - 1)].reshape(h, w - 1)
    e_d = (in_mst[h * (w - 1): h * (w - 1) + w * (h - 1)]
           .reshape(w, h - 1).T)                     # down edges column-major
    right = jnp.pad(e_r, ((0, 0), (0, 1)))
    left = jnp.pad(e_r, ((0, 0), (1, 0)))
    down = jnp.pad(e_d, ((0, 1), (0, 0)))
    up = jnp.pad(e_d, ((1, 0), (0, 0)))
    return jnp.stack([right, down, left, up])


def _slot_masks8(in_mst: jnp.ndarray, h: int, w: int):
    """[8, H, W] bool slot masks for the 8-neighbor edge list."""
    four = _slot_masks(in_mst, h, w)
    e_dg = in_mst[h * (w - 1) + w * (h - 1):].reshape(h - 1, w - 1, 2)
    e_dr, e_dl = e_dg[..., 0], e_dg[..., 1]          # cell-indexed
    dr = jnp.pad(e_dr, ((0, 1), (0, 1)))             # node (y,x): cell (y,x)
    ul = jnp.pad(e_dr, ((1, 0), (1, 0)))             # cell (y-1,x-1)
    dl = jnp.pad(e_dl, ((0, 1), (1, 0)))             # cell (y,x-1)
    ur = jnp.pad(e_dl, ((1, 0), (0, 1)))             # cell (y-1,x)
    return jnp.concatenate([four, jnp.stack([dr, dl, ul, ur])])


# problems below this node count skip the fast/full lax.cond tiers and
# trace ONE full-size branch: at small n the compacted fast path saves
# nothing at runtime but its duplicated branch program dominates XLA
# compile time (the round-4 multichip-gate timeout was ~7 of these conds
# in the tiny-shape NL d-shard dryrun program)
_COND_MIN_N = int(os.environ.get("MYSM_COND_MIN_N", str(1 << 14)))


def _rank_setup(is_edge: jnp.ndarray, succ: jnp.ndarray, h: int):
    """Compact-size-independent prep for :func:`_rank_tour` — hoisted out
    of the fast/full cond branches so it is traced once.

    Returns (newid, succ): old -> compact id via a 2-level prefix sum
    ([H, S*W] rows + row offsets; a flat 1-D cumsum over S*N elements
    hangs the TPU lowering). The old->compact remap of ``succ`` itself is
    deferred to :func:`_rank_tour`'s sort-based compaction.
    """
    de = is_edge.shape[0]
    e2 = is_edge.astype(jnp.int32).reshape(h, de // h)
    c2 = jnp.cumsum(e2, axis=1)
    row_tot = c2[:, -1]
    offs = jnp.cumsum(row_tot) - row_tot
    newid = (c2 + offs[:, None]).reshape(-1) - 1      # [4N]
    return newid, succ


def _rank_tour(is_edge: jnp.ndarray, newid: jnp.ndarray,
               succ: jnp.ndarray, nc: int) -> jnp.ndarray:
    """List-rank the Euler tour: negated steps-to-end per directed edge.

    is_edge: [4N] slot-space presence; newid/succ from
    :func:`_rank_setup`. ``nc``: STATIC compact size — live edges are
    compacted into nc rows and ranked by pointer doubling with
    (dist, succ) fused into one [nc, 2] gather per round.

    Compaction is ONE lax.sort of the slot space by newid (round 5): the
    former scatter-into-compact + newid[succ] remap + oldid scatter were
    three [4N]-row ops at the ~6.5 ns/row scatter/gather latency floor
    (~13 of root_tree's 18.8 ms at Teddy scale — rank machinery was
    18.4 of it) while lax.sort is near-bandwidth-bound (~0.3 ms at 335k
    rows). After the sort, the succ remap gathers only nc rows. Returns
    [4N] int32 ranks (earlier edge => smaller value; non-edges 0).
    """
    de = is_edge.shape[0]
    iota = jnp.arange(de, dtype=jnp.int32)
    keyo = jnp.where(is_edge, newid, de)               # dead slots last
    key_s, succ_s, old_s = jax.lax.sort((keyo, succ, iota), num_keys=1)
    key_s, succ_s, old_s = key_s[:nc], succ_s[:nc], old_s[:nc]
    live_row = key_s < de
    iota_c = jnp.arange(nc, dtype=jnp.int32)
    # compact successor: newid of the old successor; tour ends (succ ==
    # self) and dead rows point at themselves (inert)
    succ_c = jnp.where(live_row & (succ_s != old_s),
                       newid[jnp.where(live_row, succ_s, 0)], iota_c)
    dist_c = jnp.where(succ_c != iota_c, 1, 0)
    st = jnp.stack([dist_c, succ_c], axis=1)           # [nc, 2]

    def rank_round(state):
        st, _ = state
        g = st[st[:, 1]]                               # one fused gather
        st2 = jnp.stack([st[:, 0] + g[:, 0], g[:, 1]], axis=1)
        return st2, jnp.any(st2[:, 1] != st[:, 1])

    st, _ = jax.lax.while_loop(lambda s: s[1], rank_round,
                               (st, is_edge[0] == is_edge[0]))
    # back to slot space by SCATTER (nc input rows): dist = steps to tour
    # end, so earlier edge => larger dist => smaller -dist
    oldid = jnp.where(live_row, old_s, de)
    return jnp.zeros((de,), jnp.int32).at[oldid].set(-st[:, 0], mode="drop")


def root_tree(in_mst: jnp.ndarray, wr: jnp.ndarray, wd: jnp.ndarray,
              peels: int = 20, frame_h: int = None,
              diag=None) -> RootedTree:
    """Orient the MST toward node 0: leaf peeling + core Euler ranking.

    ``frame_h``: for batched builds, the stacked plane holds one frame per
    ``frame_h`` rows and the spanning FOREST is rooted per frame at
    (k*frame_h, 0) — every Euler tour is cut before its own root's first
    slot, so all frames rank in the same doubling rounds.

    Phase 1 — ``peels`` rounds of leaf removal, PURE 2-D plane math (tree
    edges are grid edges, so degrees and the unique-alive-neighbor select
    are shifted-mask ops, no gathers). A peeled leaf's surviving neighbor
    IS its parent: the root (node 0) never peels, aliveness is monotone,
    so the root side of any current leaf is always the one alive neighbor.
    Image MSTs peel fast (~16% of nodes left after 20 rounds at Teddy
    scale); each round costs ~20 cheap plane ops.

    Phase 2 — Euler tour + list ranking (the round-1 design) on the peeled
    CORE only. Ranking is the expensive step (row-latency-bound gathers),
    so the core is compacted into a 4x smaller static buffer when the live
    count allows (lax.cond; the full-size branch keeps worst-case — long
    path — trees correct). Both branches produce identical ranks, and the
    final parents are bit-identical to the unpeeled build.

    ``diag``: (wdr, wdl) diagonal weight planes — switches to the
    8-neighbor slot tables (in_mst then indexes :func:`_flatten_edges8`).
    """
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    peels = int(os.environ.get("MYSM_ROOT_PEELS", peels))
    if diag is None:
        slots = _slot_masks(in_mst, h, w)             # [4,H,W]
        slot_off, rev_slot = _SLOT_OFF, _REV_SLOT
    else:
        slots = _slot_masks8(in_mst, h, w)            # [8,H,W]
        slot_off, rev_slot = _SLOT_OFF8, _REV_SLOT8
    n_slots = len(slot_off)
    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    de = n_slots * n

    def shift2(x, dv, du, fill):
        pv0, pv1 = max(0, -dv), max(0, dv)
        pu0, pu1 = max(0, -du), max(0, du)
        p = jnp.pad(x, ((pv0, pv1), (pu0, pu1)), constant_values=fill)
        return p[pv0 + dv: pv0 + dv + h, pu0 + du: pu0 + du + w]

    wr_p = jnp.pad(wr, ((0, 0), (0, 1)))
    wl_p = jnp.pad(wr, ((0, 0), (1, 0)))
    wd_p = jnp.pad(wd, ((0, 1), (0, 0)))
    wu_p = jnp.pad(wd, ((1, 0), (0, 0)))
    wplane = (wr_p, wd_p, wl_p, wu_p)                 # [H,W] weight per slot
    if diag is not None:
        wdr, wdl = diag
        wplane = wplane + (
            jnp.pad(wdr, ((0, 1), (0, 1))),           # DR: cell (y, x)
            jnp.pad(wdl, ((0, 1), (1, 0))),           # DL: cell (y, x-1)
            jnp.pad(wdr, ((1, 0), (1, 0))),           # UL: cell (y-1, x-1)
            jnp.pad(wdl, ((1, 0), (0, 1))))           # UR: cell (y-1, x)
    nbr_ids = [shift2(ids2, dv, du, 0) for dv, du in slot_off]

    # --- phase 1: leaf peeling ---
    if frame_h is None:
        frame_h = h
    roots2 = ((jnp.arange(h, dtype=jnp.int32)[:, None] % frame_h == 0)
              & (jnp.arange(w, dtype=jnp.int32)[None, :] == 0))
    zb = in_mst[0] & False                 # varying False (shard_map VMA)
    alive = jnp.ones((h, w), jnp.bool_) | zb
    notroot = ~roots2
    parent2 = ids2 + zb.astype(jnp.int32)
    weight2 = jnp.zeros((h, w), jnp.int32) + zb.astype(jnp.int32)
    wplane_st = jnp.stack(wplane)                     # [4,H,W]
    nbr_st = jnp.stack(nbr_ids)

    def peel_round(_, state):                         # fori: one HLO body
        alive, parent2, weight2 = state
        ea = [slots[s] & shift2(alive, dv, du, False)
              for s, (dv, du) in enumerate(slot_off)]    # alive edge at slot
        deg = sum(ea[s].astype(jnp.int32) for s in range(n_slots))
        leaf = alive & notroot & (deg == 1)
        for s in range(n_slots):
            pm = leaf & ea[s]
            parent2 = jnp.where(pm, nbr_st[s], parent2)
            weight2 = jnp.where(pm, wplane_st[s], weight2)
        return alive & ~leaf, parent2, weight2

    alive, parent2, weight2 = jax.lax.fori_loop(
        0, peels, peel_round, (alive, parent2, weight2))

    # core tree edges: both endpoints alive
    core = jnp.stack([slots[s] & alive & shift2(alive, dv, du, False)
                      for s, (dv, du) in enumerate(slot_off)])  # [S,H,W]
    pres_t = core.reshape(n_slots, n).T               # [N,S]

    # --- phase 2: Euler tour of the core ---
    # per-root start edge: the root's first present core slot (plane mask,
    # so every frame's tour is cut in the same pass)
    taken = jnp.zeros((h, w), jnp.bool_)
    is_start = []
    for s in range(n_slots):
        is_start.append(roots2 & core[s] & ~taken)
        taken = taken | core[s]

    # successor for every potential directed edge (u, s): arrive at v,
    # continue through v's next present slot after rev_slot[s]; an edge
    # whose successor would be a tour start ends its tour instead
    succ, succ_start = [], []
    for s, (dv, du) in enumerate(slot_off):
        r = rev_slot[s]
        vid = nbr_ids[s]
        nxt = jnp.full((h, w), -1, jnp.int32)
        nst = jnp.zeros((h, w), jnp.bool_)
        for k in range(n_slots, 0, -1):               # reverse priority: k=1 wins
            cand = (r + k) % n_slots
            pres_vc = shift2(core[cand], dv, du, False)
            nxt = jnp.where(pres_vc, vid * n_slots + cand, nxt)
            nst = jnp.where(pres_vc, shift2(is_start[cand], dv, du, False),
                            nst)
        succ.append(nxt.reshape(-1))
        succ_start.append(nst.reshape(-1))
    succ = jnp.stack(succ, 1).reshape(de)             # [S*N]
    succ_start = jnp.stack(succ_start, 1).reshape(de)

    iota = jnp.arange(de, dtype=jnp.int32)
    is_edge = pres_t.reshape(de)
    succ = jnp.where(succ_start, iota, succ)
    succ = jnp.where(is_edge, succ, iota)

    # rank cost is linear in the STATIC compact size (row-latency-bound
    # gathers), so the cap tracks the measured core: ~16% of nodes remain
    # after 20 peels on natural/synthetic images => ~0.32n directed core
    # edges; 2n/6 holds that with margin, and pathological (path-shaped)
    # trees fall through to the exact full-size branch. Small problems
    # skip the cond (one full-size branch — see _COND_MIN_N).
    newid, succ2 = _rank_setup(is_edge, succ, h)
    nc_fast = max(64, (2 * n) // int(os.environ.get("MYSM_RANK_DIV", "6")))
    if n <= _COND_MIN_N:
        rank = _rank_tour(is_edge, newid, succ2, 2 * n)
    else:
        cnt = jnp.sum(is_edge.astype(jnp.int32))
        rank = jax.lax.cond(
            cnt <= nc_fast,
            lambda: _rank_tour(is_edge, newid, succ2, nc_fast),
            lambda: _rank_tour(is_edge, newid, succ2, 2 * n))

    # parent for core nodes: node v's parent is the neighbor t of the
    # unique present slot s whose INCOMING direction (t->v) ranks earlier
    # than the outgoing (v->t) — the Euler tour enters v from its parent
    # first. Peeled nodes keep their phase-1 parents.
    rank_nv = rank.reshape(n, n_slots)
    parent = parent2.reshape(-1)
    weight = weight2.reshape(-1)
    big = jnp.int32(1 << 30)
    for s, (dv, du) in enumerate(slot_off):
        r = rev_slot[s]
        out_rank = rank_nv[:, s]                      # rank(v -> t)
        # rank(t -> v): slot-r rank plane shifted to the neighbor
        in_rank = shift2(rank_nv[:, r].reshape(h, w), dv, du, big).reshape(-1)
        is_parent = pres_t[:, s] & (in_rank < out_rank)
        parent = jnp.where(is_parent, nbr_ids[s].reshape(-1), parent)
        weight = jnp.where(is_parent, wplane[s].reshape(-1), weight)
    # roots keep themselves with weight 0
    rflat = roots2.reshape(-1)
    parent = jnp.where(rflat, jnp.arange(n, dtype=jnp.int32), parent)
    weight = jnp.where(rflat, 0, weight)
    return RootedTree(parent=parent, weight=weight, shape=(h, w))


def _cumsum_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a flat int32 array via a 2-level [rows, 512]
    decomposition — a flat 1-D cumsum over hundreds of thousands of
    elements hangs the TPU lowering (see root_tree's newid)."""
    n = x.shape[0]
    lane = 512
    rows = -(-n // lane)
    xp = jnp.pad(x, (0, rows * lane - n)).reshape(rows, lane)
    c = jnp.cumsum(xp, axis=1)
    tot = c[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (c + offs[:, None]).reshape(-1)[:n]


def _dedup_contract(cu, cv, rowkey, alive, c_cap: int, e_cap: int):
    """Contract a multigraph to its per-pair minimum simple graph.

    cu/cv: [E] dense component labels (< c_cap) per edge; rowkey: [E] int32
    whose ascending order is the global Kruskal tie order; alive: [E] bool.
    Returns (eu2, ev2, orig_row, valid) arrays of static size ``e_cap``
    (>= 3*c_cap - 6 suffices: the contracted grid graph stays planar, so it
    has at most 3C-6 distinct component pairs), with rows SORTED by rowkey —
    so in the contracted rounds "minimum edge" is simply "minimum row".
    orig_row maps each contracted row back to the rowkey value (= caller's
    edge identity) of the pair's minimum edge.
    """
    e = cu.shape[0]
    big = jnp.int32(2**31 - 1)
    a = jnp.where(alive, jnp.minimum(cu, cv), jnp.int32(c_cap))
    b = jnp.where(alive, jnp.maximum(cu, cv), jnp.int32(c_cap))
    # sort-only dedup (round 5): sorting by (pair, rowkey) makes the
    # FIRST row of each pair segment its minimum — a plane compare with
    # the previous row replaces the former [E,3]-row scatter-min (~2.2 ms
    # at 335k rows vs ~0.3 ms per sort; scatters are ~6.5 ns/row serial).
    if (c_cap + 1) * (c_cap + 2) < 2**31:
        # pack the pair into ONE int32 key (single-frame sizes)
        packed = a * jnp.int32(c_cap + 1) + b
        p_s, key_s = jax.lax.sort((packed, rowkey), num_keys=2)
        a_s = p_s // jnp.int32(c_cap + 1)
        b_s = p_s - a_s * jnp.int32(c_cap + 1)
        start = jnp.concatenate([p_s[:1] == p_s[:1],
                                 p_s[1:] != p_s[:-1]])
    else:
        # batched frames push c_cap past sqrt(2^31): lexicographic 3-key
        # sort. Dead edges (a = c_cap) sort last.
        a_s, b_s, key_s = jax.lax.sort((a, b, rowkey), num_keys=3)
        start = jnp.concatenate([a_s[:1] == a_s[:1],
                                 (a_s[1:] != a_s[:-1])
                                 | (b_s[1:] != b_s[:-1])])
    sel = start & (a_s != c_cap)
    # compact the per-pair minima in global tie order: one more sort by
    # (rowkey if selected else big)
    k2 = jnp.where(sel, key_s, big)
    min_key, eu2, ev2 = jax.lax.sort((k2, a_s, b_s), num_keys=1)
    if e_cap <= e:
        min_key, eu2, ev2 = min_key[:e_cap], eu2[:e_cap], ev2[:e_cap]
    else:
        pad = (jnp.full((e_cap - e,), big, jnp.int32),
               jnp.zeros((e_cap - e,), jnp.int32))
        min_key = jnp.concatenate([min_key, pad[0]])
        eu2 = jnp.concatenate([eu2, pad[1]])
        ev2 = jnp.concatenate([ev2, pad[1]])
    valid = min_key != big
    eu2 = jnp.where(valid, eu2, 0)
    ev2 = jnp.where(valid, ev2, 0)
    return eu2, ev2, min_key, valid


def _contracted_rounds(euv, valid, c_cap: int):
    """Run Borůvka rounds on a contracted simple graph until connected.

    Rows are sorted by global tie order; returns chosen [e_cap] bool —
    rows whose edge joined the MST. The cond's alive test costs one tiny
    [e_cap, 2] gather (e_cap here is ~N/43 of the original problem).
    Each round's chosen rows land in a [max_rounds, c_cap] buffer; ONE
    scatter at the end marks them (scatters have a latency floor that
    dominates rounds at this size)."""
    e_cap = euv.shape[0]
    body = _compact_round_body(euv, valid, c_cap)
    max_rounds = max(1, math.ceil(math.log2(max(c_cap, 2))))

    def cond(state):
        comp2, _, i = state
        cuv = comp2[euv.reshape(-1)].reshape(e_cap, 2)
        return (i < max_rounds) & jnp.any(valid & (cuv[:, 0] != cuv[:, 1]))

    def step(state):
        comp2, buf, i = state
        comp2, rows = body(comp2)
        buf = jax.lax.dynamic_update_slice(buf, rows[None], (i, 0))
        return comp2, buf, i + 1

    zi = euv[0, 0] * 0                     # varying zero (shard_map VMA)
    _, buf, _ = jax.lax.while_loop(
        cond, step,
        (jnp.arange(c_cap, dtype=jnp.int32) + zi,
         jnp.full((max_rounds, c_cap), e_cap, jnp.int32) + zi,
         zi))
    return (jnp.zeros((e_cap,), jnp.int32)
            .at[buf.reshape(-1)].max(1, mode="drop") > 0)


def boruvka_mst_contracted(wr: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
    """boruvka_mst with geometric contraction — same unique MST, ~3x faster.

    The plain round loop costs O(rounds) full-size gathers/scatters (N-row
    ops are latency-bound at ~6.5 ns/row on TPU, so 18 rounds x ~8 ms
    dominates the NL path). Since every component holds >= 2^r nodes after
    r rounds, the graph shrinks geometrically: after 2 grid rounds the
    per-pair minimum simple graph has <= 3*(N/4) edges (planarity), after 5
    more <= 3*(N/128). Two contraction points bound total work by the first
    few rounds. Output is bit-identical to :func:`boruvka_mst`: with keys
    (weight, edge index) all distinct the MST is unique, and the per-pair /
    per-component minima here use exactly that key order.
    """
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    eu, ev, ew = _flatten_edges(wr, wd)
    e = eu.shape[0]
    idx_bits = max(20, int(e).bit_length())
    if 9 + idx_bits > 31:          # weights reach 256 (batch boundaries)
        raise ValueError("boruvka_mst_contracted: packed key overflow — "
                         "use the host tree build for frames this large")
    wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)

    # --- phase 1: r1 grid-space rounds + a conditional top-up round ---
    # round 1 is special-cased (comp == identity makes every step plane
    # math; the only gathers left are the label-flattening jumps);
    # r1 chosen so the dense pair id a*c_cap+b fits int32
    r1 = 2
    while (n >> (r1 + 1)) > 46340:
        r1 += 1
    if not os.environ.get("MYSM_NO_PLANE_P1"):
        # round 5: phase 1 as pure plane-math fixpoint propagation (see
        # _plane_phase1) — p_rounds rounds guarantee the n >> p_rounds
        # cap with no conditional top-up (components at least double per
        # round). Extra plane rounds are cheap (~0.1 ms fixpoint
        # iterations) and shrink every post-contraction row count 2x
        # each; measured at Teddy scale: 3 rounds 18.8 ms, 4 -> 13.3,
        # 5 -> 8.9, 6 -> 8.1 (all bit-exact).
        p_rounds = int(os.environ.get("MYSM_PLANE_ROUNDS", "0")) or (r1 + 4)
        c_cap = max(n >> p_rounds, 64)
        comp, in_mst = _plane_phase1(wr, wd, idx_bits, p_rounds)
    else:
        # hook + pointer-jump formulation (A/B reference): rounds 2..r1
        # and the cap top-up run under ONE while_loop so the round body
        # is traced once (a lax.cond top-up duplicated the whole program
        # and quadrupled the NL XLA compile — round-4 multichip timeout)
        c_cap = max(n >> (r1 + 1), 64)
        state = _grid_round1(wr, wd, idx_bits)
        round_body = _grid_round_body(wr, wd, eu, ev, idx_bits)
        iota_n = jnp.arange(n, dtype=jnp.int32)

        def more_rounds(st):
            comp, _, i = st
            cnt = jnp.sum((comp == iota_n).astype(jnp.int32))
            return (i < r1 - 1) | ((i < r1) & (cnt > c_cap))

        def round_step(st):
            comp, in_mst, i = st
            comp, in_mst = round_body((comp, in_mst))
            return comp, in_mst, i + 1

        comp, in_mst, _ = jax.lax.while_loop(
            more_rounds, round_step, state + (state[0][0] * 0,))

    # --- phase 2: relabel components densely, contract edges ---
    iota = jnp.arange(n, dtype=jnp.int32)
    is_root = (comp == iota).astype(jnp.int32)
    newc = _cumsum_flat(is_root) - 1                    # dense id at roots
    comp_c = newc[comp]                                 # [N] gather
    c2 = comp_c.reshape(h, w)
    cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
    cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
    e_cap1 = 3 * c_cap
    eu2, ev2, key2, valid2 = _dedup_contract(
        cu, cv, wkey, cu != cv, c_cap, e_cap1)

    # --- phase 3: contraction cascade — 2 compact rounds per level, then
    # contract again (components grow >= 4x per level, so sizes drop
    # geometrically: 3n/4 -> 3n/16 -> 3n/64 rows). Rounds are row-bound,
    # so contracting every 2 rounds beats running more rounds at any one
    # level. Each level remembers (key_k -> parent-level row, valid_k,
    # this level's chosen rows) for the unwind.
    euv = jnp.stack([eu2, ev2], 1)
    valid_k, key_k = valid2, key2
    c_k = c_cap
    # rounds per cascade level / finish threshold (tunable: each extra
    # round per level trades a dedup SORT for cheap small-graph rounds)
    casc_r = int(os.environ.get("MYSM_CASCADE_R", "2"))
    casc_stop = int(os.environ.get("MYSM_CASCADE_STOP", "1024"))
    levels = []                       # (rows_of_rounds, key_k, valid_k, e_cap)
    while c_k > casc_stop:
        e_cap_k = euv.shape[0]
        body = _compact_round_body(euv, valid_k, c_k)
        comp2 = jnp.arange(c_k, dtype=jnp.int32)
        rows_k = []
        for _ in range(casc_r):
            comp2, rows = body(comp2)
            rows_k.append(rows)
        levels.append((rows_k, key_k, valid_k, e_cap_k))
        c_next = c_k >> casc_r        # R rounds => components >= 2^R nodes
        is_root2 = (comp2 == jnp.arange(c_k, dtype=jnp.int32)).astype(jnp.int32)
        newc2 = _cumsum_flat(is_root2) - 1
        comp2_c = newc2[comp2]
        cuv2 = comp2_c[euv.reshape(-1)].reshape(-1, 2)
        eu3, ev3, key_k, valid_k = _dedup_contract(
            cuv2[:, 0], cuv2[:, 1], jnp.arange(e_cap_k, dtype=jnp.int32),
            valid_k & (cuv2[:, 0] != cuv2[:, 1]), c_next, 3 * c_next)
        euv = jnp.stack([eu3, ev3], 1)
        c_k = c_next

    # --- phase 4: finish on the deepest contracted graph ---
    chosen = _contracted_rounds(euv, valid_k, c_k)

    # unwind level by level: deeper chosen rows map through key_k to this
    # level's rows; merge with this level's round rows in ONE scatter
    for rows_k, key_up, valid_up, e_cap_k in reversed(levels):
        mapped = jnp.where(chosen & valid_k, key_k, e_cap_k)
        chosen = (jnp.zeros((e_cap_k,), jnp.int32)
                  .at[jnp.concatenate(rows_k + [mapped])]
                  .max(1, mode="drop") > 0)
        key_k, valid_k = key_up, valid_up
    orig = jnp.where(chosen & valid_k, key_k & ((1 << idx_bits) - 1), 0)
    in_mst = in_mst | jnp.zeros((e,), jnp.bool_).at[orig].max(
        chosen & valid_k, mode="drop")
    return in_mst


def _plane_phase1(wr, wd, idx_bits: int, rounds: int):
    """Phase-1 Borůvka rounds as PURE PLANE MATH — zero gathers/scatters.

    [n]-row scatters/gathers are ~6.5 ns/row latency-bound on TPU, and
    the classic hook + pointer-jump formulation spends ~20 of them over
    2 grid rounds — measured 24.3 ms of the 42 ms Teddy-scale build
    (scripts/profile_boruvka5.py, round 5), while the dedup sorts the
    round-3 analysis blamed cost 0.3-0.5 ms. Each round here is VPU-only:

      1. per-node min ALIVE incident edge key (4 padded mins), then a
         FIXPOINT while-loop propagating the min over same-label edges —
         at convergence every node holds its COMPONENT's min outgoing
         key exactly (monotone min propagation over a connected region);
      2. chosen edges marked by plane key-equality at either endpoint
         (keys are unique, so equality identifies the component minima);
      3. labels updated by min-label fixpoint propagation over
         (same-label | chosen) edges. No 2-cycle case exists: min-label
         propagation cannot oscillate. Hook chains are weight-decreasing,
         so merged diameters stay small and the fixpoints converge in a
         few ~0.1 ms [H,W] iterations.

    Labels are component-min NODE ids — consistent at fixpoint, which is
    all the relabel/dedup machinery needs. Components at least double
    per round, so after ``rounds`` rounds the component count is
    <= n >> rounds with NO conditional top-up. Returns (comp [n] int32,
    in_mst [E] bool in _flatten_edges order); the marked edge set equals
    the hook formulation's exactly (same unique per-component minima).
    """
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    big = jnp.int32(2**31 - 1)
    eidx_r = jnp.arange(h * (w - 1), dtype=jnp.int32).reshape(h, w - 1)
    eidx_d = (h * (w - 1)
              + jnp.arange(w * (h - 1), dtype=jnp.int32).reshape(w, h - 1).T)
    key_r = (wr << idx_bits) | eidx_r
    key_d = (wd << idx_bits) | eidx_d

    zi = (wr[0, 0] * 0).astype(jnp.int32)          # varying zero
    lab = jnp.arange(n, dtype=jnp.int32).reshape(h, w) + zi
    in_r = jnp.zeros((h, w - 1), jnp.bool_) | (zi != 0)
    in_d = jnp.zeros((h - 1, w), jnp.bool_) | (zi != 0)

    def padmin(x, top, bot, lef, rig):
        return jnp.pad(x, ((top, bot), (lef, rig)), constant_values=big)

    for _ in range(rounds):
        same_r = lab[:, :-1] == lab[:, 1:]
        same_d = lab[:-1, :] == lab[1:, :]
        kr = jnp.where(same_r, big, key_r)
        kd = jnp.where(same_d, big, key_d)
        nk = jnp.minimum(
            jnp.minimum(padmin(kr, 0, 0, 0, 1), padmin(kr, 0, 0, 1, 0)),
            jnp.minimum(padmin(kd, 0, 1, 0, 0), padmin(kd, 1, 0, 0, 0)))

        def prop_body(st, same_r=same_r, same_d=same_d):
            nk, _ = st
            r_in = jnp.where(same_r, nk[:, 1:], big)     # from right nbr
            l_in = jnp.where(same_r, nk[:, :-1], big)    # from left nbr
            d_in = jnp.where(same_d, nk[1:, :], big)
            u_in = jnp.where(same_d, nk[:-1, :], big)
            cand = jnp.minimum(
                jnp.minimum(padmin(r_in, 0, 0, 0, 1),
                            padmin(l_in, 0, 0, 1, 0)),
                jnp.minimum(padmin(d_in, 0, 1, 0, 0),
                            padmin(u_in, 1, 0, 0, 0)))
            nk2 = jnp.minimum(nk, cand)
            return nk2, jnp.any(nk2 != nk)

        nk, _ = jax.lax.while_loop(lambda st: st[1], prop_body,
                                   (nk, zi == 0))

        ch_r = (~same_r) & ((key_r == nk[:, :-1]) | (key_r == nk[:, 1:]))
        ch_d = (~same_d) & ((key_d == nk[:-1, :]) | (key_d == nk[1:, :]))
        in_r = in_r | ch_r
        in_d = in_d | ch_d

        lnk_r = same_r | ch_r
        lnk_d = same_d | ch_d

        def lab_body(st, lnk_r=lnk_r, lnk_d=lnk_d):
            lab, _ = st
            r_in = jnp.where(lnk_r, lab[:, 1:], big)
            l_in = jnp.where(lnk_r, lab[:, :-1], big)
            d_in = jnp.where(lnk_d, lab[1:, :], big)
            u_in = jnp.where(lnk_d, lab[:-1, :], big)
            cand = jnp.minimum(
                jnp.minimum(padmin(r_in, 0, 0, 0, 1),
                            padmin(l_in, 0, 0, 1, 0)),
                jnp.minimum(padmin(d_in, 0, 1, 0, 0),
                            padmin(u_in, 1, 0, 0, 0)))
            lab2 = jnp.minimum(lab, cand)
            return lab2, jnp.any(lab2 != lab)

        lab, _ = jax.lax.while_loop(lambda st: st[1], lab_body,
                                    (lab, zi == 0))

    comp = lab.reshape(-1)
    in_mst = jnp.concatenate([in_r.reshape(-1), in_d.T.reshape(-1)])
    return comp, in_mst


def _grid_round1(wr, wd, idx_bits):
    """Borůvka round 1, gather-free: with comp == identity the segment-min
    IS the per-node key, the hook target is a neighbor (a plane shift), the
    2-cycle test compares a node's chosen slot with its neighbor's, and
    edge marking is two plane ORs. Only the final label flattening jumps.
    """
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    big_w = jnp.int32(2**31 - 1)
    eidx_r = jnp.arange(h * (w - 1), dtype=jnp.int32).reshape(h, w - 1)
    eidx_d = (h * (w - 1)
              + jnp.arange(w * (h - 1), dtype=jnp.int32).reshape(w, h - 1).T)
    key_r = (wr << idx_bits) | eidx_r
    key_d = (wd << idx_bits) | eidx_d

    def shift2(x, dv, du, fill):
        pv0, pv1 = max(0, -dv), max(0, dv)
        pu0, pu1 = max(0, -du), max(0, du)
        p = jnp.pad(x, ((pv0, pv1), (pu0, pu1)), constant_values=fill)
        return p[pv0 + dv: pv0 + dv + h, pu0 + du: pu0 + du + w]

    # per-slot keys at each node (slot order 0=R,1=D,2=L,3=U)
    ks = [jnp.pad(key_r, ((0, 0), (0, 1)), constant_values=big_w),
          jnp.pad(key_d, ((0, 1), (0, 0)), constant_values=big_w),
          jnp.pad(key_r, ((0, 0), (1, 0)), constant_values=big_w),
          jnp.pad(key_d, ((1, 0), (0, 0)), constant_values=big_w)]
    node_key = jnp.minimum(jnp.minimum(ks[0], ks[2]),
                           jnp.minimum(ks[1], ks[3]))
    # keys are unique, so equality pins the chosen slot
    slot = jnp.full((h, w), -1, jnp.int32)
    for s in range(4):
        slot = jnp.where(node_key == ks[s], s, slot)

    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    parent2 = ids2
    for s, (dv, du) in enumerate(_SLOT_OFF):
        parent2 = jnp.where(slot == s, shift2(ids2, dv, du, 0), parent2)
    # 2-cycle: my neighbor chose the reverse slot back to me
    two = jnp.zeros((h, w), jnp.bool_)
    for s, (dv, du) in enumerate(_SLOT_OFF):
        nbr_slot = shift2(slot, dv, du, -1)
        two = two | ((slot == s) & (nbr_slot == _REV_SLOT[s]))
    parent2 = jnp.where(two & (parent2 > ids2), ids2, parent2)

    # an edge joins the MST iff either endpoint chose it
    e_r = (slot == 0)[:, : w - 1] | (slot == 2)[:, 1:]
    e_d = (slot == 1)[: h - 1, :] | (slot == 3)[1:, :]
    in_mst = jnp.concatenate([e_r.reshape(-1), e_d.T.reshape(-1)])

    # first pointer jump as plane math (parents are grid neighbors:
    # parent2[parent2] = parent2-at-the-chosen-neighbor), halving chain
    # length before the gather-based jumps
    pj = parent2
    for s, (dv, du) in enumerate(_SLOT_OFF):
        m = (slot == s) & (parent2 != ids2)
        pj = jnp.where(m, shift2(parent2, dv, du, 0), pj)
    comp = _jump_to_root(pj.reshape(-1))
    return comp, in_mst


def _grid_round_body(wr, wd, eu, ev, idx_bits):
    """One grid-space Borůvka round (the round_body of boruvka_mst,
    factored so the contracted variant can reuse it)."""
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    e = eu.shape[0]
    big_w = jnp.int32(2**31 - 1)
    big_i = jnp.int32(e)
    eidx_r = jnp.arange(h * (w - 1), dtype=jnp.int32).reshape(h, w - 1)
    eidx_d = (h * (w - 1)
              + jnp.arange(w * (h - 1), dtype=jnp.int32).reshape(w, h - 1).T)
    key_r = (wr << idx_bits) | eidx_r
    key_d = (wd << idx_bits) | eidx_d

    def round_body(state):
        comp, in_mst = state
        c2 = comp.reshape(h, w)
        alive_r = c2[:, :-1] != c2[:, 1:]
        alive_d = c2[:-1, :] != c2[1:, :]
        kr = jnp.where(alive_r, key_r, big_w)
        kd = jnp.where(alive_d, key_d, big_w)
        node_key = jnp.minimum(
            jnp.minimum(jnp.pad(kr, ((0, 0), (0, 1)), constant_values=big_w),
                        jnp.pad(kr, ((0, 0), (1, 0)), constant_values=big_w)),
            jnp.minimum(jnp.pad(kd, ((0, 1), (0, 0)), constant_values=big_w),
                        jnp.pad(kd, ((1, 0), (0, 0)), constant_values=big_w)))
        minkey = jax.ops.segment_min(node_key.reshape(-1), comp,
                                     num_segments=n)
        mine = jnp.where(minkey < big_w, minkey & ((1 << idx_bits) - 1),
                         big_i)
        has = mine < big_i
        sel = jnp.clip(mine, 0, e - 1)
        # per-edge endpoint labels as plane shifts (see boruvka_mst)
        cu_e = jnp.concatenate([c2[:, :-1].reshape(-1),
                                c2[:-1, :].T.reshape(-1)])
        cv_e = jnp.concatenate([c2[:, 1:].reshape(-1),
                                c2[1:, :].T.reshape(-1)])
        cuv = jnp.stack([cu_e, cv_e], 1)[sel]
        other = jnp.where(cuv[:, 0] == jnp.arange(n, dtype=jnp.int32),
                          cuv[:, 1], cuv[:, 0])
        parent = jnp.where(has, other, jnp.arange(n, dtype=jnp.int32))
        two_cycle = parent[parent] == jnp.arange(n, dtype=jnp.int32)
        parent = jnp.where(
            two_cycle & (parent > jnp.arange(n, dtype=jnp.int32)),
            jnp.arange(n, dtype=jnp.int32), parent)
        mark = (has & (parent != jnp.arange(n, dtype=jnp.int32))
                ).astype(jnp.int32)
        chosen = jnp.zeros((e,), jnp.int32).at[sel].max(mark, mode="drop")
        in_mst = in_mst | (chosen > 0)
        parent = _jump_to_root(parent)
        return (parent[comp], in_mst)

    return round_body


def _compact_round_body(euv, valid, c_cap: int):
    """One Borůvka round on a contracted simple graph (rows = tie order).

    Returns (comp2', chosen_rows): chosen_rows is [c_cap] int32 row ids
    whose edge joined the MST this round (sentinel e_cap elsewhere) — the
    caller scatters ALL rounds' rows at once, saving a per-round scatter.
    """
    e_cap = euv.shape[0]
    big = jnp.int32(e_cap)
    iota_c = jnp.arange(c_cap, dtype=jnp.int32)

    def body(comp2):
        cuv = comp2[euv.reshape(-1)].reshape(e_cap, 2)
        cu, cv = cuv[:, 0], cuv[:, 1]
        alive = valid & (cu != cv)
        key = jnp.where(alive, jnp.arange(e_cap, dtype=jnp.int32), big)
        minrow = jnp.full((c_cap,), big, jnp.int32).at[
            jnp.concatenate([cu, cv])].min(jnp.concatenate([key, key]),
                                           mode="drop")
        has = minrow < big
        rows = jnp.where(has, minrow, 0)
        w_uv = cuv[rows]
        other = jnp.where(w_uv[:, 0] == iota_c, w_uv[:, 1], w_uv[:, 0])
        parent = jnp.where(has, other, iota_c)
        two_cycle = parent[parent] == iota_c
        parent = jnp.where(two_cycle & (parent > iota_c), iota_c, parent)
        mark = has & (parent != iota_c)
        chosen_rows = jnp.where(mark, minrow, big)
        parent = _jump_to_root(parent)
        return parent[comp2], chosen_rows

    return body


def build_tree(image: jnp.ndarray, prefilter: bool = True,
               row_axis: str = None, neighbors: int = 4) -> RootedTree:
    """Full pipeline: image -> edge weights -> Borůvka -> rooted tree.

    ``row_axis``: distribute each Borůvka round's segment-min over row
    bands of that mesh axis (see :func:`boruvka_mst`).
    ``neighbors``: 4 (default) or 8 — the reference's selectable edge
    mode (qx_mst_kruskals_image.h:12,37); 8 adds the two diagonal edges
    per cell and is served by the plain (non-contracted) Borůvka."""
    if neighbors == 8:
        wr, wd, wdr, wdl = grid_edge_weights8(image, prefilter)
        in_mst = boruvka_mst8(wr, wd, wdr, wdl)
        return root_tree(in_mst, wr, wd, diag=(wdr, wdl))
    wr, wd = grid_edge_weights(image, prefilter)
    h, w = wr.shape[0], wr.shape[1] + 1
    if row_axis is None and h * w >= 1 << 12:
        in_mst = boruvka_mst_contracted(wr, wd)
    else:
        in_mst = boruvka_mst(wr, wd, row_axis)
    return root_tree(in_mst, wr, wd)


def build_tree_batch(images: jnp.ndarray,
                     prefilter: bool = True) -> RootedTree:
    """B frames -> ONE RootedTree forest over the stacked [B*h, w] grid.

    Per-frame parents/weights are bit-identical to :func:`build_tree` on
    each frame alone: the inter-frame boundary down-edges get weight 256,
    so in the global Kruskal tie order every intra-frame edge (weight <=
    255) precedes every cross edge — by the cut property each frame's MST
    is exactly its standalone MST, and the B-1 cross edges (used only to
    connect finished frames) are stripped after the build. All Borůvka
    rounds, peeling, and tour ranking then run ONCE for the whole batch,
    amortizing the per-round latency floors across frames.
    """
    b, h, w = images.shape[:3]
    wrs, wds = jax.vmap(lambda im: grid_edge_weights(im, prefilter))(images)
    wr = wrs.reshape(b * h, w - 1)
    wd = jnp.concatenate(
        [wds, jnp.full((b, 1, w), 256, wds.dtype)], axis=1
    ).reshape(b * h, w)[: b * h - 1]
    in_mst = boruvka_mst_contracted(wr, wd)
    # strip the cross edges (their rows are known: k*h - 1)
    hh = b * h
    e_r = in_mst[: hh * (w - 1)]
    e_d = in_mst[hh * (w - 1):].reshape(w, hh - 1).T    # [(B*h-1), W]
    keep = (jnp.arange(hh - 1, dtype=jnp.int32) % h) != (h - 1)
    e_d = e_d & keep[:, None]
    in_mst = jnp.concatenate([e_r, e_d.T.reshape(-1)])
    return root_tree(in_mst, wr, wd, frame_h=h)


def tree_filter(tree: RootedTree, values: jnp.ndarray, sigma: float = 0.1,
                peels: int = 20, compute_dtype=None,
                neighbors: int = 4) -> jnp.ndarray:
    """Two-pass MST filter (qx_tree_filter.cpp:61-117), peel-structured.

    values: [N, D] (or [N]) per-node vectors. Similarity per node-parent
    edge: sim = exp(-weight / (255*sigma)) (update_table cpp:21-25).

    Up pass  S^(p) = C(p) + sum_children sim_c * S^(c); down pass
    S(c) = sim_c * S(parent(c)) + (1 - sim_c^2) * S^(c).

    Tree edges are GRID edges (the tree comes from the image MST), so the
    recurrences run in peel order as pure plane math: each peel round
    finalizes the current leaves (their children are already final) and
    pushes sim*S^ into the parent plane via 4 masked shifts — no gathers.
    ~80% of nodes finalize in ``peels`` rounds at Teddy scale; only the
    surviving CORE runs the pointer-doubling rounds (segment-sum + fused
    gather per round), compacted 3x behind a lax.cond (the full-size
    branch keeps adversarial path-shaped trees correct). The down pass
    mirrors it: core doubling, then reverse-order peel rounds.

    Supports multi-root forests (e.g. the L/R two-tree fusion in
    ops/nl.py): roots never peel and keep sim = 0. Float association
    differs from the pure-doubling form by round order (documented
    tolerance in tests; disparities are tie-budgeted vs the reference).

    Set MYSM_NO_TREEPEEL=1 to restore the pure pointer-doubling path.
    """
    n = tree.parent.shape[0]
    peels = int(os.environ.get("MYSM_TREEPEELS", peels))
    squeeze = values.ndim == 1
    x = values[:, None] if squeeze else values
    sim = jnp.exp(-tree.weight.astype(jnp.float32) / (255.0 * max(sigma, 0.01)))
    # roots climb nowhere (parent == self). Supporting ANY root set makes
    # this work on forests — e.g. two trees laid side by side filter in
    # one set of doubling rounds (disjoint segments keep every per-node
    # sum bit-identical to filtering each tree alone).
    is_root = tree.parent == jnp.arange(n)
    sim = jnp.where(is_root, 0.0, sim)
    try:                       # shape is traced when the tree crosses a
        h, w = (int(tree.shape[0]), int(tree.shape[1]))  # jit boundary
    except (TypeError, jax.errors.TracerIntegerConversionError):
        h = w = 0
    # small problems skip the peel path: its per-round plane pushes are
    # UNROLLED (fori measured 1.8x slower on TPU at frame scale), which
    # at tiny n is pure compiled-program size for no runtime win — the
    # dryrun/test-scale NL program carried 3 filters x 40 unrolled rounds
    # and the XLA CPU compile blew past the driver's multichip-gate
    # budget (VERDICT r4 item 1)
    if (peels > 0 and n > _COND_MIN_N and h * w == n
            and not os.environ.get("MYSM_NO_TREEPEEL")):
        out = _tree_filter_peeled(tree.parent, sim, x, h, w, peels,
                                  compute_dtype=compute_dtype,
                                  neighbors=neighbors)
        return out[:, 0] if squeeze else out
    return _tree_filter_doubling(tree.parent, sim, x, squeeze)


def _tree_filter_doubling(parent: jnp.ndarray, sim: jnp.ndarray,
                          x: jnp.ndarray, squeeze: bool) -> jnp.ndarray:
    """Pure pointer-doubling two-pass filter (any functional tree).

    Up pass: S^ = (I - M)^-1 C with M nilpotent, solved as
    prod_i (I + M^(2^i)) C — each doubling round is one segment-sum over
    2^i-th ancestors. Down pass: same doubling with pure gathers.
    """
    n = parent.shape[0]
    is_root = parent == jnp.arange(n)

    # Doubling rounds run until every path product has crossed the root
    # (sim[root] = 0 makes wt exactly 0 there), i.e. 2^k >= tree height —
    # typically far fewer than the static log2(N) worst case.
    # (wt, par) ride in one fused per-round gather — TPU gather cost is
    # ~width-independent, so 2-3 gathers/round collapse to 1 (par fits f32
    # exactly: n < 2^24 even at full-res 2014)
    def up_body(state):
        s_up, wt, par = state
        contrib = jax.ops.segment_sum(wt[:, None] * s_up, par, num_segments=n)
        wp = jnp.concatenate([wt[:, None],
                              par.astype(jnp.float32)[:, None]], 1)[par]
        return s_up + contrib, wt * wp[:, 0], wp[:, 1].astype(jnp.int32)

    def live(state):
        return jnp.any(state[1] > 0.0)

    s_up, _, _ = jax.lax.while_loop(
        live, up_body, (x.astype(jnp.float32), sim, parent))

    # down pass: S = sim * S(parent) + (1 - sim^2) * S_up, S(root) = S_up(root)
    b = (1.0 - sim * sim)[:, None] * s_up
    b = jnp.where(is_root[:, None], s_up, b)

    def down_body(state):
        s, wt, par = state
        packed = jnp.concatenate(
            [s, wt[:, None], par.astype(jnp.float32)[:, None]], 1)[par]
        return (s + wt[:, None] * packed[:, :-2], wt * packed[:, -2],
                packed[:, -1].astype(jnp.int32))

    s, _, _ = jax.lax.while_loop(live, down_body, (b, sim, parent))
    return s[:, 0] if squeeze else s


def _tree_filter_peeled(parent: jnp.ndarray, sim: jnp.ndarray,
                        x: jnp.ndarray, h: int, w: int,
                        peels: int, compute_dtype=None,
                        neighbors: int = 4) -> jnp.ndarray:
    """Peel-structured two-pass filter over a grid tree/forest.

    parent: [N] grid-neighbor parents (roots self); sim: [N] with 0 at
    roots; x: [N, D]. See :func:`tree_filter` for the algorithm sketch.

    ``compute_dtype``: dtype of the bandwidth-heavy PEEL phases (the
    [H,W,D] plane pushes). bfloat16 halves their HBM traffic at ~0.4%
    relative accumulate error — the documented-approximate NL fast mode.
    The compacted CORE doubling stays float32 regardless (its fused
    gathers pack parent ids into float columns, which bf16's 8-bit
    mantissa cannot hold).
    """
    n, d = x.shape
    cdt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    p2 = parent.reshape(h, w)
    delta = p2 - ids2
    is_root2 = delta == 0

    def shift2(v, dv, du):
        """Value at the (dv, du)-neighbor; zero/False past the border."""
        fill = False if v.dtype == jnp.bool_ else 0
        pad = ((max(0, -dv), max(0, dv)), (max(0, -du), max(0, du)))
        if v.ndim == 3:
            pad = pad + ((0, 0),)
        p = jnp.pad(v, pad, constant_values=fill)
        return p[pad[0][0] + dv: pad[0][0] + dv + h,
                 pad[1][0] + du: pad[1][0] + du + w]

    # static tree-structure masks: parent direction / children directions
    slot_off = _SLOT_OFF8 if neighbors == 8 else _SLOT_OFF
    rev_slot = _REV_SLOT8 if neighbors == 8 else _REV_SLOT
    offs = {s: dv * w + du for s, (dv, du) in enumerate(slot_off)}
    par_slot = [(~is_root2) & (delta == offs[s]) for s in range(len(slot_off))]
    # node has a child at direction s iff the s-neighbor's parent slot
    # points back (reverse slot)
    child = [shift2(par_slot[rev_slot[s]], dv, du)
             for s, (dv, du) in enumerate(slot_off)]

    simp = sim.reshape(h, w).astype(cdt)
    simv = [shift2(simp, dv, du)[..., None]            # sim of s-child edge
            for s, (dv, du) in enumerate(slot_off)]

    # --- up pass, peel phase: backend-sized unroll (round 5). On the
    # REAL chip the rounds are fully unrolled — rolling them into a
    # fori_loop costs ~20 ms/frame at Teddy scale (measured 131 vs 112
    # ms, and chunked unrolls of 5 or 10 rounds per fori body measure the
    # SAME as 1 — the loop itself, not lost cross-round fusion, is the
    # penalty), and the axon service caches compiled executables
    # server-side (CLAUDE.md) so the bigger program compiles once. Under
    # local XLA (tests, dryrun, compile table) the unroll is program-size
    # poison in the fusion passes (nl config compile 190 s unrolled vs
    # 47 s rolled) with no runtime stake — rounds roll into a fori over
    # MYSM_TREEPEEL_CHUNK-round bodies. A peel-ROUND-INDEX carry replaces
    # round-3's stacked leaf masks (their copies measured 36 vs 20 ms);
    # the down pass recomputes each round's mask as (peel_rnd == r).
    # MYSM_TREEPEEL_UNROLL=1/0 overrides the backend default for A/B.
    from mystereomatching_tpu.ops import pallas_kernels as pk

    V = x.astype(cdt).reshape(h, w, d)
    zb = (parent[0] == parent[0]) & False  # varying False (shard_map VMA)
    alive = jnp.ones((h, w), jnp.bool_) | zb
    env_unroll = os.environ.get("MYSM_TREEPEEL_UNROLL")
    unroll = (pk.tpu_backend() if env_unroll in (None, "")
              else env_unroll not in ("0",))
    chunk = peels if unroll else min(
        peels, int(os.environ.get("MYSM_TREEPEEL_CHUNK", "5")))
    n_ch = -(-peels // chunk)
    peel_rnd = jnp.full((h, w), -1, jnp.int32) + zb.astype(jnp.int32)

    def up_round(r, state):
        V, alive, peel_rnd = state
        has_child = jnp.zeros((h, w), jnp.bool_)
        for s, (dv, du) in enumerate(slot_off):
            has_child = has_child | (child[s] & shift2(alive, dv, du))
        leaf = alive & ~is_root2 & ~has_child
        leaf = leaf & (r < peels)      # chunk padding: no extra rounds
        peel_rnd = jnp.where(leaf, r, peel_rnd)
        # push finalized children into parents (slot order R, D, L, U)
        for s, (dv, du) in enumerate(slot_off):
            m = child[s] & shift2(leaf, dv, du)
            V = V + jnp.where(m[..., None], simv[s] * shift2(V, dv, du),
                              0.0)
        return V, alive & ~leaf, peel_rnd

    def up_chunk(i, state):
        for j in range(chunk):
            state = up_round(i * chunk + j, state)
        return state

    if unroll:
        state = (V, alive, peel_rnd)
        for r in range(peels):
            state = up_round(r, state)
        V, alive, peel_rnd = state
    else:
        V, alive, peel_rnd = jax.lax.fori_loop(
            0, n_ch, up_chunk, (V, alive, peel_rnd))

    # --- up + down on the core (pointer doubling, compacted 3x if the
    # live count allows; full-size branch for path-shaped trees) ---
    core = alive.reshape(-1)
    # core-doubling cost is linear in the STATIC cap (segment-sum +
    # gather rows); ~16% of nodes survive 20 peels on natural/synthetic
    # images, so n/5 holds the live core with margin — path-shaped trees
    # fall through to the exact full-size branch. Small problems trace
    # ONE full-size branch (_COND_MIN_N); cid is hoisted out of the cond.
    cap_fast = max(64, n // int(os.environ.get("MYSM_FILTER_CORE_DIV",
                                               "5")))
    flat = V.reshape(n, d).astype(jnp.float32)       # core doubling: f32
    cid = _cumsum_flat(core.astype(jnp.int32)) - 1
    if n <= _COND_MIN_N:
        up_full, down_full = _filter_core(flat, sim, parent, core, cid, n)
    else:
        cnt = jnp.sum(core.astype(jnp.int32))
        up_full, down_full = jax.lax.cond(
            cnt <= cap_fast,
            lambda: _filter_core(flat, sim, parent, core, cid, cap_fast),
            lambda: _filter_core(flat, sim, parent, core, cid, n))
    # S_up stays valid for peeled nodes; core rows updated
    V_up = jnp.where(core[:, None], up_full.astype(cdt),
                     V.reshape(n, d)).reshape(h, w, d)
    S = jnp.where(core[:, None], down_full.astype(cdt),
                  V.reshape(n, d)).reshape(h, w, d)

    # --- down pass, reverse peel order: S = sim*S(parent) + (1-sim^2)*S^ ---
    fac = (1.0 - simp * simp)[..., None]

    def down_round(i, S):
        # (i < peels) guard: chunk padding must not touch the unpeeled
        # core, whose peel_rnd is -1 == peels - 1 - i at i == peels
        leaf = (peel_rnd == (peels - 1 - i)) & (i < peels)
        upd = jnp.zeros((h, w, d), cdt)
        for s, (dv, du) in enumerate(slot_off):
            m = leaf & par_slot[s]
            upd = upd + jnp.where(m[..., None],
                                  simp[..., None] * shift2(S, dv, du), 0.0)
        return jnp.where(leaf[..., None], upd + fac * V_up, S)

    def down_chunk(c, S):
        for j in range(chunk):
            S = down_round(c * chunk + j, S)
        return S

    if unroll:
        for i in range(peels):
            S = down_round(i, S)
    else:
        S = jax.lax.fori_loop(0, n_ch, down_chunk, S)
    return S.reshape(n, d).astype(jnp.float32)


def _filter_core(flat: jnp.ndarray, sim: jnp.ndarray, parent: jnp.ndarray,
                 core: jnp.ndarray, cid: jnp.ndarray, cap: int):
    """Doubling up+down passes on the core rows, compacted to ``cap``.

    flat: [N, D] accumulated values (peeled subtree sums already pushed
    into their core attachment points); core: [N] bool; cid: [N] compact
    ids (inclusive cumsum of core, minus 1 — hoisted to the caller so the
    fast/full cond branches share it). A core node's parent is core
    (aliveness is monotone toward the root), so the compacted doubling
    never leaves the core. Returns (up, down) [N, D] — valid at core
    rows only.
    """
    n, d = flat.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    # sort-based compaction (round 5): one lax.sort by compact id beats
    # the former [n]-row scatter at the ~6.5 ns/row latency floor
    keyo = jnp.where(core, cid, n)
    key_s, oldid = jax.lax.sort((keyo, iota), num_keys=1)
    if cap <= n:
        key_s, oldid = key_s[:cap], oldid[:cap]
    else:
        key_s = jnp.concatenate([key_s, jnp.full((cap - n,), n, jnp.int32)])
        oldid = jnp.concatenate([oldid, jnp.zeros((cap - n,), jnp.int32)])
    row_ok = key_s < n
    oldid = jnp.where(row_ok, oldid, n)
    src = jnp.where(row_ok, oldid, 0)
    xc = jnp.where(row_ok[:, None], flat[src], 0.0)     # [cap, D]
    simc = jnp.where(row_ok, sim[src], 0.0)
    parc = jnp.where(row_ok, cid[parent[src]], jnp.arange(cap))
    is_root_c = parc == jnp.arange(cap)

    def up_body(state):
        s_up, wt, par = state
        contrib = jax.ops.segment_sum(wt[:, None] * s_up, par,
                                      num_segments=cap)
        wp = jnp.concatenate([wt[:, None],
                              par.astype(jnp.float32)[:, None]], 1)[par]
        return s_up + contrib, wt * wp[:, 0], wp[:, 1].astype(jnp.int32)

    def live(state):
        return jnp.any(state[1] > 0.0)

    s_up, _, _ = jax.lax.while_loop(live, up_body, (xc, simc, parc))

    b = (1.0 - simc * simc)[:, None] * s_up
    b = jnp.where(is_root_c[:, None], s_up, b)

    def down_body(state):
        s, wt, par = state
        packed = jnp.concatenate(
            [s, wt[:, None], par.astype(jnp.float32)[:, None]], 1)[par]
        return (s + wt[:, None] * packed[:, :-2], wt * packed[:, -2],
                packed[:, -1].astype(jnp.int32))

    s, _, _ = jax.lax.while_loop(live, down_body, (b, simc, parc))

    # scatter core rows back to full size (cap rows, one scatter each)
    up_full = jnp.zeros((n, d), jnp.float32).at[oldid].set(s_up, mode="drop")
    down_full = jnp.zeros((n, d), jnp.float32).at[oldid].set(s, mode="drop")
    return up_full, down_full
