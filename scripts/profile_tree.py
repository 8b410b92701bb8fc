"""Fine-grained on-chip profile of the device tree build (ops/mst.py).

Times each internal piece of build_tree separately at Teddy scale so the
contraction work targets the real cost: edge weights / Borůvka rounds /
Euler-tour succ build / list-ranking rounds / parent extraction / filter.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_tree.py
"""

import json
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu.ops import mst as M

H, W, D = 375, 450, 60
REPS = 10


def timed(name, f, *a):
    jf = jax.jit(f)
    _ = float(jnp.sum(jnp.asarray(jf(*a), jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.asarray(jf(*a), jnp.float32).ravel()[:4]))
    dt = (time.perf_counter() - t0 - 0.025) / REPS
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def chain(op, mix=1e-9):
    """Chain REPS calls with a data dependency XLA cannot fold away.

    float x: x + 1e-9*y[0]; int x: min(x, y[0] + INT32_MAX//2) — y's values
    are small ids/weights, so the result equals x, but the compiler cannot
    prove it and must keep all reps."""
    def mixin(x, y):
        y0 = jnp.asarray(y).ravel()[:1]
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + jnp.float32(mix) * y0.astype(x.dtype)
        y0 = y0.astype(jnp.int32) + jnp.iinfo(jnp.int32).max // 2
        return jnp.minimum(x, y0.astype(x.dtype))

    def f(x, *a):
        y = op(x, *a)
        for _ in range(REPS - 1):
            y = op(mixin(x, jnp.asarray(y, jnp.float32)), *a)
        return y
    return f


def main():
    r = np.random.default_rng(0)
    img = jnp.asarray(
        np.clip(r.normal(128, 40, (H, W, 3)), 0, 255), jnp.float32)
    n = H * W

    # --- stage-level ---
    timed("edge_weights (median prefilter)",
          chain(lambda im: jnp.stack([
              jnp.pad(M.grid_edge_weights(im)[0], ((0, 0), (0, 1))),
              jnp.pad(M.grid_edge_weights(im)[1], ((0, 1), (0, 0)))])), img)
    timed("edge_weights (no prefilter)",
          chain(lambda im: M.grid_edge_weights(im, False)[0]), img)

    wr, wd = jax.jit(M.grid_edge_weights)(img)
    wr = jax.device_get(wr); wd = jax.device_get(wd)
    wr = jnp.asarray(wr); wd = jnp.asarray(wd)

    timed("boruvka", chain(lambda a, b: M.boruvka_mst(a, b), 0), wr, wd)
    in_mst = jax.jit(M.boruvka_mst)(wr, wd)

    # count rounds (host replay of the while loop conditions)
    def count_rounds():
        import numpy as onp
        comp = onp.arange(n)
        wrh = onp.asarray(wr); wdh = onp.asarray(wd)
        # just count: union by min edge per component each round
        rounds = 0
        # cheap host boruvka w/ same semantics (no tie detail needed)
        eu, ev, ew = (onp.asarray(x) for x in M._flatten_edges(wr, wd))
        while True:
            cu, cv = comp[eu], comp[ev]
            alive = cu != cv
            if not alive.any():
                break
            rounds += 1
            order = onp.lexsort((onp.arange(len(ew)), ew))
            best = {}
            for i in order:
                if alive[i]:
                    a, b = cu[i], cv[i]
                    if a not in best:
                        best[a] = i
                    if b not in best:
                        best[b] = i
            parent = onp.arange(n)
            for c, i in best.items():
                a, b = cu[i], cv[i]
                parent[c] = b if a == c else a
            for c in list(best):
                if parent[parent[c]] == c and parent[c] > c:
                    parent[c] = c  # 2-cycle: smaller label stays root
            # flatten
            for _ in range(64):
                p2 = parent[parent]
                if (p2 == parent).all():
                    break
                parent = p2
            comp = parent[comp]
        return rounds
    print(json.dumps({"op": "boruvka rounds (host replay)",
                      "rounds": count_rounds()}), flush=True)

    # --- root_tree internals (transcribed from ops/mst.py) ---
    h, w = H, W
    slots = jax.jit(M._slot_masks, static_argnums=(1, 2))(in_mst, h, w)

    def succ_build(slots):
        present = slots.reshape(4, n)
        ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)

        def shift2(x, dv, du, fill):
            pv0, pv1 = max(0, -dv), max(0, dv)
            pu0, pu1 = max(0, -du), max(0, du)
            p = jnp.pad(x, ((pv0, pv1), (pu0, pu1)), constant_values=fill)
            return p[pv0 + dv: pv0 + dv + h, pu0 + du: pu0 + du + w]

        succ = []
        for s, (dv, du) in enumerate(M._SLOT_OFF):
            rr = M._REV_SLOT[s]
            vid = shift2(ids2, dv, du, 0)
            nxt = jnp.full((h, w), -1, jnp.int32)
            for k in (4, 3, 2, 1):
                cand = (rr + k) % 4
                pres_vc = shift2(slots[cand], dv, du, False)
                nxt = jnp.where(pres_vc, vid * 4 + cand, nxt)
            succ.append(nxt.reshape(-1))
        return jnp.stack(succ, 1).reshape(4 * n)

    timed("rt: succ build",
          chain(lambda si: succ_build(si != 0)), slots.astype(jnp.int32))
    succ = jax.jit(succ_build)(slots)

    def compact(slots, succ):
        present = slots.reshape(4, n)
        pres_t = present.T
        de = 4 * n
        slot0 = jnp.argmax(pres_t[0], axis=0).astype(jnp.int32)
        e0 = slot0
        iota = jnp.arange(de, dtype=jnp.int32)
        is_edge = present.T.reshape(de)
        succ = jnp.where(succ == e0, iota, succ)
        succ = jnp.where(is_edge, succ, iota)
        live = is_edge & (succ != iota)
        nc = 2 * n
        e2 = is_edge.astype(jnp.int32).reshape(h, 4 * w)
        c2 = jnp.cumsum(e2, axis=1)
        row_tot = c2[:, -1]
        offs = jnp.cumsum(row_tot) - row_tot
        newid = (c2 + offs[:, None]).reshape(-1) - 1
        succ_new = jnp.where(live, newid[succ], -1)
        slot = jnp.where(is_edge, newid, nc)
        iota_c = jnp.arange(nc, dtype=jnp.int32)
        succ_c = jnp.full((nc,), -1, jnp.int32).at[slot].set(
            succ_new, mode="drop")
        succ_c = jnp.where(succ_c >= 0, succ_c, iota_c)
        return succ_c, newid, is_edge

    timed("rt: compact+newid",
          chain(lambda sc, s: compact(s, sc)[0]), succ, slots)
    succ_c, newid, is_edge = jax.jit(compact)(slots, succ)
    nc = 2 * n

    def rank_rounds(succ_c, nrounds):
        iota_c = jnp.arange(nc, dtype=jnp.int32)
        dist_c = jnp.where(succ_c != iota_c, 1, 0)
        st = jnp.stack([dist_c, succ_c], axis=1)
        for _ in range(nrounds):
            g = st[st[:, 1]]
            st = jnp.stack([st[:, 0] + g[:, 0], g[:, 1]], axis=1)
        return st

    full = math.ceil(math.log2(nc))
    timed(f"rt: ranking x{full}", chain(lambda s: rank_rounds(s, full)[:, 0]),
          succ_c)
    timed("rt: ranking x1", chain(lambda s: rank_rounds(s, 1)[:, 0]), succ_c)

    def parent_extract(in_mst, wr, wd, rank_slotspace):
        # everything after ranking in root_tree
        rank_nv = rank_slotspace.reshape(n, 4)
        ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
        slots_ = M._slot_masks(in_mst, h, w)
        pres_t = slots_.reshape(4, n).T

        def shift2(x, dv, du, fill):
            pv0, pv1 = max(0, -dv), max(0, dv)
            pu0, pu1 = max(0, -du), max(0, du)
            p = jnp.pad(x, ((pv0, pv1), (pu0, pu1)), constant_values=fill)
            return p[pv0 + dv: pv0 + dv + h, pu0 + du: pu0 + du + w]

        wr_p = jnp.pad(wr, ((0, 0), (0, 1))).reshape(-1)
        wl_p = jnp.pad(wr, ((0, 0), (1, 0))).reshape(-1)
        wd_p = jnp.pad(wd, ((0, 1), (0, 0))).reshape(-1)
        wu_p = jnp.pad(wd, ((1, 0), (0, 0))).reshape(-1)
        wslot = jnp.stack([wr_p, wd_p, wl_p, wu_p], 1)
        parent = jnp.arange(n, dtype=jnp.int32)
        weight = jnp.zeros((n,), jnp.int32)
        big = jnp.int32(1 << 30)
        for s, (dv, du) in enumerate(M._SLOT_OFF):
            rr = M._REV_SLOT[s]
            out_rank = rank_nv[:, s]
            in_rank = shift2(rank_nv[:, rr].reshape(h, w), dv, du, big).reshape(-1)
            t = shift2(ids2, dv, du, 0).reshape(-1)
            is_parent = pres_t[:, s] & (in_rank < out_rank)
            parent = jnp.where(is_parent, t, parent)
            weight = jnp.where(is_parent, wslot[:, s], weight)
        return parent + weight

    st = jax.jit(lambda s: rank_rounds(s, full))(succ_c)
    rank = jnp.where(is_edge, -st[newid, 0], 0)
    timed("rt: parent extract",
          chain(lambda rk, im, a, b: parent_extract(im, a, b, rk)),
          rank, in_mst, wr, wd)

    timed("root_tree total",
          chain(lambda a, im, b: M.root_tree(im != 0, a, b)[0]),
          wr, in_mst.astype(jnp.int32), wd)

    tree = jax.jit(M.root_tree)(in_mst, wr, wd)
    vals = jnp.asarray(r.random((n, D + 1)), jnp.float32)
    timed("tree_filter [N,61]",
          chain(lambda v, p, wt: M.tree_filter(
              M.RootedTree(p, wt, (h, w)), v), 1e-6),
          vals, tree.parent, tree.weight)


if __name__ == "__main__":
    main()
