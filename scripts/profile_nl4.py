"""Round-4 NL splits: root_tree peel vs rank, tree_filter peel vs core,
and the nl_tree_filter config's full stage budget."""
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.ops import mst as M

H, W, MD = 375, 450, 59
D = MD + 1
pair = make_synthetic_pair(h=H, w=W, max_disp=MD, seed=0)
left = jnp.asarray(pair.left, jnp.float32)
wr_, wd_ = jax.jit(M.grid_edge_weights)(left)
wr = jnp.asarray(np.asarray(wr_)); wd = jnp.asarray(np.asarray(wd_))
in_mst = jnp.asarray(np.asarray(jax.jit(M.boruvka_mst_contracted)(wr, wd)))

REPS = 6
def timed(name, f, *a):
    g = jax.jit(f)
    out = g(*a)
    _ = float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*a)
        _ = float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).ravel()[:4]))
    print(json.dumps({"op": name, "ms": round((time.perf_counter()-t0)/REPS*1e3-25, 2)}), flush=True)

n = H * W

# --- rooting splits: peel-only (stop before phase 2) ---
def peel_only(mask):
    # replicate root_tree phase 1 and return alive count + parents
    h, w = H, W
    slots = M._slot_masks(mask, h, w)
    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    def shift2(x, dv, du, fill):
        pv0, pv1 = max(0, -dv), max(0, dv)
        pu0, pu1 = max(0, -du), max(0, du)
        p = jnp.pad(x, ((pv0, pv1), (pu0, pu1)), constant_values=fill)
        return p[pv0+dv:pv0+dv+h, pu0+du:pu0+du+w]
    wr_p = jnp.pad(wr, ((0, 0), (0, 1)))
    wl_p = jnp.pad(wr, ((0, 0), (1, 0)))
    wd_p = jnp.pad(wd, ((0, 1), (0, 0)))
    wu_p = jnp.pad(wd, ((1, 0), (0, 0)))
    wplane_st = jnp.stack([wr_p, wd_p, wl_p, wu_p])
    nbr_st = jnp.stack([shift2(ids2, dv, du, 0) for dv, du in M._SLOT_OFF])
    roots2 = (jnp.arange(h)[:, None] == 0) & (jnp.arange(w)[None, :] == 0)
    alive = jnp.ones((h, w), jnp.bool_)
    notroot = ~roots2
    parent2 = ids2
    weight2 = jnp.zeros((h, w), jnp.int32)
    def peel_round(_, state):
        alive, parent2, weight2 = state
        ea = [slots[s] & shift2(alive, dv, du, False)
              for s, (dv, du) in enumerate(M._SLOT_OFF)]
        deg = sum(e.astype(jnp.int32) for e in ea)
        leaf = alive & notroot & (deg == 1)
        for s in range(4):
            pm = leaf & ea[s]
            parent2 = jnp.where(pm, nbr_st[s], parent2)
            weight2 = jnp.where(pm, wplane_st[s], weight2)
        return alive & ~leaf, parent2, weight2
    alive, parent2, weight2 = jax.lax.fori_loop(0, 20, peel_round,
                                                (alive, parent2, weight2))
    return alive.astype(jnp.int32)

timed("root: peel20 only", peel_only, in_mst)
alive = jax.jit(peel_only)(in_mst)
print(json.dumps({"core_nodes_after_20_peels": int(np.asarray(alive).sum()),
                  "n": n}), flush=True)
timed("root: full (peels=20)", lambda m: M.root_tree(m, wr, wd).parent, in_mst)

# --- filter splits ---
tree = M.root_tree(in_mst, wr, wd)
tree = M.RootedTree(jnp.asarray(np.asarray(tree.parent)),
                    jnp.asarray(np.asarray(tree.weight)), (H, W))
vals = jnp.asarray(np.random.default_rng(0).random((n, D + 1)), jnp.float32)

timed("filter: full (peels=12)", lambda v: M.tree_filter(tree, v, 0.1), vals)
timed("filter: peels=20", lambda v: M.tree_filter(tree, v, 0.1, peels=20), vals)
timed("filter: doubling only", lambda v: M._tree_filter_doubling(
    tree.parent, jnp.where(tree.parent == jnp.arange(n), 0.0,
                           jnp.exp(-tree.weight.astype(jnp.float32) / 25.5)),
    v, False), vals)

# core size for filter peels=12
def core12(mask):
    p2 = tree.parent.reshape(H, W)
    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    delta = p2 - ids2
    is_root2 = delta == 0
    def shift2(v, dv, du):
        pad = ((max(0, -dv), max(0, dv)), (max(0, -du), max(0, du)))
        p = jnp.pad(v, pad, constant_values=False)
        return p[pad[0][0]+dv:pad[0][0]+dv+H, pad[1][0]+du:pad[1][0]+du+W]
    offs = {0: 1, 1: W, 2: -1, 3: -W}
    par_slot = [(~is_root2) & (delta == offs[s]) for s in range(4)]
    child = [shift2(par_slot[M._REV_SLOT[s]], dv, du)
             for s, (dv, du) in enumerate(M._SLOT_OFF)]
    alive = jnp.ones((H, W), jnp.bool_)
    for _ in range(12):
        has_child = jnp.zeros((H, W), jnp.bool_)
        for s, (dv, du) in enumerate(M._SLOT_OFF):
            has_child = has_child | (child[s] & shift2(alive, dv, du))
        leaf = alive & ~is_root2 & ~has_child
        alive = alive & ~leaf
    return alive.astype(jnp.int32)
print(json.dumps({"filter_core_after_12_peels": int(np.asarray(jax.jit(core12)(in_mst)).sum())}), flush=True)
