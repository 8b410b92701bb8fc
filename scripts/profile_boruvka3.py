"""Phase-level timing of boruvka_mst_contracted + root_tree on the chip.

Early-exit copies of the build: each stage jitted separately so the
cumulative wall-clock isolates round1 / grid round / dedup sorts /
cascade / unwind, and rooting's peel vs rank phases.
"""
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.ops import mst as M
import math

pair = make_synthetic_pair(h=375, w=450, max_disp=59, seed=0)
left = jnp.asarray(pair.left, jnp.float32)
wr_, wd_ = jax.jit(M.grid_edge_weights)(left)
wr = jnp.asarray(np.asarray(wr_)); wd = jnp.asarray(np.asarray(wd_))

def timed(name, f, *a, reps=5):
    g = jax.jit(f)
    out = g(*a); _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*a); _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
    print(json.dumps({"op": name, "ms": round((time.perf_counter()-t0)/reps*1e3 - 25, 2)}), flush=True)

h, w = wr.shape[0], wr.shape[1] + 1
n = h * w
eu, ev, ew = M._flatten_edges(wr, wd)
e = eu.shape[0]
idx_bits = max(20, int(e).bit_length())
wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)

def phase1(wr, wd):
    state = M._grid_round1(wr, wd, idx_bits)
    body = M._grid_round_body(wr, wd, eu, ev, idx_bits)
    state = body(state)
    return state[0]

def phase1_r1only(wr, wd):
    return M._grid_round1(wr, wd, idx_bits)[0]

timed("p1 grid_round1", phase1_r1only, wr, wd)
timed("p1 r1+round_body", phase1, wr, wd)

r1 = 2
c_cap = n >> r1

def phase2(wr, wd):
    state = M._grid_round1(wr, wd, idx_bits)
    body = M._grid_round_body(wr, wd, eu, ev, idx_bits)
    comp, in_mst = body(state)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_root = (comp == iota).astype(jnp.int32)
    newc = M._cumsum_flat(is_root) - 1
    comp_c = newc[comp]
    c2 = comp_c.reshape(h, w)
    cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
    cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
    return M._dedup_contract(cu, cv, wkey, cu != cv, c_cap, 3 * c_cap)[0]

timed("p2 +relabel+dedup1(sortE)", phase2, wr, wd)
timed("full contracted", lambda a, b: M.boruvka_mst_contracted(a, b).astype(jnp.int32), wr, wd)

in_mst = jax.jit(M.boruvka_mst_contracted)(wr, wd)
in_mst = jnp.asarray(np.asarray(in_mst))
timed("root_tree", lambda m: M.root_tree(m, wr, wd).parent, in_mst)
# rooting with peels only vs rank share
timed("root_tree peels=40", lambda m: M.root_tree(m, wr, wd, peels=40).parent, in_mst)
