"""Round-5 fine cuts of boruvka_mst_contracted: phase-1 grid rounds,
relabel, dedup1 sort, level-1 compact rounds and dedup, plus isolated
lax.sort costs at the two sizes — to decide where the NL >=150 lever is.
"""
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.ops import mst as M

pair = make_synthetic_pair(h=375, w=450, max_disp=59, seed=0)
left = jnp.asarray(pair.left, jnp.float32)
wr_, wd_ = jax.jit(M.grid_edge_weights)(left)
wr = jnp.asarray(np.asarray(wr_)); wd = jnp.asarray(np.asarray(wd_))
h, w = wr.shape[0], wr.shape[1] + 1
n = h * w
eu, ev, ew = M._flatten_edges(wr, wd)
e = eu.shape[0]
idx_bits = max(20, int(e).bit_length())
wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)
r1 = 2
c_cap = max(n >> (r1 + 1), 64)
REPS = 8


def timed(name, f, *a):
    g = jax.jit(f)
    out = g(*a)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = g(*a)
        _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0 - 0.025) / REPS)
    print(json.dumps({"op": name, "ms": round(min(ts) * 1e3, 2)}), flush=True)


def phase1(wr, wd):
    state = M._grid_round1(wr, wd, idx_bits)
    body = M._grid_round_body(wr, wd, eu, ev, idx_bits)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def more(st):
        comp, _, i = st
        cnt = jnp.sum((comp == iota_n).astype(jnp.int32))
        return (i < r1 - 1) | ((i < r1) & (cnt > c_cap))

    def step(st):
        comp, in_mst, i = st
        comp, in_mst = body((comp, in_mst))
        return comp, in_mst, i + 1

    comp, in_mst, _ = jax.lax.while_loop(more, step, state + (state[0][0] * 0,))
    return comp, in_mst


def relabel(comp):
    iota = jnp.arange(n, dtype=jnp.int32)
    newc = M._cumsum_flat((comp == iota).astype(jnp.int32)) - 1
    comp_c = newc[comp]
    c2 = comp_c.reshape(h, w)
    cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
    cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
    return cu, cv


timed("phase1 grid rounds", lambda a, b: phase1(a, b)[0], wr, wd)
comp, in_mst = jax.jit(phase1)(wr, wd)
comp = jnp.asarray(np.asarray(comp))
timed("relabel+edge labels", lambda c: relabel(c)[0], comp)
cu, cv = jax.jit(relabel)(comp)
cu = jnp.asarray(np.asarray(cu)); cv = jnp.asarray(np.asarray(cv))

e_cap1 = 3 * c_cap
timed("dedup1 (sort E=%d)" % e, lambda a, b: M._dedup_contract(
    a, b, wkey, a != b, c_cap, e_cap1)[0], cu, cv)

eu2, ev2, key2, valid2 = jax.jit(lambda a, b: M._dedup_contract(
    a, b, wkey, a != b, c_cap, e_cap1))(cu, cv)
eu2 = jnp.asarray(np.asarray(eu2)); ev2 = jnp.asarray(np.asarray(ev2))
key2 = jnp.asarray(np.asarray(key2)); valid2 = jnp.asarray(np.asarray(valid2))
euv = jnp.stack([eu2, ev2], 1)


def level1_rounds(euv, valid):
    body = M._compact_round_body(euv, valid, c_cap)
    comp2 = jnp.arange(c_cap, dtype=jnp.int32) + euv[0, 0] * 0
    rows_all = []
    for _ in range(2):
        comp2, rows = body(comp2)
        rows_all.append(rows)
    return comp2, rows_all


timed("level1: 2 compact rounds", lambda a, b: level1_rounds(a, b)[0],
      euv, valid2)
comp2, _ = jax.jit(level1_rounds)(euv, valid2)
comp2 = jnp.asarray(np.asarray(comp2))


def level1_dedup(comp2, euv, valid):
    is_root2 = (comp2 == jnp.arange(c_cap, dtype=jnp.int32)).astype(jnp.int32)
    newc2 = M._cumsum_flat(is_root2) - 1
    comp2_c = newc2[comp2]
    cuv2 = comp2_c[euv.reshape(-1)].reshape(-1, 2)
    c_next = c_cap >> 2
    return M._dedup_contract(
        cuv2[:, 0], cuv2[:, 1], jnp.arange(e_cap1, dtype=jnp.int32),
        valid & (cuv2[:, 0] != cuv2[:, 1]), c_next, 3 * c_next)[0]


timed("level1 dedup (sort %d)" % e_cap1, level1_dedup, comp2, euv, valid2)

# isolated sorts
key1 = jnp.asarray(np.random.default_rng(0).integers(0, 2**30, e), jnp.int32)
pay = jnp.arange(e, dtype=jnp.int32)
timed("bare lax.sort 335k 1key+1pay", lambda k, p: jax.lax.sort((k, p), num_keys=1)[0], key1, pay)
key3 = key1[:e_cap1]
timed("bare lax.sort 63k 3arr", lambda k, p: jax.lax.sort((k, p[:e_cap1], p[:e_cap1]), num_keys=2)[0], key3, pay)
# full build for reference
timed("boruvka_mst_contracted", lambda a, b: M.boruvka_mst_contracted(a, b), wr, wd)
timed("root_tree", lambda m_, a, b: M.root_tree(m_, a, b).parent, in_mst, wr, wd)
