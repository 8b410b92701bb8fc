"""Finer cumulative cuts through boruvka_mst_contracted: each cascade
level's compact rounds and dedup, the finish rounds, and the unwind —
to locate the post-phase-2 fat (round-4)."""
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

REPS = 6

def timed(name, f, *a):
    g = jax.jit(f)
    out = g(*a); _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*a); _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4].astype(jnp.float32)))
    print(json.dumps({"op": name, "ms": round((time.perf_counter()-t0)/REPS*1e3 - 25, 2)}), flush=True)

h, w = wr.shape[0], wr.shape[1] + 1
n = h * w
eu, ev, ew = M._flatten_edges(wr, wd)
e = eu.shape[0]
idx_bits = max(20, int(e).bit_length())
wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)
r1 = 2
c_cap0 = n >> r1


def upto(stop_level=None, do_finish=False, do_unwind=False, casc_r=2,
         casc_stop=1024):
    """Copy of boruvka_mst_contracted with early exit knobs."""
    def f(wr, wd):
        state = M._grid_round1(wr, wd, idx_bits)
        body = M._grid_round_body(wr, wd, eu, ev, idx_bits)
        for _ in range(r1 - 1):
            state = body(state)
        comp, in_mst = state
        iota = jnp.arange(n, dtype=jnp.int32)
        newc = M._cumsum_flat((comp == iota).astype(jnp.int32)) - 1
        comp_c = newc[comp]
        c2 = comp_c.reshape(h, w)
        cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
        cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
        eu2, ev2, key2, valid2 = M._dedup_contract(cu, cv, wkey, cu != cv,
                                                   c_cap0, 3 * c_cap0)
        euv = jnp.stack([eu2, ev2], 1)
        valid_k, key_k = valid2, key2
        c_k = c_cap0
        levels = []
        lvl = 0
        while c_k > casc_stop:
            if stop_level is not None and lvl >= stop_level:
                return euv
            e_cap_k = euv.shape[0]
            bdy = M._compact_round_body(euv, valid_k, c_k)
            comp2 = jnp.arange(c_k, dtype=jnp.int32)
            rows_k = []
            for _ in range(casc_r):
                comp2, rows = bdy(comp2)
                rows_k.append(rows)
            levels.append((rows_k, key_k, valid_k, e_cap_k))
            c_next = c_k >> casc_r
            newc2 = M._cumsum_flat((comp2 == jnp.arange(c_k, dtype=jnp.int32)).astype(jnp.int32)) - 1
            comp2_c = newc2[comp2]
            cuv2 = comp2_c[euv.reshape(-1)].reshape(-1, 2)
            eu3, ev3, key_k, valid_k = M._dedup_contract(
                cuv2[:, 0], cuv2[:, 1], jnp.arange(e_cap_k, dtype=jnp.int32),
                valid_k & (cuv2[:, 0] != cuv2[:, 1]), c_next, 3 * c_next)
            euv = jnp.stack([eu3, ev3], 1)
            c_k = c_next
            lvl += 1
        if not do_finish:
            return euv
        chosen = M._contracted_rounds(euv, valid_k, c_k)
        if not do_unwind:
            return chosen.astype(jnp.int32)
        for rows_k, key_up, valid_up, e_cap_k in reversed(levels):
            mapped = jnp.where(chosen & valid_k, key_k, e_cap_k)
            chosen = (jnp.zeros((e_cap_k,), jnp.int32)
                      .at[jnp.concatenate(rows_k + [mapped])]
                      .max(1, mode="drop") > 0)
            key_k, valid_k = key_up, valid_up
        orig = jnp.where(chosen & valid_k, key_k & ((1 << idx_bits) - 1), 0)
        in_mst2 = in_mst | jnp.zeros((e,), jnp.bool_).at[orig].max(
            chosen & valid_k, mode="drop")
        return in_mst2.astype(jnp.int32)
    return f

timed("after dedup1", upto(stop_level=0), wr, wd)
timed("after level1 (2 rounds + dedup)", upto(stop_level=1), wr, wd)
timed("after level2", upto(stop_level=2), wr, wd)
timed("after level3", upto(stop_level=3), wr, wd)
timed("all levels (stop=1024)", upto(), wr, wd)
timed("+finish rounds", upto(do_finish=True), wr, wd)
timed("+unwind (full)", upto(do_finish=True, do_unwind=True), wr, wd)
timed("full casc_r=3", upto(do_finish=True, do_unwind=True, casc_r=3), wr, wd)
timed("full stop=4096", upto(do_finish=True, do_unwind=True, casc_stop=4096), wr, wd)
