"""Phase-level on-chip profile of boruvka_mst_contracted (ops/mst.py).

Times each phase of the contracted build separately at Teddy scale using
the factored helpers, chained reps inside one jit (tunnel dispatch ~25ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_boruvka.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu.ops import mst as M

H, W = 375, 450
REPS = 10


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4]))
    dt = (time.perf_counter() - t0 - 0.025) / REPS
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    r = np.random.default_rng(0)
    img = jnp.asarray(np.clip(r.normal(128, 40, (H, W, 3)), 0, 255),
                      jnp.float32)
    wr, wd = jax.jit(M.grid_edge_weights)(img)
    wr = jnp.asarray(jax.device_get(wr))
    wd = jnp.asarray(jax.device_get(wd))
    h, w = H, W
    n = h * w
    eu, ev, ew = (jnp.asarray(jax.device_get(x))
                  for x in jax.jit(M._flatten_edges)(wr, wd))
    e = eu.shape[0]
    idx_bits = max(20, int(e).bit_length())
    wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)

    def mix_w(wr, x):
        eps = jnp.minimum(jnp.asarray(x, jnp.int32).ravel()[0] & 0, 0)
        return jnp.minimum(wr + eps, 255)

    # phase 1a: special round 1
    def p1a(wr, wd):
        out = M._grid_round1(wr, wd, idx_bits)[0]
        for _ in range(REPS - 1):
            out = M._grid_round1(mix_w(wr, out), wd, idx_bits)[0]
        return out
    timed("phase1a grid_round1", p1a, wr, wd)

    # phase 1b: one generic grid round
    st0 = jax.jit(lambda a, b: M._grid_round1(a, b, idx_bits))(wr, wd)
    body = M._grid_round_body(wr, wd, eu, ev, idx_bits)

    def p1b(comp, in_mst):
        c, m = comp, in_mst
        for _ in range(REPS):
            c, m = body((jnp.minimum(c + (m.astype(jnp.int32)[0] & 0), n), m))
        return c
    timed("phase1b grid_round_body", p1b, st0[0], st0[1])

    st1 = jax.jit(lambda c, m: body((c, m)))(st0[0], st0[1])
    comp, in_mst = st1

    # phase 2: dense relabel + dedup contract
    c_cap = n >> 2
    e_cap1 = 3 * c_cap

    def p2(comp):
        out = None
        c = comp
        for _ in range(REPS):
            iota = jnp.arange(n, dtype=jnp.int32)
            is_root = (c == iota).astype(jnp.int32)
            newc = M._cumsum_flat(is_root) - 1
            comp_c = newc[c]
            c2 = comp_c.reshape(h, w)
            cu = jnp.concatenate([c2[:, :-1].reshape(-1),
                                  c2[:-1, :].T.reshape(-1)])
            cv = jnp.concatenate([c2[:, 1:].reshape(-1),
                                  c2[1:, :].T.reshape(-1)])
            out = M._dedup_contract(cu, cv, wkey, cu != cv, c_cap, e_cap1)
            c = jnp.minimum(c + (out[0].ravel()[0] & 0), n)
        return out[0]
    timed("phase2 relabel+dedup", p2, comp)

    # materialize phase-2 output
    def phase2(comp):
        iota = jnp.arange(n, dtype=jnp.int32)
        newc = M._cumsum_flat((comp == iota).astype(jnp.int32)) - 1
        c2 = newc[comp].reshape(h, w)
        cu = jnp.concatenate([c2[:, :-1].reshape(-1),
                              c2[:-1, :].T.reshape(-1)])
        cv = jnp.concatenate([c2[:, 1:].reshape(-1),
                              c2[1:, :].T.reshape(-1)])
        return M._dedup_contract(cu, cv, wkey, cu != cv, c_cap, e_cap1)
    eu2, ev2, key2, valid2 = jax.jit(phase2)(comp)
    euv = jnp.stack([eu2, ev2], 1)

    # phase 3: one compact round at e_cap1
    cbody = M._compact_round_body(euv, valid2, c_cap)

    def p3(comp2, chosen):
        c, ch = comp2, chosen
        for _ in range(REPS):
            c, ch = cbody(jnp.minimum(c + (ch.astype(jnp.int32)[0] & 0),
                                      c_cap), ch)
        return c
    timed("phase3 compact round (e_cap=3n/4)", p3,
          jnp.arange(c_cap, dtype=jnp.int32),
          jnp.zeros((e_cap1,), jnp.bool_))

    # phase 3 end state + phase 4
    comp2 = jnp.arange(c_cap, dtype=jnp.int32)
    chosen1 = jnp.zeros((e_cap1,), jnp.bool_)
    for _ in range(3):
        comp2, chosen1 = jax.jit(lambda c, m: cbody(c, m))(comp2, chosen1)

    c_cap2 = n >> 5

    def phase4_prep(comp2):
        is_root2 = (comp2 == jnp.arange(c_cap, dtype=jnp.int32)).astype(jnp.int32)
        newc2 = M._cumsum_flat(is_root2) - 1
        comp2_c = newc2[comp2]
        cu2 = comp2_c[euv.reshape(-1)].reshape(-1, 2)
        return M._dedup_contract(
            cu2[:, 0], cu2[:, 1], jnp.arange(e_cap1, dtype=jnp.int32),
            valid2 & (cu2[:, 0] != cu2[:, 1]), c_cap2, 3 * c_cap2)
    timed("phase4a second contract", lambda c: phase4_prep(c)[0], comp2)

    eu3, ev3, key3, valid3 = jax.jit(phase4_prep)(comp2)

    def p4(valid3):
        out = None
        v = valid3
        for _ in range(REPS):
            out = M._contracted_rounds(jnp.stack([eu3, ev3], 1), v, c_cap2)
            v = v & (out | True)
        return out
    timed("phase4b contracted while_loop", p4, valid3)


if __name__ == "__main__":
    main()
