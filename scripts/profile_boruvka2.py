"""Cumulative-prefix profile of boruvka_mst_contracted: where do the
~25ms unaccounted by the phase profile go?

Reimplements the function with a stop_after knob (returns a reduced
checksum of live state) and times stop_after = 1..6 chained.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_boruvka2.py
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


def boruvka_prefix(wr, wd, stop: int):
    h, w = wr.shape[0], wr.shape[1] + 1
    n = h * w
    eu, ev, ew = M._flatten_edges(wr, wd)
    e = eu.shape[0]
    idx_bits = max(20, int(e).bit_length())
    wkey = (ew << idx_bits) | jnp.arange(e, dtype=jnp.int32)

    r1 = 2
    while (n >> r1) > 46340:
        r1 += 1
    state = M._grid_round1(wr, wd, idx_bits)
    if stop == 1:
        return state[0]
    round_body = M._grid_round_body(wr, wd, eu, ev, idx_bits)
    for _ in range(r1 - 1):
        state = round_body(state)
    comp, in_mst = state
    if stop == 2:
        return comp

    c_cap = n >> r1
    iota = jnp.arange(n, dtype=jnp.int32)
    is_root = (comp == iota).astype(jnp.int32)
    newc = M._cumsum_flat(is_root) - 1
    comp_c = newc[comp]
    c2 = comp_c.reshape(h, w)
    cu = jnp.concatenate([c2[:, :-1].reshape(-1), c2[:-1, :].T.reshape(-1)])
    cv = jnp.concatenate([c2[:, 1:].reshape(-1), c2[1:, :].T.reshape(-1)])
    e_cap1 = 3 * c_cap
    eu2, ev2, key2, valid2 = M._dedup_contract(
        cu, cv, wkey, cu != cv, c_cap, e_cap1)
    if stop == 3:
        return eu2

    r2 = 2
    euv = jnp.stack([eu2, ev2], 1)
    comp2 = jnp.arange(c_cap, dtype=jnp.int32)
    chosen1 = jnp.zeros((e_cap1,), jnp.bool_)
    body = M._compact_round_body(euv, valid2, c_cap)
    for _ in range(r2):
        comp2, chosen1 = body(comp2, chosen1)
    if stop == 4:
        return comp2

    c_cap2 = n >> (r1 + r2)
    is_root2 = (comp2 == jnp.arange(c_cap, dtype=jnp.int32)).astype(jnp.int32)
    newc2 = M._cumsum_flat(is_root2) - 1
    comp2_c = newc2[comp2]
    cu2 = comp2_c[euv.reshape(-1)].reshape(-1, 2)
    eu3, ev3, key3, valid3 = M._dedup_contract(
        cu2[:, 0], cu2[:, 1], jnp.arange(e_cap1, dtype=jnp.int32),
        valid2 & (cu2[:, 0] != cu2[:, 1]), c_cap2, 3 * c_cap2)
    if stop == 5:
        return eu3

    chosen3 = M._contracted_rounds(jnp.stack([eu3, ev3], 1), valid3, c_cap2)
    if stop == 6:
        return chosen3.astype(jnp.int32)

    rows1 = jnp.where(chosen3 & valid3, key3, 0)
    lvl1 = jnp.zeros((e_cap1,), jnp.bool_).at[rows1].max(
        chosen3 & valid3, mode="drop")
    chosen1 = chosen1 | lvl1
    orig = jnp.where(chosen1 & valid2, key2 & ((1 << idx_bits) - 1), 0)
    in_mst = in_mst | jnp.zeros((e,), jnp.bool_).at[orig].max(
        chosen1 & valid2, mode="drop")
    return in_mst.astype(jnp.int32)


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

    def chain(stop):
        def f(wr, wd):
            out = boruvka_prefix(wr, wd, stop)
            for _ in range(REPS - 1):
                eps = jnp.min(out) & 0x1
                out = boruvka_prefix(jnp.minimum(wr + eps, 255), wd, stop)
            return out
        return f

    for stop in (1, 2, 3, 4, 5, 6, 7):
        timed(f"prefix stop={stop}", chain(stop), wr, wd)


if __name__ == "__main__":
    main()
