"""Micro-benchmark the primitive ops that dominate the NL tree filter.

The filter (ops/mst.tree_filter) is ~24 pointer-doubling rounds of
segment_sum / fused gather over [N, D] arrays (N = 168,750 at Teddy
scale, D = 60). This prices each candidate formulation on the real chip
so the redesign is chosen from data, not guesses:

  * scatter-add (segment_sum) vs pure gather at widths 1 / 8 / 60 / 124
    -> establishes whether cost tracks rows or bytes
  * sorted/unique index hints
  * batched [2N, D] (the L+R two-tree fusion candidate)
  * grid-local round-1 via 2-D masked shifts (parents are grid neighbors)
  * lax.associative_scan over [N, D+2] (the HLD chain-scan candidate)
  * one full permutation gather (chain-order layout candidate)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_nl.py
Everything is timed via chained reps inside one jit (the tunnel adds a
flat ~25 ms per dispatch; jax.block_until_ready is a no-op under it, so
sync is via float(jnp.sum(...))).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

H, W, D = 375, 450, 60
N = H * W
REPS = 20


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out))                    # compile + settle
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0 - 0.025) / REPS   # subtract dispatch
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 3)}))
    return dt


def chain(op, x, idx):
    """REPS dependent applications inside one jit."""
    def f(x, idx):
        for i in range(REPS):
            x = op(x, idx) + 1e-9 * i          # defeat CSE
        return x
    return f


def main():
    r = np.random.default_rng(0)
    # a realistic parent array: grid tree roots at 0 (use a random
    # functional graph as a stand-in; gather cost does not care)
    par = jnp.asarray(r.integers(0, N, N), jnp.int32)
    par_sorted = jnp.sort(par)
    perm = jnp.asarray(r.permutation(N), jnp.int32)

    for d_ in (1, 8, 60, 124):
        x = jnp.asarray(r.random((N, d_)), jnp.float32)
        timed(f"gather[N,{d_}]", chain(lambda v, i: v[i], x, par), x, par)
        timed(f"segsum[N,{d_}]",
              chain(lambda v, i: jax.ops.segment_sum(v, i, num_segments=N),
                    x, par), x, par)

    x = jnp.asarray(r.random((N, D)), jnp.float32)
    timed("gather[N,60] sorted idx",
          chain(lambda v, i: v.at[i].get(indices_are_sorted=True), x,
                par_sorted), x, par_sorted)
    timed("segsum[N,60] sorted idx",
          chain(lambda v, i: jax.ops.segment_sum(
              v, i, num_segments=N, indices_are_sorted=True), x,
              par_sorted), x, par_sorted)
    timed("scatter-add at[].add [N,60]",
          chain(lambda v, i: jnp.zeros_like(v).at[i].add(v), x, par), x, par)

    x2 = jnp.asarray(r.random((2 * N, D)), jnp.float32)
    par2 = jnp.concatenate([par, par + N])
    timed("segsum[2N,60] (two trees)",
          chain(lambda v, i: jax.ops.segment_sum(v, i, num_segments=2 * N),
                x2, par2), x2, par2)

    # grid-local round-1: 4 masked shifted adds on [H, W, D]
    g = jnp.asarray(r.random((H, W, D)), jnp.float32)
    m = jnp.asarray(r.random((4, H, W, 1)), jnp.float32)

    def round1(v, m):
        out = v * 0
        out = out.at[:, :-1].add(m[0, :, 1:] * v[:, 1:])
        out = out.at[:, 1:].add(m[1, :, :-1] * v[:, :-1])
        out = out.at[:-1, :].add(m[2, 1:, :] * v[1:, :])
        out = out.at[1:, :].add(m[3, :-1, :] * v[:-1, :])
        return out

    timed("round1 grid shifts [H,W,60]", chain(round1, g, m), g, m)

    # HLD candidates: one segmented-scan-shaped assoc scan + permutation
    ab = jnp.asarray(r.random((N, D + 2)), jnp.float32)

    def assoc(v, _):
        def comb(a, b):
            return jnp.concatenate(
                [b[..., :D] + b[..., D:D + 1] * a[..., :D],
                 a[..., D:D + 1] * b[..., D:D + 1], b[..., D + 1:]], -1)
        for i in range(4):                      # 4 reps (heavier op)
            v = jax.lax.associative_scan(comb, v + 1e-9 * i, axis=0)
        return v

    f = jax.jit(assoc)
    _ = float(jnp.sum(f(ab, par)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(f(ab, par)))
    print(json.dumps({"op": "assoc_scan[N,62]",
                      "ms": round((time.perf_counter() - t0 - 0.025)
                                  / 4 * 1e3, 3)}))

    timed("perm gather [N,60]", chain(lambda v, i: v[i], x, perm), x, perm)
    timed("perm gather [N,1]",
          chain(lambda v, i: v[i], x[:, :1], perm), x[:, :1], perm)


if __name__ == "__main__":
    main()
