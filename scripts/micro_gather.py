"""Price TPU gather cost vs trailing width/layout at list-ranking scale.

gather[N,1] measured 3x slower than gather[N,8] at N=168k (micro_nl) —
this pins down the fast layout for the ranking state ([2N,2] today), the
_jump_to_root pointer array (flat [N]), and scatter equivalents.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_gather.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

N = 337_000
REPS = 20


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32).ravel()[:4]))
    dt = (time.perf_counter() - t0 - 0.025) / REPS
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def chain_gather(width):
    def f(x, idx):
        for _ in range(REPS):
            x = x[idx]                     # rows permute; dependency kept
        return x
    return f


def main():
    r = np.random.default_rng(0)
    idx = jnp.asarray(r.permutation(N), jnp.int32)

    for wd in (1, 2, 4, 8, 16):
        x = jnp.asarray(r.integers(0, N, (N, wd)), jnp.int32)
        timed(f"gather i32[{N},{wd}]", chain_gather(wd), x, idx)

    xf = jnp.asarray(r.random((N,)), jnp.float32)
    def flat(x, idx):
        for _ in range(REPS):
            x = x[idx] + x                 # flat [N] rows
        return x
    timed(f"gather f32[{N}] flat", flat, xf, idx)

    xi = jnp.asarray(r.permutation(N), jnp.int32)
    def selfjump(p, _):
        for _ in range(REPS):
            p = p[p]
        return p
    timed(f"gather i32[{N}] self p[p]", selfjump, xi, idx)

    def selfjump8(p, _):
        # p[p] with the pointer array widened to [N,8] (col 0 = p):
        # does the wide layout speed up a flat permutation gather?
        st = jnp.tile(p[:, None], (1, 8))
        for _ in range(REPS):
            st = st[st[:, 0]]
        return st[:, 0]
    timed(f"gather i32[{N},8] self-jump", selfjump8, xi, idx)


if __name__ == "__main__":
    main()
