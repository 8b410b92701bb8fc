"""A/B the contracted Borůvka vs the plain round loop on the real chip.

Times boruvka_mst vs boruvka_mst_contracted at Teddy scale (375x450)
with chained dependent reps inside one jit (tunnel adds ~25 ms per
dispatch), then checks bit-identity of the in_mst masks on-device and
times the full build_tree pipeline with each variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_boruvka.py
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


def chain_w(op):
    """REPS dependent applications: mix a bool-derived epsilon into the
    int weights (values unchanged, dependency kept)."""
    def f(wr, wd):
        out = op(wr, wd)
        for _ in range(REPS - 1):
            eps = jnp.min(out.astype(jnp.int32))        # 0 or 1
            out = op(jnp.minimum(wr + eps, 255), wd)
        return out
    return f


def main():
    r = np.random.default_rng(0)
    img = jnp.asarray(np.clip(r.normal(128, 40, (H, W, 3)), 0, 255),
                      jnp.float32)
    wr, wd = jax.jit(M.grid_edge_weights)(img)
    wr = jnp.asarray(jax.device_get(wr))
    wd = jnp.asarray(jax.device_get(wd))

    a = jax.device_get(jax.jit(M.boruvka_mst)(wr, wd))
    b = jax.device_get(jax.jit(M.boruvka_mst_contracted)(wr, wd))
    print(json.dumps({"op": "bit-identical", "ok": bool((a == b).all()),
                      "edges": int(a.sum())}), flush=True)

    timed("boruvka_mst (plain)", chain_w(M.boruvka_mst), wr, wd)
    timed("boruvka_mst_contracted", chain_w(M.boruvka_mst_contracted),
          wr, wd)

    def chain_tree(im):
        t = M.build_tree(im)
        for _ in range(REPS - 1):
            eps = 1e-9 * t.weight.astype(jnp.float32).ravel()[0]
            t = M.build_tree(im + eps)
        return t.parent
    timed("build_tree (full, contracted)", chain_tree, img)


if __name__ == "__main__":
    main()
