"""Stage profile of the nl_tree_filter CONFIG (bench config 4) on-chip:
cost volume / tree build / filter+normalize / optimize / refine — to find
the non-tree fat. Chained reps inside one jit per stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_nl2.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu import models
from mystereomatching_tpu import pipeline as P
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import mst, nl

H, W, MD = 375, 450, 59
D = MD + 1
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
    cfg = models.get_model("nl_tree_filter", max_disp=MD)
    pair = make_synthetic_pair(h=H, w=W, max_disp=MD, seed=0)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)

    def chain(op):
        def f(x, *a):
            out = op(x, *a)
            for _ in range(REPS - 1):
                eps = 1e-9 * jnp.asarray(out, jnp.float32).ravel()[0]
                out = op(x + eps, *a)
            return out
        return f

    from mystereomatching_tpu.ops import arms as arms_ops

    def arms_of(im):
        return arms_ops.build_arms(im, cfg)

    gl, gr = jax.jit(P.to_gray)(left), jax.jit(P.to_gray)(right)
    timed("cost ad_grad (incl arms)", chain(
        lambda l, r: cost_ops.compute_cost_volume(
            l, r, P.to_gray(l), P.to_gray(r), cfg, 0, arms=arms_of(l))),
        left, right)

    volf = jax.jit(lambda l, r: cost_ops.compute_cost_volume(
        l, r, P.to_gray(l), P.to_gray(r), cfg, 0, arms=arms_of(l)))
    vol = volf(left, right)
    vol = jnp.asarray(jax.device_get(vol))

    tree = jax.jit(mst.build_tree)(left)
    tree = mst.RootedTree(jnp.asarray(jax.device_get(tree.parent)),
                          jnp.asarray(jax.device_get(tree.weight)),
                          tree.shape)

    timed("nl_aggregate (tree given)", chain(
        lambda v: nl.nl_aggregate(v, left, cfg.nl_sigma, tree=tree)), vol)

    aggf = jax.jit(lambda v: nl.nl_aggregate(v, left, cfg.nl_sigma,
                                             tree=tree))
    avol = jnp.asarray(jax.device_get(aggf(vol)))

    def opt(v):
        return P.optimize({0: v}, left, right, cfg)

    def opt_chain(v):
        out = opt(v)
        for _ in range(REPS - 1):
            eps = 1e-9 * out[0].astype(jnp.float32).ravel()[0]
            out = opt(v + eps)
        return out[0]
    timed("optimize (wta path)", opt_chain, avol)

    dl, dr, vol0 = jax.jit(opt)(avol)
    dl = jnp.asarray(jax.device_get(dl))
    dr_h = None if dr is None else jnp.asarray(jax.device_get(dr))

    from mystereomatching_tpu.ops import arms as arms_ops
    arms0 = jax.jit(arms_of)(left)

    def refine_fn(d):
        return P.refine(d.astype(jnp.int32), dr_h, avol, left, arms0, cfg)
    def ref_chain(d):
        out = refine_fn(d)
        for _ in range(REPS - 1):
            eps = (out.astype(jnp.float32).ravel()[0] * 0).astype(d.dtype)
            out = refine_fn(d + eps)
        return out
    timed("refine", ref_chain, dl.astype(jnp.float32))


if __name__ == "__main__":
    main()
