"""Stage-level profile of the NL tree-filter path on the attached chip.

Times, separately jitted (sync via float(jnp.sum(..)), one warm rep
subtracting the ~25 ms tunnel dispatch):
  * device tree build (Borůvka + Euler rooting), and its two halves
  * one tree_filter pass over [N, 60]
  * the three-stage nl_disparity flow
  * the full nl_tree_filter pipeline frame

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_nl.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu import models
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.ops import mst, nl
from mystereomatching_tpu.pipeline import StereoPipeline

H, W, MD = 375, 450, 59
D = MD + 1


def timeit(name, f, *a):
    out = f(*a)
    _ = jax.tree.map(lambda x: float(jnp.sum(x)), out)
    t0 = time.perf_counter()
    out = f(*a)
    _ = jax.tree.map(lambda x: float(jnp.sum(x)), out)
    print(json.dumps({"stage": name,
                      "ms": round((time.perf_counter() - t0 - 0.025) * 1e3,
                                  1)}))
    return out


def main():
    pair = make_synthetic_pair(h=H, w=W, max_disp=MD, seed=0)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    r = np.random.default_rng(0)
    vol = jnp.asarray(r.random((D, H, W)), jnp.float32)

    b_edges = jax.jit(lambda im: mst.grid_edge_weights(im))
    wr, wd = timeit("edge_weights", b_edges, left)
    b_mst = jax.jit(mst.boruvka_mst)
    in_mst = timeit("boruvka", b_mst, wr, wd)
    b_root = jax.jit(mst.root_tree)
    tree = timeit("root_tree", b_root, in_mst, wr, wd)

    flat = vol.reshape(D, H * W).T
    f_filter = jax.jit(lambda t, v: mst.tree_filter(t, v, 0.1))
    timeit("tree_filter[N,60]", f_filter, tree, flat)
    f_filter1 = jax.jit(lambda t, v: mst.tree_filter(t, v, 0.1))
    timeit("tree_filter[N,1]", f_filter1, tree, flat[:, :1])

    f_nld = jax.jit(lambda v, l, rr: nl.nl_disparity(v, l, rr, 0.1, True))
    timeit("nl_disparity(3 stages)", f_nld, vol, left, right)

    cfg = models.get_model("nl_tree_filter", max_disp=MD)
    pipe = StereoPipeline(cfg)
    timeit("full nl pipeline", lambda l, rr: pipe(l, rr)["disparity"],
           left, right)


if __name__ == "__main__":
    main()
