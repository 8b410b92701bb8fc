"""Per-stage profile of the HEADLINE config (censusGrad + CBCA + SGM4 +
refine) on the attached chip, Teddy scale — input for closing the
remaining roofline gap (round-1 estimate: ~7x off bandwidth bound).

Each stage is jitted separately on realistic inputs; sync via
float(jnp.sum(..)); one warm rep, ~25 ms tunnel dispatch subtracted.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_default.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

from mystereomatching_tpu.config import default_config
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu import pipeline as P

H, W, MD = 375, 450, 59


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
    cfg = default_config(max_disp=MD)
    pair = make_synthetic_pair(h=H, w=W, max_disp=MD, seed=0)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)

    f_vols = jax.jit(lambda l, r: P.compute_volumes(l, r, cfg))
    vols, arms_pair = timeit("compute_volumes(cost+aggregate both)",
                             f_vols, left, right)

    f_opt = jax.jit(lambda v, l, r: P.optimize(v, l, r, cfg))
    dl, dr, vol0 = timeit("optimize(SGM4+WTA both)", f_opt, vols, left, right)

    f_ref = jax.jit(lambda dl, dr, v, l, a: P.refine(dl, dr, v, l, a, cfg))
    timeit("refine(LRC+RV+PI+median)", f_ref, dl, dr, vol0, left,
           arms_pair[0])

    f_all = jax.jit(lambda l, r: P.match_pair(l, r, cfg=cfg)["disparity"])
    timeit("full frame (1x, unbatched)", f_all, left, right)


if __name__ == "__main__":
    main()
