"""Per-stage wall-clock breakdown of the default pipeline on the chip.

Times each stage (cost, cbca, sgm, refine) separately by jitting the
sub-functions; device-sync via a forced reduction read (the axon tunnel's
block_until_ready is unreliable — see bench.py).
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu.config import default_config
from mystereomatching_tpu import models
from mystereomatching_tpu import pipeline as P
from mystereomatching_tpu.ops import aggregation as agg_ops
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import sgm as sgm_ops
from mystereomatching_tpu.ops import wta as wta_ops
from mystereomatching_tpu.data import make_synthetic_pair

# usage: profile_stages.py [preset H W max_disp]
PRESET = sys.argv[1] if len(sys.argv) > 1 else None
H, W, D = ((int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]) + 1)
           if len(sys.argv) > 4 else (375, 450, 60))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = (models.get_model(PRESET, max_disp=D - 1) if PRESET
           else default_config(max_disp=D - 1))
    pair = make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=0)
    left = jnp.asarray(pair.left, jnp.float32)
    right = jnp.asarray(pair.right, jnp.float32)
    gl, gr = P.to_gray(left), P.to_gray(right)

    arms_fn = jax.jit(lambda l, r: tuple(
        arms_ops.cross_arms(img, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                            cfg.cbca_c_thresh, cfg.cbca_c_thresh_out,
                            cfg.cbca_min_arm) for img in (l, r)))
    t_arms = timeit(arms_fn, left, right)
    arms_pair = arms_fn(left, right)

    cost_fn = jax.jit(lambda l, r, g1, g2, a: tuple(
        cost_ops.compute_cost_volume(l, r, g1, g2, cfg, lor, arms=a[lor])
        for lor in range(2)))
    t_cost = timeit(cost_fn, left, right, gl, gr, arms_pair)
    vols = cost_fn(left, right, gl, gr, arms_pair)

    def agg_one(vol, a0, a1, lor):
        arms_int = arms_ops.intersect_arms(a0, a1, cfg.num_disp, lor)
        return agg_ops.cbca(vol, arms_int, cfg.cbca_iterations,
                            max_arm=cfg.cbca_cross_l_out)
    agg_fn = jax.jit(lambda vs, a: tuple(
        agg_one(vs[lor], a[0], a[1], lor) for lor in range(2)))
    t_agg = timeit(agg_fn, vols, arms_pair)
    vols_a = agg_fn(vols, arms_pair)

    sgm_fn = jax.jit(lambda vs, l, r: tuple(
        sgm_ops.sgm(vs[lor], img, cfg.sgm_scan_num, cfg.sgm_p1_eff, cfg.sgm_p2_eff,
                    cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff)
        for lor, img in ((0, l), (1, r))))
    t_sgm = timeit(sgm_fn, vols_a, left, right)
    vols_s = sgm_fn(vols_a, left, right)

    wta_fn = jax.jit(lambda vs: tuple(wta_ops.wta(v, cfg.choose_small)
                                      for v in vs))
    t_wta = timeit(wta_fn, vols_s)
    dl, dr = wta_fn(vols_s)

    ref_fn = jax.jit(lambda a, b, v, l, ar: P.refine(a, b, v, l, ar, cfg))
    t_ref = timeit(ref_fn, dl, dr, vols_s[0], left, arms_pair[0])

    full = jax.jit(functools.partial(P.match_pair, cfg=cfg))
    t_full = timeit(lambda l, r: full(l, r)["disparity"], left, right)

    tot = t_arms + t_cost + t_agg + t_sgm + t_wta + t_ref
    for name, t in [("arms", t_arms), ("cost(x2)", t_cost), ("cbca(x2)", t_agg),
                    ("sgm(x2)", t_sgm), ("wta", t_wta), ("refine", t_ref),
                    ("sum", tot), ("full-pipeline", t_full)]:
        print(f"{name:15s} {t*1e3:9.2f} ms  ({H*W*D/t/1e6:9.1f} MPd/s)")


if __name__ == "__main__":
    main()
