"""Per-stage profile AT THE HEADLINE'S OPERATING POINT: stages vmapped over
B frames and chained REPS times inside one jit — per-frame numbers with
both the dispatch overhead and the per-op latency floors amortized exactly
as bench.py's BATCH=16 dispatch amortizes them.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu import pipeline as P
from mystereomatching_tpu.ops import aggregation as agg_ops
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import sgm as sgm_ops
from mystereomatching_tpu.ops import wta as wta_ops
from mystereomatching_tpu.data import make_synthetic_pair

H, W, D = 375, 450, 60
B = int(os.environ.get("B", "4"))
REPS = int(os.environ.get("REPS", "2"))

def sync(x): return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

def bench(name, fn, *args, iters=3):
    f = jax.jit(fn)
    sync(f(*args)); sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(f(*args))
    dt = ((time.perf_counter() - t0) / iters - 0.025) / REPS / B
    print(f"{name:14s} {dt*1e3:8.3f} ms/frame  ({H*W*D/dt/1e6:8.0f} MPd/s)", flush=True)

cfg = default_config(max_disp=D - 1)
pairs = [make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=s) for s in range(B)]
left = jnp.stack([jnp.asarray(p.left, jnp.float32) for p in pairs])
right = jnp.stack([jnp.asarray(p.right, jnp.float32) for p in pairs])

def chain(stage):
    def f(x, *fx):
        for _ in range(REPS):
            x = stage(x, *fx)
        return x
    return f

def arms_stage(img):
    def one(i):
        a = arms_ops.cross_arms(i, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                                cfg.cbca_c_thresh, cfg.cbca_c_thresh_out, cfg.cbca_min_arm)
        return i + 1e-6 * a.sum(0)[..., None].astype(jnp.float32)
    return jax.vmap(one)(img)
bench("arms(x1img)", chain(arms_stage), left)

arms_pair = jax.jit(jax.vmap(lambda l, r: tuple(
    arms_ops.cross_arms(i, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                        cfg.cbca_c_thresh, cfg.cbca_c_thresh_out, cfg.cbca_min_arm)
    for i in (l, r))))(left, right)

def cost_stage(l):
    def one(li, ri, a):
        v = cost_ops.compute_cost_volume(li, ri, P.to_gray(li), P.to_gray(ri), cfg, 0, arms=a)
        return li + 1e-9 * v[0][..., None]
    return jax.vmap(one)(l, right, arms_pair[0])
bench("cost(x1vol)", chain(cost_stage), left)

vol = jax.jit(jax.vmap(lambda l, r, a: cost_ops.compute_cost_volume(
    l, r, P.to_gray(l), P.to_gray(r), cfg, 0, arms=a)))(left, right, arms_pair[0])
ai = jax.jit(jax.vmap(lambda a, b: arms_ops.intersect_arms(a, b, cfg.num_disp, 0)))(*arms_pair)

bench("cbca(x1vol)", chain(lambda v: jax.vmap(
    lambda vv, aa: agg_ops.cbca(vv, aa, cfg.cbca_iterations, max_arm=cfg.cbca_cross_l_out)
)(v, ai) * 1e-2), vol)

bench("sgm(x1vol)", chain(lambda v: jax.vmap(
    lambda vv, ll: sgm_ops.sgm(vv, ll, cfg.sgm_scan_num, cfg.sgm_p1_eff, cfg.sgm_p2_eff,
                               cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff))(v, left) * 1e-2), vol)

bench("wta(x1vol)", chain(lambda v: v + 1e-9 * jax.vmap(
    lambda vv: wta_ops.wta(vv, cfg.choose_small))(v)[:, None].astype(jnp.float32)), vol)

dl = jax.jit(jax.vmap(lambda v: wta_ops.wta(v, cfg.choose_small)))(vol)
def refine_stage(d):
    def one(di, vv, li, aa):
        r = P.refine(di, di, vv, li, aa, cfg)
        return jnp.where(r >= 0, r.astype(jnp.int32), di)
    return jax.vmap(one)(d, vol, left, arms_pair[0])
bench("refine(x1)", chain(refine_stage), dl)
