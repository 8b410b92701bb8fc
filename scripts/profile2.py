"""Amortized per-stage profile: chain each stage N times inside one jit."""
import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu import pipeline as P
from mystereomatching_tpu.ops import aggregation as agg_ops
from mystereomatching_tpu.ops import arms as arms_ops
from mystereomatching_tpu.ops import cost as cost_ops
from mystereomatching_tpu.ops import sgm as sgm_ops
from mystereomatching_tpu.ops import wta as wta_ops
from mystereomatching_tpu.data import make_synthetic_pair

H, W, D, REPS = 375, 450, 60, 4

def sync(x): return jax.tree.map(lambda v: float(jnp.sum(v.astype(jnp.float32))), x)

def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters / REPS

cfg = default_config(max_disp=D - 1)
pair = make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=0)
left = jnp.asarray(pair.left, jnp.float32)
right = jnp.asarray(pair.right, jnp.float32)
gl, gr = P.to_gray(left), P.to_gray(right)

def chain(stage, x0, *fixed):
    def f(x, *fx):
        for i in range(REPS):
            x = stage(x, *fx)
        return x
    return jax.jit(f), x0

# arms: image -> arms; chain by perturbing image with arms sum (dependency)
def arms_stage(img):
    a = arms_ops.cross_arms(img, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                            cfg.cbca_c_thresh, cfg.cbca_c_thresh_out, cfg.cbca_min_arm)
    return img + 1e-6 * a.sum(0)[..., None].astype(jnp.float32)
f, x = chain(arms_stage, left)
print(f"arms(x1)  {bench(f, x)*1e3:8.2f} ms")

arms_pair = tuple(arms_ops.cross_arms(i, cfg.cbca_cross_l, cfg.cbca_cross_l_out,
                  cfg.cbca_c_thresh, cfg.cbca_c_thresh_out, cfg.cbca_min_arm)
                  for i in (left, right))
arms_pair = jax.jit(lambda l, r: arms_pair)(left, right)

def cost_stage(l, r):
    v = cost_ops.compute_cost_volume(l, r, P.to_gray(l), P.to_gray(r), cfg, 0, arms=arms_pair[0])
    return l + 1e-9 * v[0][..., None], r

f = jax.jit(lambda l, r: [l := cost_stage(l, r)[0] for _ in range(REPS)][-1])
print(f"cost(x1)  {bench(f, left, right)*1e3:8.2f} ms")

vol = jax.jit(lambda l, r: cost_ops.compute_cost_volume(l, r, gl, gr, cfg, 0, arms=arms_pair[0]))(left, right)
ai = jax.jit(lambda a, b: arms_ops.intersect_arms(a, b, cfg.num_disp, 0))(*arms_pair)

def cbca_stage(v):
    return agg_ops.cbca(v, ai, cfg.cbca_iterations, max_arm=cfg.cbca_cross_l_out) * 1e-2
f, x = chain(cbca_stage, vol)
print(f"cbca(x1)  {bench(f, x)*1e3:8.2f} ms")

def sgm_stage(v):
    return sgm_ops.sgm(v, left, cfg.sgm_scan_num, cfg.sgm_p1_eff, cfg.sgm_p2_eff,
                       cfg.sgm_cor_dif_thres, cfg.sgm_redu_coeff) * 1e-2
f, x = chain(sgm_stage, vol)
print(f"sgm(x1)   {bench(f, x)*1e3:8.2f} ms")

def sgm2_stage(v2):
    import functools
    run = functools.partial(sgm_ops.sgm, num_directions=cfg.sgm_scan_num,
                            p1=cfg.sgm_p1_eff, p2=cfg.sgm_p2_eff,
                            cor_dif_thres=cfg.sgm_cor_dif_thres,
                            redu_coeff=cfg.sgm_redu_coeff)
    return jax.vmap(run)(v2, jnp.stack([left, right])) * 1e-2
f, x = chain(sgm2_stage, jnp.stack([vol, vol]))
print(f"sgm(x2batched){bench(f, x)*1e3:7.2f} ms")

def wta_stage(v):
    d = wta_ops.wta(v, cfg.choose_small)
    return v + 1e-9 * d[None].astype(jnp.float32)
f, x = chain(wta_stage, vol)
print(f"wta(x1)   {bench(f, x)*1e3:8.2f} ms")

dl = jax.jit(lambda v: wta_ops.wta(v, cfg.choose_small))(vol)
def refine_stage(d):
    r = P.refine(d, d, vol, left, arms_pair[0], cfg)
    return jnp.where(r >= 0, r.astype(jnp.int32), d)
f, x = chain(refine_stage, dl)
print(f"refine(x1){bench(f, x)*1e3:8.2f} ms")
