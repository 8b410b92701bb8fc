import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu.pipeline import match_pair, StereoPipeline
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu import models

H, W, D = 375, 450, 60
for B in ():
    pairs = [make_synthetic_pair(h=H, w=W, max_disp=D-1, seed=s) for s in range(B)]
    lb = jnp.stack([jnp.asarray(p.left, jnp.float32) for p in pairs])
    rb = jnp.stack([jnp.asarray(p.right, jnp.float32) for p in pairs])
    cfg = default_config(max_disp=D-1)
    fn = jax.jit(jax.vmap(lambda l, r: match_pair(l, r, cfg=cfg)["disparity"]))
    float(jnp.sum(fn(lb, rb))); float(jnp.sum(fn(lb, rb)))
    t0 = time.perf_counter()
    for _ in range(4): float(jnp.sum(fn(lb, rb)))
    dt = (time.perf_counter() - t0) / 4
    print(f"B={B}: {B*H*W*D/dt/1e6:7.1f} MPd/s")

# SO smoke on TPU
p = make_synthetic_pair(h=128, w=192, max_disp=23, seed=1)
cfg = default_config(max_disp=23, optimization="so", do_refine=False,
                     do_lr_consis=False, compute_both_volumes=False)
d = np.asarray(StereoPipeline(cfg)(p.left, p.right)["disparity"])
m = (p.gt > 0) & p.masks["nonocc"]
print("SO bad-1.0:", round(float((((np.abs(d-p.gt)>1)|(d<0))&m).sum()/m.sum()), 4))

# cross-scale smoke on TPU
cfg = default_config(max_disp=23, pyramid_levels=2)
d = np.asarray(StereoPipeline(cfg)(p.left, p.right)["disparity"])
print("cross-scale bad-1.0:", round(float((((np.abs(d-p.gt)>1)|(d<0))&m).sum()/m.sum()), 4))
