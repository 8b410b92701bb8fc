import time, functools
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu.pipeline import match_pair
from mystereomatching_tpu.data import make_synthetic_pair

H, W, D, B = 375, 450, 60, 12
pairs = [make_synthetic_pair(h=H, w=W, max_disp=D-1, seed=s) for s in range(B)]
lb = jnp.stack([jnp.asarray(p.left, jnp.float32) for p in pairs])
rb = jnp.stack([jnp.asarray(p.right, jnp.float32) for p in pairs])

def bench(cfg):
    fn = jax.jit(jax.vmap(lambda l, r: match_pair(l, r, cfg=cfg)["disparity"]))
    float(jnp.sum(fn(lb, rb))); float(jnp.sum(fn(lb, rb)))
    t0 = time.perf_counter()
    for _ in range(4): out = fn(lb, rb); float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 4
    return B*H*W*D/dt/1e6, np.asarray(out)

m32, d32 = bench(default_config(max_disp=D-1))
m16, d16 = bench(default_config(max_disp=D-1, vol_dtype="bfloat16"))
gt = np.stack([p.gt for p in pairs]); msk = np.stack([p.masks["nonocc"] for p in pairs])
def bad(d):
    m = (gt > 0) & msk
    return (((np.abs(d - gt) > 1) | (d < 0)) & m).sum() / m.sum()
print(f"f32 : {m32:7.1f} MPd/s  bad1={bad(d32):.4f}")
print(f"bf16: {m16:7.1f} MPd/s  bad1={bad(d16):.4f}  disp-mismatch={np.mean(d16!=d32):.4%}")
