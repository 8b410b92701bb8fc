import functools, time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.config import default_config
from mystereomatching_tpu.pipeline import match_pair
from mystereomatching_tpu.data import make_synthetic_pair

H, W, D, B = 375, 450, 60, 4

def sync(x): return float(jnp.sum(x))

def bench(fn, *args, iters=5):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters

cfg = default_config(max_disp=D - 1)
pairs = [make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=s) for s in range(B)]
lb = jnp.stack([jnp.asarray(p.left, jnp.float32) for p in pairs])
rb = jnp.stack([jnp.asarray(p.right, jnp.float32) for p in pairs])

single = jax.jit(lambda l, r: match_pair(l, r, cfg=cfg)["disparity"])
batched = jax.jit(jax.vmap(lambda l, r: match_pair(l, r, cfg=cfg)["disparity"]))

t1 = bench(single, lb[0], rb[0])
print(f"single: {t1*1e3:8.2f} ms/frame  ({H*W*D/t1/1e6:8.1f} MPd/s)")
tb = bench(batched, lb, rb)
print(f"batch{B}: {tb/B*1e3:8.2f} ms/frame  ({B*H*W*D/tb/1e6:8.1f} MPd/s)")
