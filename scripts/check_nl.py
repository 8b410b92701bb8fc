import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import mst as M

H, W, D = 375, 450, 60
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
vals = jnp.asarray(rng.random((H * W, D), np.float32))

def sync(x): return float(jnp.sum(x.astype(jnp.float32) * 1e-6))
def t(fn, *a, iters=3):
    r = fn(*a); jax.tree.map(sync, r); jax.tree.map(sync, fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters): jax.tree.map(sync, fn(*a))
    return (time.perf_counter() - t0) / iters

# NOTE: never call build_tree EAGERLY on the tunnel (hundreds of tiny
# compiles wedge the remote compile queue) — jit whole stages.
bt = jax.jit(lambda i: M.build_tree(i)[:2])
print(f"build_tree : {t(bt, img)*1e3:8.1f} ms", flush=True)
p, w_ = bt(img)
tf = jax.jit(lambda p, w_, v: M.tree_filter(M.RootedTree(p, w_, (H, W)), v))
print(f"tree_filter: {t(tf, p, w_, vals)*1e3:8.1f} ms", flush=True)
