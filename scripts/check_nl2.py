import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import mst as M

H, W = 375, 450
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)

def sync(x): return float(jnp.sum(x.astype(jnp.float32) * 1e-6))
def t(fn, *a, iters=3):
    r = fn(*a); jax.tree.map(sync, r); jax.tree.map(sync, fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters): jax.tree.map(sync, fn(*a))
    return (time.perf_counter() - t0) / iters

wr, wd = jax.jit(M.grid_edge_weights)(img)
bor = jax.jit(lambda a, b: M.boruvka_mst(a, b))
print(f"boruvka  : {t(bor, wr, wd)*1e3:8.1f} ms")
in_mst = bor(wr, wd)
rt = jax.jit(lambda m, a, b: M.root_tree(m, a, b)[:2])
print(f"root_tree: {t(rt, in_mst, wr, wd)*1e3:8.1f} ms")
