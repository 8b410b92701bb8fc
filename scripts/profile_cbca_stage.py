"""Where do CBCA's in-pipeline ms go? (round 5)
Times, all chained x REPS inside one jit, vmapped over B frames:
  - full cbca() (2 iterations)
  - kernel-only sequence (4 sublane passes, no stacks/areas/transposes)
  - cbca with pieces knocked out to attribute transposes/stack/area
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from mystereomatching_tpu.ops import arms as A
from mystereomatching_tpu.ops import pallas_kernels as pk
from mystereomatching_tpu.ops.aggregation import cbca
from mystereomatching_tpu.data import make_synthetic_pair

D, H, W = 60, 375, 450
MAX_ARM = 34
REPS = int(os.environ.get("REPS", "8"))
B = int(os.environ.get("B", "16"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(name, one, vol, *args):
    def chain(v, *a):
        out = v
        for _ in range(REPS):
            out = one(out + 1e-9, *a)
        return out

    fn = jax.jit(jax.vmap(chain))
    sync(fn(vol, *args)); sync(fn(vol, *args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        sync(fn(vol, *args))
        ts.append((time.perf_counter() - t0 - 0.025) / (REPS * B))
    print(f"{name:22s} min {min(ts)*1e3:7.3f}  med {sorted(ts)[2]*1e3:7.3f}"
          " ms", flush=True)


def main():
    print("backend:", jax.devices()[0].platform, "B =", B, flush=True)
    p = make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=0)
    img = jnp.asarray(p.left, jnp.float32)
    img2 = jnp.asarray(p.right, jnp.float32)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, H, W), np.float32))
    arms_fn = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))
    a0, a1 = arms_fn(img), arms_fn(img2)
    arms_int = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)
    ai = jnp.asarray(np.asarray(jnp.stack([arms_int[i] for i in range(4)])))

    volb = jnp.broadcast_to(vol[None], (B, D, H, W)) + \
        jnp.arange(B, dtype=jnp.float32)[:, None, None, None] * 1e-3
    aib = jnp.broadcast_to(ai[None], (B,) + ai.shape)

    bench("cbca full (2 iter)", lambda v, a: cbca(v, a, 2, MAX_ARM),
          volb, aib)

    an, ap = arms_int[2].astype(jnp.int32), arms_int[3].astype(jnp.int32)
    anb = jnp.broadcast_to(an[None], (B,) + an.shape)
    apb = jnp.broadcast_to(ap[None], (B,) + ap.shape)

    def kernels_only(v, n, p2):
        # 4 passes, same direction (no transposes, no stacks, no area)
        for _ in range(4):
            v = pk.sublane_pass_auto(v[None], n, p2, MAX_ARM)[0]
        return v

    bench("4 kernel passes only", kernels_only, volb, anb, apb)

    def kernels_swaps(v, n, p2):
        # 4 passes + the 4 volume transposes cbca does per 2 iters
        for _ in range(2):
            vT = jnp.swapaxes(v, -1, -2)
            vT = pk.sublane_pass_auto(
                vT[None], jnp.swapaxes(n, -1, -2), jnp.swapaxes(p2, -1, -2),
                MAX_ARM)[0]
            v = jnp.swapaxes(vT, -1, -2)
            v = pk.sublane_pass_auto(v[None], n, p2, MAX_ARM)[0]
        return v

    bench("4 passes + transposes", kernels_swaps, volb, anb, apb)

    def one_iter(v, a):
        return cbca(v, a, 1, MAX_ARM)

    bench("cbca 1 iter", one_iter, volb, aib)


main()
