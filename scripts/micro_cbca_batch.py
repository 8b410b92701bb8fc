"""Batched CBCA pass A/B (round 5): the round-4 clone kernel won
single-frame (0.435 vs 1.149 ms/pass) but regressed the B=16 vmapped
headline 580 -> 514 MP*disp/s. Bench taps / clones(v2) / clseg(v5) under
jax.vmap over FRAMES (the bench.py batching mode) at B in {1, 16}.
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from mystereomatching_tpu.ops import arms as A
from mystereomatching_tpu.ops import pallas_kernels as pk
from mystereomatching_tpu.data import make_synthetic_pair

D, H, W = 60, 375, 450
MAX_ARM = 34
REPS = int(os.environ.get("REPS", "16"))
B = int(os.environ.get("B", "16"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def run_kernel(vol, an, ap, mode):
    # modes: "tapsN" = unaligned taps with per-seg kmax N (0 = whole
    # block, the round-3/4 kernel); "cloneN" = aligned clones, seg N
    if mode.startswith("taps"):
        os.environ.pop("MYSM_CBCA_CLONES", None)
        os.environ["MYSM_CBCA_TAPS_SEG"] = mode[4:]
    else:
        os.environ["MYSM_CBCA_CLONES"] = "1"
        os.environ["MYSM_CBCA_SEG"] = mode[5:]
    return pk.sublane_pass_auto(vol, an, ap, MAX_ARM)


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
    an, ap = arms_int[2].astype(jnp.int32), arms_int[3].astype(jnp.int32)

    volb = jnp.broadcast_to(vol[None], (B, D, H, W)) + \
        jnp.arange(B, dtype=jnp.float32)[:, None, None, None] * 1e-3
    anb = jnp.broadcast_to(an[None], (B,) + an.shape)
    apb = jnp.broadcast_to(ap[None], (B,) + ap.shape)

    ref = np.asarray(jax.jit(lambda v, n, p: run_kernel(
        v[None], n, p, "taps0")[0])(vol, an, ap))
    got = np.asarray(jax.jit(lambda v, n, p: run_kernel(
        v[None], n, p, "taps64")[0])(vol, an, ap))
    print("taps64 exact:", np.array_equal(ref, got), flush=True)

    for mode in ("taps0", "taps64", "taps32", "clone64"):
        # env must be set at TRACE time
        def one(v, n, pp, mode=mode):
            return run_kernel(v[None], n, pp, mode)[0]

        def chain(v, n, pp, mode=mode):
            out = v
            for _ in range(REPS):
                out = one(out + 1e-9, n, pp, mode)
            return out

        fn = jax.jit(jax.vmap(chain))
        try:
            sync(fn(volb, anb, apb)); sync(fn(volb, anb, apb))
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)
            continue
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sync(fn(volb, anb, apb))
            ts.append((time.perf_counter() - t0 - 0.025) / (REPS * B))
        print(f"{mode:6s} min {min(ts)*1e3:7.3f}  med {sorted(ts)[2]*1e3:7.3f}"
              " ms/pass/frame", flush=True)


main()
