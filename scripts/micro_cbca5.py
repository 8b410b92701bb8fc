"""CBCA v7: fully-STATIC tap offsets (round 5).

Hypothesis: the taps kernel's cost is dominated by the per-tap DYNAMIC
sublane slice (Mosaic relayout); the measured fixed-offset floor is 0.092
ms/pass vs 0.57 production. Static slice offsets need no runtime
alignment proof, so unroll the tap loop completely with static k, gated
per 8-tap octave by pl.when on the block kmax (short-arm blocks skip
whole octaves). Accumulator lives in a VMEM scratch across when-blocks.

Benches v7 vs taps0 at B in {1, 16} (vmap over frames like bench.py).
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mystereomatching_tpu.ops import arms as A
from mystereomatching_tpu.ops import pallas_kernels as pk
from mystereomatching_tpu.data import make_synthetic_pair

D, H, W = 60, 375, 450
MAX_ARM = 34
REPS = int(os.environ.get("REPS", "8"))
B = int(os.environ.get("B", "16"))


def _cdiv(a, b):
    return -(-a // b)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _taps_kernel_static(vol_ref, an_ref, ap_ref, out_ref, buf, acc, *,
                        max_arm: int, oct_size: int = 8):
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:].astype(jnp.float32)
    buf[:, :, :m, :] = jnp.zeros_like(buf[:, :, :m, :])
    buf[:, :, m + a:, :] = jnp.zeros_like(buf[:, :, m + a:, :])
    buf[:, :, m:m + a, :] = v
    an = an_ref[:].astype(jnp.int32)[None]
    ap = ap_ref[:].astype(jnp.int32)[None]
    kmax = jnp.maximum(jnp.max(an), jnp.max(ap))
    acc[:] = v
    zero = jnp.zeros_like(v)

    for q in range(_cdiv(m, oct_size)):
        k0 = q * oct_size + 1
        k1 = min(m, q * oct_size + oct_size)

        @pl.when(kmax >= k0)
        def _(k0=k0, k1=k1):
            r = acc[:]
            for k in range(k0, k1 + 1):
                fwd = buf[:, :, m + k: m + k + a, :]
                bwd = buf[:, :, m - k: m - k + a, :]
                r = r + jnp.where(ap >= k, fwd, zero)
                r = r + jnp.where(an >= k, bwd, zero)
            acc[:] = r

    out_ref[:] = acc[:].astype(out_ref.dtype)


def run_static(vol, an, ap, max_arm=MAX_ARM, bt=128, oct_size=8):
    c, b, a, l = vol.shape
    ba = an.shape[0]
    bt = min(l, bt)
    grid = (b, _cdiv(l, bt))
    vol_spec = pl.BlockSpec((c, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((1, a, bt),
                            lambda bi, t: (bi if ba != 1 else 0, 0, t),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_taps_kernel_static, max_arm=max_arm,
                          oct_size=oct_size),
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((c, 1, a + 2 * max_arm, bt), jnp.float32),
                        pltpu.VMEM((c, 1, a, bt), jnp.float32)],
    )(vol, an, ap)


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

    os.environ["MYSM_CBCA_TAPS_SEG"] = "0"
    os.environ.pop("MYSM_CBCA_CLONES", None)
    ref = np.asarray(jax.jit(lambda v, n, p: pk.sublane_pass_auto(
        v[None], n, p, MAX_ARM)[0])(vol, an, ap))
    try:
        got = np.asarray(jax.jit(lambda v, n, p: run_static(
            v[None], n, p)[0])(vol, an, ap))
        err = np.max(np.abs(ref - got))
        print("v7 static:", "exact" if err == 0 else f"ERR {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"v7 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    volb = jnp.broadcast_to(vol[None], (B, D, H, W)) + \
        jnp.arange(B, dtype=jnp.float32)[:, None, None, None] * 1e-3
    anb = jnp.broadcast_to(an[None], (B,) + an.shape)
    apb = jnp.broadcast_to(ap[None], (B,) + ap.shape)

    cases = {
        "taps0": lambda v, n, p: pk.sublane_pass_auto(v[None], n, p,
                                                      MAX_ARM)[0],
        "v7o8": lambda v, n, p: run_static(v[None], n, p, oct_size=8)[0],
        "v7o16": lambda v, n, p: run_static(v[None], n, p, oct_size=16)[0],
        "v7full": lambda v, n, p: run_static(v[None], n, p,
                                             oct_size=MAX_ARM)[0],
    }
    for name, one in cases.items():
        def chain(v, n, p, one=one):
            out = v
            for _ in range(REPS):
                out = one(out + 1e-9, n, p)
            return out

        fn = jax.jit(jax.vmap(chain))
        try:
            sync(fn(volb, anb, apb)); sync(fn(volb, anb, apb))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)
            continue
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sync(fn(volb, anb, apb))
            ts.append((time.perf_counter() - t0 - 0.025) / (REPS * B))
        print(f"{name:7s} min {min(ts)*1e3:7.3f}  med {sorted(ts)[2]*1e3:7.3f}"
              " ms/pass/frame", flush=True)


main()
