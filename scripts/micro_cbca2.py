"""CBCA taps-kernel variant microbench (round 4, VERDICT item 1).

Times the production `_taps_kernel` against experimental variants on the
real chip to locate the cost: unaligned dynamic sublane slices vs the
mask+add chain. Variants:
  v0  production kernel (unaligned pl.ds taps, fori to block kmax)
  v1  SEMANTICS-WRONG probe: taps always read the aligned base offset —
      isolates the unaligned-slice overhead (timing only)
  v2  aligned-clone kernel: 8 pre-rotated copies of the padded block so
      every tap slice start is provably 8-aligned
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
REPS = int(os.environ.get("REPS", "4"))


def _cdiv(a, b):
    return -(-a // b)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(name, fn, *args, iters=3):
    f = jax.jit(fn)
    sync(f(*args)); sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(f(*args))
    dt = ((time.perf_counter() - t0) / iters - 0.025) / REPS
    print(f"{name:24s} {dt*1e3:8.3f} ms/pass", flush=True)
    return dt


def chain(pass_fn):
    def f(vol, an, ap):
        out = vol
        for _ in range(REPS):
            out = pass_fn(out + 1e-9, an, ap)
        return out
    return f


# ---------------- v1: fixed-offset probe (wrong semantics) ----------------
def _taps_kernel_fixed(vol_ref, an_ref, ap_ref, out_ref, buf, *, max_arm, op):
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:].astype(jnp.float32)
    buf[:, :, :m, :] = jnp.zeros_like(buf[:, :, :m, :])
    buf[:, :, m + a:, :] = jnp.zeros_like(buf[:, :, m + a:, :])
    buf[:, :, m:m + a, :] = v
    an = an_ref[:].astype(jnp.int32)[None]
    ap = ap_ref[:].astype(jnp.int32)[None]
    fill = jnp.zeros_like(v)
    kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

    def body(k, acc):
        base = pl.multiple_of(m - m % 8, 8)     # constant aligned offset
        fwd = buf[:, :, pl.ds(base, a), :]
        bwd = buf[:, :, pl.ds(base, a), :]
        acc = acc + jnp.where(ap >= k, fwd, fill)
        acc = acc + jnp.where(an >= k, bwd, fill)
        return acc

    res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, v)
    out_ref[:] = res.astype(out_ref.dtype)


# ---------------- v3: segmented-kmax kernel ----------------
def _taps_kernel_seg(vol_ref, an_ref, ap_ref, out_ref, buf, *, max_arm, op,
                     seg: int = 64):
    """Per-SEGMENT adaptive trip count: the block kmax is a max over the
    whole [A, bt] strip, but arms are short and local — segmenting A lets
    smooth/short-arm segments run few taps."""
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:].astype(jnp.float32)
    buf[:, :, :m, :] = jnp.zeros_like(buf[:, :, :m, :])
    buf[:, :, m + a:, :] = jnp.zeros_like(buf[:, :, m + a:, :])
    buf[:, :, m:m + a, :] = v
    an_all = an_ref[:].astype(jnp.int32)[None]
    ap_all = ap_ref[:].astype(jnp.int32)[None]

    for s0 in range(0, a, seg):
        sl = min(seg, a - s0)
        an = an_all[:, :, s0:s0 + sl, :]
        ap = ap_all[:, :, s0:s0 + sl, :]
        acc0 = v[:, :, s0:s0 + sl, :]
        fill = jnp.zeros_like(acc0)
        kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

        def body(k, acc, s0=s0, sl=sl, an=an, ap=ap, fill=fill):
            fwd = buf[:, :, pl.ds(m + s0 + k, sl), :]
            bwd = buf[:, :, pl.ds(m + s0 - k, sl), :]
            acc = acc + jnp.where(ap >= k, fwd, fill)
            acc = acc + jnp.where(an >= k, bwd, fill)
            return acc

        res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, acc0)
        out_ref[:, :, s0:s0 + sl, :] = res.astype(out_ref.dtype)


# ---------------- v2: aligned-clone kernel ----------------
def _taps_kernel_clones(vol_ref, an_ref, ap_ref, out_ref, buf, *, max_arm, op):
    m8 = _cdiv(max_arm, 8) * 8 + 8
    a = vol_ref.shape[2]
    c = vol_ref.shape[0]
    ap_len = buf.shape[3]
    v = vol_ref[:].astype(jnp.float32)
    pad = jnp.zeros((c, 1, m8, v.shape[3]), jnp.float32)
    padded = jnp.concatenate([pad, v, pad], axis=2)
    if padded.shape[2] < ap_len:
        padded = jnp.concatenate(
            [padded, jnp.zeros((c, 1, ap_len - padded.shape[2], v.shape[3]),
                               jnp.float32)], axis=2)
    for r in range(8):
        buf[r] = padded if r == 0 else pltpu.roll(padded, ap_len - r, 2)
    an = an_ref[:].astype(jnp.int32)[None]
    ap = ap_ref[:].astype(jnp.int32)[None]
    fill = jnp.zeros_like(v)
    kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

    def body(k, acc):
        r = jax.lax.rem(k, 8)
        base_f = pl.multiple_of(m8 + k - r, 8)
        fwd = buf[r, :, :, pl.ds(base_f, a), :]
        r2 = jax.lax.rem(8 - r, 8)
        base_b = pl.multiple_of(m8 - k - r2, 8)
        bwd = buf[r2, :, :, pl.ds(base_b, a), :]
        acc = acc + jnp.where(ap >= k, fwd, fill)
        acc = acc + jnp.where(an >= k, bwd, fill)
        return acc

    res = jax.lax.fori_loop(1, jnp.minimum(kmax, m8) + 1, body, v)
    out_ref[:] = res.astype(out_ref.dtype)


def run_variant(kern_fn, vol, an, ap, max_arm, clones=False, bt=128):
    c, b, a, l = vol.shape
    ba = an.shape[0]
    bt = min(l, bt)
    grid = (b, _cdiv(l, bt))
    vol_spec = pl.BlockSpec((c, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    out_spec = vol_spec
    arm_spec = pl.BlockSpec((1, a, bt),
                            lambda bi, t: (bi if ba != 1 else 0, 0, t),
                            memory_space=pltpu.VMEM)
    if clones:
        m8 = _cdiv(max_arm, 8) * 8 + 8
        ap_len = _cdiv(a + 2 * m8, 8) * 8
        scratch = [pltpu.VMEM((8, c, 1, ap_len, bt), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((c, 1, a + 2 * max_arm, bt), jnp.float32)]
    return pl.pallas_call(
        functools.partial(kern_fn, max_arm=max_arm, op="sum"),
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=scratch,
    )(vol, an, ap)


def main():
    print("backend:", jax.devices()[0].platform)
    p = make_synthetic_pair(h=H, w=W, max_disp=D - 1, seed=0)
    img = jnp.asarray(p.left, jnp.float32)
    img2 = jnp.asarray(p.right, jnp.float32)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, H, W), np.float32))

    arms_fn = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))
    a0, a1 = arms_fn(img), arms_fn(img2)
    arms_int = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)
    an, ap = arms_int[2].astype(jnp.int32), arms_int[3].astype(jnp.int32)
    print("arm stats: max", int(jnp.max(arms_int)),
          "mean", float(jnp.mean(arms_int)))

    v4 = vol[None]   # [1, D, H, W] — vertical pass layout

    ref = jax.jit(lambda v, n, p: pk.sublane_pass_auto(v, n, p, MAX_ARM))(v4, an, ap)
    bench("v0 production", chain(lambda v, n, p: pk.sublane_pass_auto(
        v, n, p, MAX_ARM)), v4, an, ap)
    bench("v1 fixed-offset probe", chain(lambda v, n, p: run_variant(
        _taps_kernel_fixed, v, n, p, MAX_ARM)), v4, an, ap)

    for name, kern, kw in (
            ("v3 seg=64", functools.partial(_taps_kernel_seg, seg=64), {}),
            ("v3 seg=32", functools.partial(_taps_kernel_seg, seg=32), {}),
            ("v2 aligned clones", _taps_kernel_clones, {"clones": True}),
    ):
        try:
            got = jax.jit(lambda v, n, p, kern=kern, kw=kw: run_variant(
                kern, v, n, p, MAX_ARM, **kw))(v4, an, ap)
            err = float(jnp.max(jnp.abs(ref - got)))
            print(f"{name} max|diff| vs v0: {err}")
            bench(name, chain(lambda v, n, p, kern=kern, kw=kw: run_variant(
                kern, v, n, p, MAX_ARM, **kw)), v4, an, ap)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
