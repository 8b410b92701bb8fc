"""Prototype kernel variants for the arm-bounded-sum pass; pick the fastest."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mystereomatching_tpu.ops import arms as A

D, H, W, M, REPS = 60, 375, 450, 34, 20


def _cdiv(a, b):
    return -(-a // b)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


# ---- variant B: roll kernel with unrolled fori ----
def _kb(vol_ref, an_ref, ap_ref, out_ref, *, axis, max_arm, unroll):
    v = vol_ref[:]
    an = an_ref[:][None]
    ap = ap_ref[:][None]
    n = v.shape[axis]
    zero = jnp.zeros_like(v)

    def body(k, carry):
        acc, fwd, bwd = carry
        fwd = pltpu.roll(fwd, n - 1, axis=axis)
        bwd = pltpu.roll(bwd, 1, axis=axis)
        acc = acc + jnp.where(ap >= k, fwd, zero)
        acc = acc + jnp.where(an >= k, bwd, zero)
        return acc, fwd, bwd

    acc, _, _ = jax.lax.fori_loop(1, max_arm + 1, body, (v, v, v),
                                  unroll=unroll)
    out_ref[:] = acc


# ---- variant C: zero-padded scratch + dynamic slice taps ----
def _kc(vol_ref, an_ref, ap_ref, out_ref, buf, *, axis, max_arm, unroll):
    m = max_arm
    c, _, a, b = vol_ref.shape
    buf[:] = jnp.zeros_like(buf)
    if axis == 2:
        buf[:, :, m:m + a, :] = vol_ref[:]
    else:
        buf[:, :, :, m:m + b] = vol_ref[:]
    v = vol_ref[:]
    an = an_ref[:][None]
    ap = ap_ref[:][None]
    zero = jnp.zeros_like(v)

    def body(k, acc):
        if axis == 2:
            fwd = buf[:, :, pl.ds(m + k, a), :]
            bwd = buf[:, :, pl.ds(m - k, a), :]
        else:
            fwd = buf[:, :, :, pl.ds(m + k, b)]
            bwd = buf[:, :, :, pl.ds(m - k, b)]
        acc = acc + jnp.where(ap >= k, fwd, zero)
        acc = acc + jnp.where(an >= k, bwd, zero)
        return acc

    acc = jax.lax.fori_loop(1, max_arm + 1, body, v, unroll=unroll)
    out_ref[:] = acc


def call(kern, vol, an, ap, axis, max_arm, scratch, unroll, at=128):
    c = 1
    v4, an3, ap3 = vol[None], an, ap
    b, h, w = vol.shape
    if axis == 2:  # H reduce (block axis 2)
        bt = min(w, 128)
        grid = (b, _cdiv(w, bt))
        vs = pl.BlockSpec((c, 1, h, bt), lambda bi, t: (0, bi, 0, t), memory_space=pltpu.VMEM)
        as_ = pl.BlockSpec((1, h, bt), lambda bi, t: (bi, 0, t), memory_space=pltpu.VMEM)
        scr = [pltpu.VMEM((c, 1, h + 2 * max_arm, bt), jnp.float32)] if scratch else []
    else:
        grid = (b, _cdiv(h, at))
        vs = pl.BlockSpec((c, 1, at, w), lambda bi, t: (0, bi, t, 0), memory_space=pltpu.VMEM)
        as_ = pl.BlockSpec((1, at, w), lambda bi, t: (bi, t, 0), memory_space=pltpu.VMEM)
        scr = [pltpu.VMEM((c, 1, at, w + 2 * max_arm), jnp.float32)] if scratch else []
    f = functools.partial(kern, axis=axis, max_arm=max_arm, unroll=unroll)
    return pl.pallas_call(
        f, grid=grid, in_specs=[vs, as_, as_], out_specs=vs,
        out_shape=jax.ShapeDtypeStruct(v4.shape, v4.dtype),
        scratch_shapes=scr,
    )(v4, an3.astype(jnp.int32), ap3.astype(jnp.int32))[0]


def chain(passfn):
    def f(v, an, ap):
        for _ in range(REPS):
            v = passfn(v, an, ap) * 1e-2
        return v
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
    img2 = jnp.roll(img, 3, axis=1)
    vol = jnp.asarray(rng.random((D, H, W), np.float32))
    a0 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img)
    a1 = jax.jit(lambda i: A.cross_arms(i, 17, 34, 20, 6, 1))(img2)
    ai = jax.jit(lambda x, y: A.intersect_arms(x, y, D, 0))(a0, a1)

    for axis, name in ((2, "H(sublane)"), (3, "W(lane)")):
        an, ap = (ai[2], ai[3]) if axis == 2 else (ai[0], ai[1])
        ref = None
        for label, kern, scratch, unroll in (
                ("roll u1", _kb, False, 1),
                ("roll u4", _kb, False, 4),
                ("roll u8", _kb, False, 8),
                ("ds   u1", _kc, True, 1),
                ("ds   u4", _kc, True, 4),
                ("ds   u8", _kc, True, 8),
        ):
            try:
                fn = chain(lambda v, n, p, k=kern, s=scratch, u=unroll:
                           call(k, v, n, p, axis, M, s, u))
                out = fn(vol, an, ap)
                if ref is None:
                    ref = out
                err = float(jnp.max(jnp.abs(out - ref)))
                t = bench(fn, vol, an, ap)
                print(f"{name} {label}: {t/REPS*1e3:7.3f} ms  (diff {err:.1e})")
            except Exception as e:
                print(f"{name} {label}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
