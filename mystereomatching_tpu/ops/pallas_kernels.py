"""Hand-written Pallas TPU kernels for the HBM-bound hot passes.

The CBCA inner pass (reference gen1DCumu + cal1DCost, stereoMatching.cpp:
3896-3926 / h:1643-1715) is a variable-footprint 1-D box sum: for every
volume element, sum the neighbors within its per-element arm bounds. The
pure-XLA formulation (ops/arms.arm_bounded_sum) runs 2*max_arm+1 static
shifted masked accumulations, each of which XLA materializes through HBM,
putting the pass ~70x off the bandwidth roofline at Teddy scale. This
kernel keeps the whole tap loop in VMEM.

Design notes (measured on v5e):
  * Reduction runs along the SUBLANE axis; taps are dynamic sublane
    slices (``pl.ds``) of a zero-padded scratch block — pure addressing.
    Lane-axis (W) reductions are handled by transposing the trailing two
    axes outside the kernel (XLA transposes are ~2x-bandwidth, two orders
    cheaper than in-kernel lane shuffles per tap).
  * ``pltpu.roll`` per tap is ~1.6x slower than ``pl.ds``; a fully
    unrolled tap loop leaves ~80 block-sized temporaries live and blows
    the 16MB scoped-vmem budget, so the loop is a ``fori_loop``.
  * The trip count is the block's max arm (a scalar ``jnp.max``), not the
    global bound: images with mostly short arms skip most taps.
  * In-kernel gathers/cumsum (prefix-sum + difference form) are not
    lowerable by current Mosaic — taps are the TPU-native formulation.

Wrap-around safety: taps read a zero-padded scratch, so no wrap occurs;
arm clamping (calHorVerDis cpp:3030-3041) additionally guarantees the
mask never admits out-of-image elements.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def tpu_backend() -> bool:
    """True when lowering targets a real TPU (incl. the axon tunnel)."""
    if os.environ.get("MYSM_NO_PALLAS"):
        return False
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        return False
    return plat in ("tpu", "axon")


def _taps_kernel(vol_ref, an_ref, ap_ref, out_ref, buf, *, max_arm: int):
    """One arm-bounded-sum pass along the sublane (axis-2) block dim.

    vol_ref/out_ref: [C, 1, A, B]; an/ap_ref: [1, A, B] int32;
    buf: [C, 1, A + 2*max_arm, B] scratch.
    """
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:]
    buf[:, :, :m, :] = jnp.zeros_like(buf[:, :, :m, :])
    buf[:, :, m + a:, :] = jnp.zeros_like(buf[:, :, m + a:, :])
    buf[:, :, m:m + a, :] = v
    an = an_ref[:][None]          # [1, 1, A, B]
    ap = ap_ref[:][None]
    zero = jnp.zeros_like(v)
    kmax = jnp.maximum(jnp.max(an_ref[:]), jnp.max(ap_ref[:]))

    def body(k, acc):
        fwd = buf[:, :, pl.ds(m + k, a), :]     # v[x + k]
        bwd = buf[:, :, pl.ds(m - k, a), :]     # v[x - k]
        acc = acc + jnp.where(ap >= k, fwd, zero)
        acc = acc + jnp.where(an >= k, bwd, zero)
        return acc

    out_ref[:] = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, v)


def _sublane_pass(vol: jnp.ndarray, an: jnp.ndarray, ap: jnp.ndarray,
                  max_arm: int, interpret: bool = False) -> jnp.ndarray:
    """Arm-bounded sum along axis 2 of vol [C, B, A, L]; arms [Ba, A, L]."""
    c, b, a, l = vol.shape
    ba = an.shape[0]
    bt = min(l, 128)
    grid = (b, _cdiv(l, bt))
    vol_spec = pl.BlockSpec((c, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((1, a, bt),
                            lambda bi, t: (bi if ba != 1 else 0, 0, t),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_taps_kernel, max_arm=max_arm)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((c, 1, a + 2 * max_arm, bt), vol.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=vol.size * (4 * max_arm + 1),
            bytes_accessed=vol.size * 8 + an.size * 8,
            transcendentals=0),
        interpret=interpret,
    )(vol, an.astype(jnp.int32), ap.astype(jnp.int32))


def arm_bounded_sum_pallas(
    vol: jnp.ndarray,
    arm_neg: jnp.ndarray,
    arm_pos: jnp.ndarray,
    axis: int,
    max_arm: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Arm-bounded 1-D sum along a spatial axis, Pallas TPU path.

    vol: [C, B, H, W] (C = channels sharing the same arms, B = batch,
    e.g. disparities); arm_neg/arm_pos: [Ba, H, W] int32 with Ba in
    {1, B}; axis: 2 (H) or 3 (W). Returns vol-shaped sum over
    [x - arm_neg, x + arm_pos].
    """
    assert vol.ndim == 4 and arm_neg.ndim == 3, (vol.shape, arm_neg.shape)
    assert arm_neg.shape[0] in (1, vol.shape[1]) and axis in (2, 3)
    if axis == 2:
        return _sublane_pass(vol, arm_neg, arm_pos, max_arm, interpret)
    out = _sublane_pass(jnp.swapaxes(vol, 2, 3),
                        jnp.swapaxes(arm_neg, 1, 2),
                        jnp.swapaxes(arm_pos, 1, 2), max_arm, interpret)
    return jnp.swapaxes(out, 2, 3)
