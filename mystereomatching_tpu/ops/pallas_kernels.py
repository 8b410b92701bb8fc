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


_REDUCE_OPS = {
    "sum": (jnp.add, lambda dt: 0),
    "min": (jnp.minimum, lambda dt: (jnp.iinfo(dt).max
                                     if jnp.issubdtype(dt, jnp.integer)
                                     else jnp.finfo(dt).max)),
    "max": (jnp.maximum, lambda dt: (jnp.iinfo(dt).min
                                     if jnp.issubdtype(dt, jnp.integer)
                                     else jnp.finfo(dt).min)),
}


def _taps_kernel(vol_ref, an_ref, ap_ref, out_ref, buf, *, max_arm: int,
                 op: str, div_pair: bool = False, seg: int = 0):
    """One arm-bounded reduction pass along the sublane (axis-2) block dim.

    vol_ref/out_ref: [C, 1, A, B]; an/ap_ref: [1, A, B] int32;
    buf: [C, 1, A + 2*max_arm, B] scratch padded with the op identity.
    ``div_pair``: C == 2 and out_ref is [1, 1, A, B] =
    res[0] / max(res[1], 1) — CBCA's area normalization fused into the
    pass (halves the write traffic and drops the separate divide pass).
    ``seg``: evaluate the adaptive trip count (kmax) per ``seg``-row
    segment of the reduction axis instead of over the whole block (round
    5, ported from the clone kernel's win): arms are short and local
    (bench-scene mean ~1), so most segments run far fewer taps than the
    block max. Tap order per element is unchanged -> bit-identical.
    """
    # Compute in f32 regardless of the storage dtype: Mosaic supports
    # neither dynamic sublane slices (need 8-aligned starts) nor rotates on
    # sub-4-byte data, and the kernel is HBM-bound anyway — bf16 in HBM,
    # f32 in VMEM gets the bandwidth win with full tap flexibility.
    combine, ident_of = _REDUCE_OPS[op]
    cdt = jnp.float32 if jnp.issubdtype(vol_ref.dtype, jnp.floating) else jnp.int32
    ident = jnp.asarray(ident_of(cdt), cdt)
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:].astype(cdt)
    buf[:, :, :m, :] = jnp.full_like(buf[:, :, :m, :], ident)
    buf[:, :, m + a:, :] = jnp.full_like(buf[:, :, m + a:, :], ident)
    buf[:, :, m:m + a, :] = v
    # arms arrive in their storage dtype (int8/16/32); widen once per block
    an = an_ref[:].astype(jnp.int32)[None]          # [1, 1, A, B]
    ap = ap_ref[:].astype(jnp.int32)[None]

    if not seg or seg >= a:
        # whole-block path: byte-identical to the pre-seg kernel (full
        # range sub-slicing of refs is NOT used — rewriting out_ref[:]
        # as out_ref[:, :, 0:a, :] changed the Mosaic lowering)
        fill = jnp.full_like(v, ident)
        kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

        def body0(k, acc):
            fwd = buf[:, :, pl.ds(m + k, a), :]     # v[x + k]
            bwd = buf[:, :, pl.ds(m - k, a), :]     # v[x - k]
            acc = combine(acc, jnp.where(ap >= k, fwd, fill))
            acc = combine(acc, jnp.where(an >= k, bwd, fill))
            return acc

        res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body0, v)
        if div_pair:
            out_ref[:] = (res[:1] / jnp.maximum(res[1:], 1.0)).astype(
                out_ref.dtype)
        else:
            out_ref[:] = res.astype(out_ref.dtype)
        return

    segs = [(s0, min(seg, a - s0)) for s0 in range(0, a, seg)]
    for s0, sl in segs:
        an_s = an[:, :, s0:s0 + sl, :]
        ap_s = ap[:, :, s0:s0 + sl, :]
        acc0 = v[:, :, s0:s0 + sl, :]
        fill = jnp.full_like(acc0, ident)
        kmax = jnp.maximum(jnp.max(an_s), jnp.max(ap_s))

        def body(k, acc, s0=s0, sl=sl, an_s=an_s, ap_s=ap_s, fill=fill):
            fwd = buf[:, :, pl.ds(m + s0 + k, sl), :]     # v[x + k]
            bwd = buf[:, :, pl.ds(m + s0 - k, sl), :]     # v[x - k]
            acc = combine(acc, jnp.where(ap_s >= k, fwd, fill))
            acc = combine(acc, jnp.where(an_s >= k, bwd, fill))
            return acc

        res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, acc0)
        if div_pair:
            out_ref[:, :, s0:s0 + sl, :] = (
                res[:1] / jnp.maximum(res[1:], 1.0)).astype(out_ref.dtype)
        else:
            out_ref[:, :, s0:s0 + sl, :] = res.astype(out_ref.dtype)


def _taps_kernel_clones(vol_ref, an_ref, ap_ref, out_ref, buf, *,
                        max_arm: int, op: str, div_pair: bool = False,
                        seg: int = 64):
    """Aligned-clone variant of :func:`_taps_kernel` — same tap ORDER, so
    results are bit-identical; only the addressing differs.

    Round-4 measurement: the unaligned dynamic sublane slice is ~90% of
    the tap kernel's cost (fixed-offset probe 0.092 ms vs 0.496 ms/pass at
    Teddy scale) — Mosaic lowers each unaligned ``pl.ds`` read through a
    full-array sublane relayout. This kernel pre-builds 8 sublane-rotated
    copies of the identity-padded block (``buf[r][x] = padded[x + r]``), so
    tap k reads clone ``k % 8`` at a PROVABLY 8-aligned offset — pure
    addressing. The 8 rolls are paid once per block instead of a relayout
    per tap, and alignment also unlocks lane tiles wider than 128 (the
    unaligned path rejects them).

    ``seg``: the adaptive trip count (kmax) is evaluated per ``seg``-row
    segment of the reduction axis instead of over the whole block — arms
    are short and local (bench-scene mean ~1), so most segments run far
    fewer taps than the block max.
    """
    combine, ident_of = _REDUCE_OPS[op]
    cdt = jnp.float32 if jnp.issubdtype(vol_ref.dtype, jnp.floating) else jnp.int32
    ident = jnp.asarray(ident_of(cdt), cdt)
    m8 = _cdiv(max_arm, 8) * 8 + 8
    a = vol_ref.shape[2]
    c = vol_ref.shape[0]
    ap_len = buf.shape[3]
    v = vol_ref[:].astype(cdt)
    pad = jnp.full((c, 1, m8, v.shape[3]), ident, cdt)
    padded = jnp.concatenate([pad, v, pad], axis=2)
    if padded.shape[2] < ap_len:
        padded = jnp.concatenate(
            [padded, jnp.full((c, 1, ap_len - padded.shape[2], v.shape[3]),
                              ident, cdt)], axis=2)
    for r in range(8):
        buf[r] = padded if r == 0 else pltpu.roll(padded, ap_len - r, 2)
    an_all = an_ref[:].astype(jnp.int32)[None]
    ap_all = ap_ref[:].astype(jnp.int32)[None]

    for s0 in range(0, a, seg):
        sl = min(seg, a - s0)
        an = an_all[:, :, s0:s0 + sl, :]
        ap = ap_all[:, :, s0:s0 + sl, :]
        acc0 = v[:, :, s0:s0 + sl, :]
        fill = jnp.full_like(acc0, ident)
        kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

        def body(k, acc, sl=sl, s0=s0, an=an, ap=ap, fill=fill):
            r = jax.lax.rem(k, 8)
            fwd = buf[r, :, :,
                      pl.ds(pl.multiple_of(m8 + s0 + k - r, 8), sl), :]
            r2 = jax.lax.rem(8 - r, 8)
            bwd = buf[r2, :, :,
                      pl.ds(pl.multiple_of(m8 + s0 - k - r2, 8), sl), :]
            acc = combine(acc, jnp.where(ap >= k, fwd, fill))
            acc = combine(acc, jnp.where(an >= k, bwd, fill))
            return acc

        res = jax.lax.fori_loop(1, jnp.minimum(kmax, m8) + 1, body, acc0)
        if div_pair:
            out_ref[:, :, s0:s0 + sl, :] = (
                res[:1] / jnp.maximum(res[1:], 1.0)).astype(out_ref.dtype)
        else:
            out_ref[:, :, s0:s0 + sl, :] = res.astype(out_ref.dtype)


def _taps_kernel_area(vol_ref, an1_ref, ap1_ref, an_ref, ap_ref, out_ref,
                      buf, *, max_arm: int):
    """CBCA second-direction pass with the support-area channel built
    IN-KERNEL and the normalization fused (round 5).

    The former path materialized area_of(arms) as a full f32 [D,H,W]
    volume, stacked it with the cost volume, and ran the [2,...] div_pair
    kernel — ~1.4 ms/vol of pure stack/broadcast traffic at Teddy B=16
    (scripts/profile_cbca_stage.py). Here the first-direction arms
    (an1/ap1) come in as blocks and the area channel
    min(an1,m) + min(ap1,m) + 1 (aggregation.cbca area_of) is computed in
    VMEM; both channels run the SAME tap loop as :func:`_taps_kernel`
    (identical combine order -> bit-identical), and the output is
    res_vol / max(res_area, 1) (genfinalVm_cbca cpp:3969-3992).

    vol_ref: [1, 1, A, B]; an1/ap1/an/ap_ref: [1, A, B];
    out_ref: [1, 1, A, B]; buf: [2, 1, A + 2*max_arm, B] scratch.
    """
    m = max_arm
    a = vol_ref.shape[2]
    v = vol_ref[:].astype(jnp.float32)                       # [1,1,A,B]
    an1 = an1_ref[:].astype(jnp.int32)
    ap1 = ap1_ref[:].astype(jnp.int32)
    area = (jnp.minimum(an1, m) + jnp.minimum(ap1, m) + 1
            ).astype(jnp.float32)[None]                      # [1,1,A,B]
    stacked = jnp.concatenate([v, area], 0)                  # [2,1,A,B]
    buf[:, :, :m, :] = jnp.zeros_like(buf[:, :, :m, :])
    buf[:, :, m + a:, :] = jnp.zeros_like(buf[:, :, m + a:, :])
    buf[:, :, m:m + a, :] = stacked
    an = an_ref[:].astype(jnp.int32)[None]
    ap = ap_ref[:].astype(jnp.int32)[None]
    fill = jnp.zeros_like(stacked)
    kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

    def body(k, acc):
        fwd = buf[:, :, pl.ds(m + k, a), :]
        bwd = buf[:, :, pl.ds(m - k, a), :]
        acc = acc + jnp.where(ap >= k, fwd, fill)
        acc = acc + jnp.where(an >= k, bwd, fill)
        return acc

    res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, stacked)
    out_ref[:] = (res[:1] / jnp.maximum(res[1:], 1.0)).astype(out_ref.dtype)


def sublane_pass_area(vol: jnp.ndarray, an1: jnp.ndarray, ap1: jnp.ndarray,
                      an: jnp.ndarray, ap: jnp.ndarray, max_arm: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused CBCA second pass: aggregate ``vol`` [B, A, L] and the
    in-kernel area channel along axis 1 with arm bounds an/ap, divide.
    an1/ap1: first-direction arms defining the area channel. See
    :func:`_taps_kernel_area`."""
    c = 2
    b, a, l = vol.shape
    ba = an.shape[0]
    bt = min(l, int(os.environ.get("MYSM_CBCA_BT", "128")))
    grid = (b, _cdiv(l, bt))
    vol_spec = pl.BlockSpec((1, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((1, a, bt),
                            lambda bi, t: (bi if ba != 1 else 0, 0, t),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_taps_kernel_area, max_arm=max_arm),
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec, arm_spec, arm_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct((1,) + vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((c, 1, a + 2 * max_arm, bt),
                                   jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=vol.size * 2 * (4 * max_arm + 1),
            bytes_accessed=vol.size * 8 + an.size * 16,
            transcendentals=0),
        interpret=interpret,
    )(vol[None], an1, ap1, an, ap)[0]


def sublane_pass_fits(c: int, a: int, max_arm: int) -> bool:
    """Whether the arm-taps kernel's full-axis block (+f32 scratch/temps)
    fits scoped VMEM. Beyond this, callers use the windowed-lookahead
    kernel (:func:`_sublane_pass_windowed`) on TPU, XLA taps elsewhere.
    (~12 live axis-length f32 buffers incl. double-buffered I/O; 2948
    sublanes OOMed at 18.09M/16M, so the bound sits safely below that.)"""
    return c * (a + 2 * max_arm) <= 2400


def _taps_windowed_kernel(vol_ref, an_ref, ap_ref, out_ref, win, hist, tail,
                          *, max_arm: int, op: str, ab: int, n_a: int):
    """Windowed arm-bounded reduction along sublane axis, lookahead form.

    Grid's last dim j runs 0..n_a (inclusive): step j FETCHES axis-block
    min(j, n_a-1) of vol and EMITS output block j-1 (step 0 primes the
    pipeline; output index map revisits block 0 so its j=0 garbage is
    overwritten in-VMEM before any flush). Scratch carries the previous
    block (``hist``) and the tail of the one before (``tail``), so each
    input block is read from HBM exactly once regardless of axis length.

    Correctness at the seams relies on the arm-clamping invariant
    (calHorVerDis cpp:3030-3041): arms never reach outside the image, so
    window sublanes beyond the array (Pallas pad of the last block, or the
    identity-filled left edge) are never *selected* by the tap masks.
    """
    combine, ident_of = _REDUCE_OPS[op]
    cdt = jnp.float32 if jnp.issubdtype(vol_ref.dtype, jnp.floating) else jnp.int32
    ident = jnp.asarray(ident_of(cdt), cdt)
    m = max_arm
    j = pl.program_id(2)
    cur = vol_ref[:].astype(cdt)                       # block min(j, n_a-1)

    @pl.when(j >= 1)
    def _compute():
        win[:, :, :m, :] = jnp.where(j == 1, jnp.full_like(tail[:], ident),
                                     tail[:])
        win[:, :, m:m + ab, :] = hist[:]
        win[:, :, m + ab:, :] = jnp.where(j == n_a,
                                          jnp.full_like(cur[:, :, :m, :], ident),
                                          cur[:, :, :m, :])
        v = hist[:]
        an = an_ref[:].astype(jnp.int32)[None]         # [1, 1, ab, B]
        ap = ap_ref[:].astype(jnp.int32)[None]
        fill = jnp.full_like(v, ident)
        kmax = jnp.maximum(jnp.max(an), jnp.max(ap))

        def body(k, acc):
            fwd = win[:, :, pl.ds(m + k, ab), :]
            bwd = win[:, :, pl.ds(m - k, ab), :]
            acc = combine(acc, jnp.where(ap >= k, fwd, fill))
            acc = combine(acc, jnp.where(an >= k, bwd, fill))
            return acc

        res = jax.lax.fori_loop(1, jnp.minimum(kmax, m) + 1, body, v)
        out_ref[:] = res.astype(out_ref.dtype)

    tail[:] = jnp.where(j == 0, jnp.full_like(tail[:], ident),
                        hist[:, :, ab - m:, :])
    hist[:] = cur


def _sublane_pass_windowed(vol: jnp.ndarray, an: jnp.ndarray, ap: jnp.ndarray,
                           max_arm: int, interpret: bool = False,
                           op: str = "sum", ab: int = 0) -> jnp.ndarray:
    """Arm-bounded reduction along axis 2 of vol [C, B, A, L] for A too long
    to hold in one VMEM block (full-res rows/columns). Same tap order as
    :func:`_sublane_pass`, so results are bit-identical."""
    c, b, a, l = vol.shape
    ba = an.shape[0]
    m = max_arm
    bt = min(l, 128)
    if not ab:
        # axis block: ~6 live (c, ab, bt) f32 buffers (win/hist/cur/out +
        # tap temporaries) must fit the 16MB scoped-vmem stack; c*(ab+2m)
        # ~1000 sublanes measured safe, 1600 OOMs at full-res
        ab = max(8 * _cdiv(m, 8), (1024 // c - 2 * m) // 8 * 8)
    ab = min(ab, _cdiv(a, 8) * 8)
    n_a = _cdiv(a, ab)
    grid = (b, _cdiv(l, bt), n_a + 1)
    vol_spec = pl.BlockSpec(
        (c, 1, ab, bt),
        lambda bi, t, j: (0, bi, jnp.minimum(j, n_a - 1), t),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (c, 1, ab, bt),
        lambda bi, t, j: (0, bi, jnp.maximum(j - 1, 0), t),
        memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec(
        (1, ab, bt),
        lambda bi, t, j: (bi if ba != 1 else 0, jnp.maximum(j - 1, 0), t),
        memory_space=pltpu.VMEM)
    kern = functools.partial(_taps_windowed_kernel, max_arm=m, op=op,
                             ab=ab, n_a=n_a)
    sdt = jnp.float32 if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.int32
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((c, 1, ab + 2 * m, bt), sdt),
                        pltpu.VMEM((c, 1, ab, bt), sdt),
                        pltpu.VMEM((c, 1, m, bt), sdt)],
        cost_estimate=pl.CostEstimate(
            flops=vol.size * (4 * max_arm + 1),
            bytes_accessed=vol.size * 8 + an.size * 8,
            transcendentals=0),
        interpret=interpret,
    )(vol, an, ap)


def sublane_pass_auto(vol: jnp.ndarray, an: jnp.ndarray, ap: jnp.ndarray,
                      max_arm: int, interpret: bool = False,
                      op: str = "sum",
                      div_pair: bool = False) -> jnp.ndarray:
    """Arm-bounded reduction along axis 2: full-axis block when it fits
    scoped VMEM, windowed-lookahead kernel otherwise."""
    if div_pair and vol.shape[0] != 2:
        raise ValueError("div_pair needs a [2, ...] stacked volume")
    if sublane_pass_fits(vol.shape[0], vol.shape[2], max_arm):
        return _sublane_pass(vol, an, ap, max_arm, interpret, op, div_pair)
    if div_pair:
        st = _sublane_pass_windowed(vol, an, ap, max_arm, interpret, op)
        return st[:1] / jnp.maximum(st[1:], 1.0)
    return _sublane_pass_windowed(vol, an, ap, max_arm, interpret, op)


def _sublane_pass(vol: jnp.ndarray, an: jnp.ndarray, ap: jnp.ndarray,
                  max_arm: int, interpret: bool = False,
                  op: str = "sum", div_pair: bool = False) -> jnp.ndarray:
    """Arm-bounded reduction along axis 2 of vol [C, B, A, L]; arms [Ba, A, L].

    Default kernel: unaligned dynamic-slice taps (:func:`_taps_kernel`).
    The round-4 aligned-clone kernel (:func:`_taps_kernel_clones`,
    bit-identical) measured 2.6x faster SINGLE-frame (0.435 vs 1.149
    ms/pass) but REGRESSED the B=16 batched headline 580 -> 514
    MP·disp/s (clone-scratch VMEM pressure under the vmap grid axis) —
    the round-4 default flip caused BENCH_r04's drop. Clones stay opt-in
    via MYSM_CBCA_CLONES=1 until a variant wins both shapes."""
    c, b, a, l = vol.shape
    ba = an.shape[0]
    use_clones = bool(os.environ.get("MYSM_CBCA_CLONES"))
    if use_clones:
        m8 = _cdiv(max_arm, 8) * 8 + 8
        ap_len = _cdiv(a + 2 * m8, 8) * 8
        # widest lane tile whose clone scratch + double-buffered blocks fit
        # scoped VMEM (~10MB): 8 clones of [c, ap_len] + ~4 live [c, a]
        bt = int(os.environ.get("MYSM_CBCA_BT", "0"))
        if not bt:
            bt = min(512, _cdiv(l, 128) * 128)
            while bt > 128 and (8 * c * ap_len + 6 * c * a) * bt * 4 > 10 * 2**20:
                bt -= 128
        bt = min(_cdiv(l, 128) * 128, bt)
        seg = int(os.environ.get("MYSM_CBCA_SEG", "64"))
        kern = functools.partial(_taps_kernel_clones, max_arm=max_arm, op=op,
                                 div_pair=div_pair, seg=seg)
        scratch_shape = (8, c, 1, ap_len, bt)
    else:
        # lane-tile width: 128 is the only width Mosaic accepts for the
        # unaligned dynamic sublane taps (wider tiles fail "cannot
        # statically prove index ... multiple of 8" — measured round 4)
        bt = min(l, int(os.environ.get("MYSM_CBCA_BT", "128")))
        # per-seg kmax measured SLOWER for taps at B=16 (0.671 vs 0.578
        # ms/pass/frame — the extra fori+write per segment breaks block
        # pipelining); whole-block trip count stays the default
        seg = int(os.environ.get("MYSM_CBCA_TAPS_SEG", "0"))
        kern = functools.partial(_taps_kernel, max_arm=max_arm, op=op,
                                 div_pair=div_pair, seg=seg)
        scratch_shape = (c, 1, a + 2 * max_arm, bt)
    grid = (b, _cdiv(l, bt))
    c_out = 1 if div_pair else c
    vol_spec = pl.BlockSpec((c, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((c_out, 1, a, bt), lambda bi, t: (0, bi, 0, t),
                            memory_space=pltpu.VMEM)
    arm_spec = pl.BlockSpec((1, a, bt),
                            lambda bi, t: (bi if ba != 1 else 0, 0, t),
                            memory_space=pltpu.VMEM)
    sdt = jnp.float32 if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.int32
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[vol_spec, arm_spec, arm_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c_out,) + vol.shape[1:], vol.dtype),
        scratch_shapes=[pltpu.VMEM(scratch_shape, sdt)],
        cost_estimate=pl.CostEstimate(
            flops=vol.size * (4 * max_arm + 1),
            bytes_accessed=vol.size * 8 + an.size * 8,
            transcendentals=0),
        interpret=interpret,
    )(vol, an, ap)


def _pi_dir_kernel(dpad_ref, cpad_ref, dsp_ref, cdf_ref, *, offs_k, m: int):
    """One direction of the nearest-valid scan (properIpol cpp:7395-7490).

    dpad_ref: [Hp, Wp] int32 disparity padded by m with -1;
    cpad_ref: [3, Hp, Wp] f32 image padded with 1e9. Outputs: first valid
    disparity along the ray (dsp, -1 if none) and its max-channel color
    diff (cdf, +max if none). State lives in the output refs so the
    unrolled steps' temporaries die immediately (a single 16x20-step
    kernel blows Mosaic's compile budget).
    """
    h = dsp_ref.shape[0]
    w = dsp_ref.shape[1]
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    dsp_ref[:] = jnp.full((h, w), -1, jnp.int32)
    cdf_ref[:] = jnp.full((h, w), inf, jnp.float32)
    for dv, du in offs_k:
        nd = dpad_ref[m + dv:m + dv + h, m + du:m + du + w]
        hit = (dsp_ref[:] < 0) & (nd >= 0)
        # channel-by-channel [H,W] pieces: a [3,H,W] per-step temp tips the
        # kernel over the scoped-VMEM budget
        cd = jnp.abs(cpad_ref[0, m + dv:m + dv + h, m + du:m + du + w]
                     - cpad_ref[0, m:m + h, m:m + w])
        for c in (1, 2):
            cd = jnp.maximum(
                cd, jnp.abs(cpad_ref[c, m + dv:m + dv + h, m + du:m + du + w]
                            - cpad_ref[c, m:m + h, m:m + w]))
        dsp_ref[:] = jnp.where(hit, nd, dsp_ref[:])
        cdf_ref[:] = jnp.where(hit, cd, cdf_ref[:])


def proper_interpolation_pallas(disp: jnp.ndarray, image_chw: jnp.ndarray,
                                offsets, interpret: bool = False):
    """16-direction nearest-valid scan: pad once in XLA, then one compact
    Pallas kernel per direction (whole plane in VMEM; 20 static-slice taps
    replace 320 HBM-materialized shifts). Returns (occ_fill, mis_disp,
    mis_cdif, found_any); callers gate on plane size fitting VMEM."""
    h, w = disp.shape
    m = int(max(abs(int(o)) for ks in offsets for st in ks for o in st))
    dpad = jnp.pad(disp.astype(jnp.int32), m, constant_values=-1)
    cpad = jnp.pad(image_chw.astype(jnp.float32),
                   ((0, 0), (m, m), (m, m)), constant_values=1e9)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((h, w), jnp.int32),
                  jax.ShapeDtypeStruct((h, w), jnp.float32))

    big = jnp.int32(10 ** 6)
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    occ = jnp.full((h, w), big, jnp.int32)
    fany = jnp.zeros((h, w), jnp.bool_)
    misd = jnp.full((h, w), -1, jnp.int32)
    misc = jnp.full((h, w), inf, jnp.float32)
    for k in range(len(offsets)):
        offs_k = tuple((int(st[0]), int(st[1])) for st in offsets[k])
        dsp, cdf = pl.pallas_call(
            functools.partial(_pi_dir_kernel, offs_k=offs_k, m=m),
            in_specs=[vspec, vspec],
            out_specs=(vspec, vspec),
            out_shape=out_shapes,
            interpret=interpret,
        )(dpad, cpad)
        ok = dsp >= 0
        occ = jnp.minimum(occ, jnp.where(ok, dsp, big))
        fany = fany | ok
        cde = jnp.where(ok & (cdf < 255.0), cdf, inf)
        upd = cde < misc                 # first strict min wins (argmin)
        misd = jnp.where(upd, dsp, misd)
        misc = jnp.where(upd, cde, misc)
    return occ, misd, misc, fany.astype(jnp.int32)


def _pi_grid_kernel(dpad_ref, cpad_ref, dsp_ref, cdf_ref, *,
                    offsets, m: int, h: int, w: int):
    """All 16 directions as ONE kernel with grid=(16,) (VERDICT r2 item 6:
    16 separate Mosaic compiles over the tunnel dominated the cold start).

    Mosaic has no dynamic-start slicing at the value level, so each
    direction's statically-offset tap chain sits under a ``pl.when``
    predicated on the grid index — one compile of 16 branches instead of
    16 kernel compiles (the branch bodies are exactly the per-direction
    kernels'). Outputs land in the [16, H, W] blocks' k-th rows; the
    occ/mis reduction over directions stays in XLA.
    """
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    pid = pl.program_id(0)
    dsp_ref[0] = jnp.full((h, w), -1, jnp.int32)
    cdf_ref[0] = jnp.full((h, w), inf, jnp.float32)
    for k, offs_k in enumerate(offsets):

        @pl.when(pid == k)
        def _branch(offs_k=offs_k):
            for dv, du in offs_k:
                nd = dpad_ref[m + dv:m + dv + h, m + du:m + du + w]
                hit = (dsp_ref[0] < 0) & (nd >= 0)
                cd = jnp.abs(cpad_ref[0, m + dv:m + dv + h,
                                      m + du:m + du + w]
                             - cpad_ref[0, m:m + h, m:m + w])
                for c in (1, 2):
                    cd = jnp.maximum(
                        cd, jnp.abs(cpad_ref[c, m + dv:m + dv + h,
                                             m + du:m + du + w]
                                    - cpad_ref[c, m:m + h, m:m + w]))
                dsp_ref[0] = jnp.where(hit, nd, dsp_ref[0])
                cdf_ref[0] = jnp.where(hit, cd, cdf_ref[0])


def proper_interpolation_pallas_grid(disp: jnp.ndarray,
                                     image_chw: jnp.ndarray,
                                     offsets, interpret: bool = False):
    """Grid-over-directions variant of :func:`proper_interpolation_pallas`:
    one Mosaic compile instead of 16. Same return contract."""
    h, w = disp.shape
    n_dirs = len(offsets)
    m = int(max(abs(int(o)) for ks in offsets for st in ks for o in st))
    offs_static = tuple(tuple((int(st[0]), int(st[1])) for st in ks)
                        for ks in offsets)
    dpad = jnp.pad(disp.astype(jnp.int32), m, constant_values=-1)
    cpad = jnp.pad(image_chw.astype(jnp.float32),
                   ((0, 0), (m, m), (m, m)), constant_values=1e9)

    dsp, cdf = pl.pallas_call(
        functools.partial(_pi_grid_kernel, offsets=offs_static, m=m,
                          h=h, w=w),
        grid=(n_dirs,),
        in_specs=[
            pl.BlockSpec(dpad.shape, lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cpad.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, h, w), lambda k: (k, 0, 0)),
                   pl.BlockSpec((1, h, w), lambda k: (k, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_dirs, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((n_dirs, h, w), jnp.float32)),
        interpret=interpret,
    )(dpad, cpad)

    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    ok = dsp >= 0
    occ = jnp.min(jnp.where(ok, dsp, 10 ** 6), axis=0)
    fany = jnp.any(ok, axis=0)
    cde = jnp.where(ok & (cdf < 255.0), cdf, inf)
    kbest = jnp.argmin(cde, axis=0)                  # first min wins
    misd = jnp.take_along_axis(dsp, kbest[None], 0)[0]
    misc = jnp.min(cde, axis=0)
    misd = jnp.where(jnp.isfinite(misc) & (misc < inf), misd, -1)
    return occ, misd, misc, fany.astype(jnp.int32)


def _pi_dir_kernel_tiled(dpad_ref, cpad_ref, dsp_ref, cdf_ref, *,
                         offs_k, m: int, th: int, tw: int):
    """Tiled variant of :func:`_pi_dir_kernel`: one grid step per halo'd
    tile [th+2m, tw+2m] (full-res planes don't fit VMEM whole)."""
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    dsp_ref[0] = jnp.full((th, tw), -1, jnp.int32)
    cdf_ref[0] = jnp.full((th, tw), inf, jnp.float32)
    for dv, du in offs_k:
        nd = dpad_ref[0, m + dv:m + dv + th, m + du:m + du + tw]
        hit = (dsp_ref[0] < 0) & (nd >= 0)
        cd = jnp.abs(cpad_ref[0, 0, m + dv:m + dv + th, m + du:m + du + tw]
                     - cpad_ref[0, 0, m:m + th, m:m + tw])
        for c in (1, 2):
            cd = jnp.maximum(
                cd, jnp.abs(cpad_ref[0, c, m + dv:m + dv + th,
                                     m + du:m + du + tw]
                            - cpad_ref[0, c, m:m + th, m:m + tw]))
        dsp_ref[0] = jnp.where(hit, nd, dsp_ref[0])
        cdf_ref[0] = jnp.where(hit, cd, cdf_ref[0])


def proper_interpolation_pallas_tiled(disp: jnp.ndarray,
                                      image_chw: jnp.ndarray,
                                      offsets, tile: int = 384,
                                      interpret: bool = False):
    """Proper interpolation on planes too large for whole-plane VMEM:
    the padded plane is cut into overlapping halo'd tiles (the ray reach m
    is small), one grid step per tile per direction. Bit-identical to the
    whole-plane kernel / XLA fallback — every tap sees the same values."""
    h, w = disp.shape
    m = int(max(abs(int(o)) for ks in offsets for st in ks for o in st))
    th = tw = tile
    nh, nw = _cdiv(h, th), _cdiv(w, tw)
    t = nh * nw
    dpad = jnp.pad(disp.astype(jnp.int32),
                   ((m, m + nh * th - h), (m, m + nw * tw - w)),
                   constant_values=-1)
    cpad = jnp.pad(image_chw.astype(jnp.float32),
                   ((0, 0), (m, m + nh * th - h), (m, m + nw * tw - w)),
                   constant_values=1e9)
    dt = jnp.stack([dpad[i * th:(i + 1) * th + 2 * m,
                         j * tw:(j + 1) * tw + 2 * m]
                    for i in range(nh) for j in range(nw)])
    ct = jnp.stack([cpad[:, i * th:(i + 1) * th + 2 * m,
                         j * tw:(j + 1) * tw + 2 * m]
                    for i in range(nh) for j in range(nw)])
    dspec = pl.BlockSpec((1, th + 2 * m, tw + 2 * m), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 3, th + 2 * m, tw + 2 * m),
                         lambda ti: (ti, 0, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, th, tw), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((t, th, tw), jnp.int32),
                  jax.ShapeDtypeStruct((t, th, tw), jnp.float32))

    def untile(x):
        return (x.reshape(nh, nw, th, tw).swapaxes(1, 2)
                .reshape(nh * th, nw * tw)[:h, :w])

    big = jnp.int32(10 ** 6)
    inf = jnp.float32(jnp.finfo(jnp.float32).max)
    occ = jnp.full((t, th, tw), big, jnp.int32)
    fany = jnp.zeros((t, th, tw), jnp.bool_)
    misd = jnp.full((t, th, tw), -1, jnp.int32)
    misc = jnp.full((t, th, tw), inf, jnp.float32)
    for k in range(len(offsets)):
        offs_k = tuple((int(st[0]), int(st[1])) for st in offsets[k])
        dsp, cdf = pl.pallas_call(
            functools.partial(_pi_dir_kernel_tiled, offs_k=offs_k, m=m,
                              th=th, tw=tw),
            grid=(t,),
            in_specs=[dspec, cspec],
            out_specs=(ospec, ospec),
            out_shape=out_shapes,
            interpret=interpret,
        )(dt, ct)
        ok = dsp >= 0
        occ = jnp.minimum(occ, jnp.where(ok, dsp, big))
        fany = fany | ok
        cde = jnp.where(ok & (cdf < 255.0), cdf, inf)
        upd = cde < misc                 # first strict min wins (argmin)
        misd = jnp.where(upd, dsp, misd)
        misc = jnp.where(upd, cde, misc)
    return (untile(occ), untile(misd), untile(misc),
            untile(fany.astype(jnp.int32)))


def _wta_kernel(vol_ref, out_ref, *, choose_small: bool):
    """First-occurrence argmin/argmax over the leading (D) block axis.

    vol_ref: [D, At, W]; out_ref: [At, W] int32. XLA's variadic
    (value, index) argmin reduce over the major axis runs ~40x off the
    bandwidth roofline on TPU; min + iota-select + min is 4 VPU ops/elem.
    """
    v = vol_ref[:]
    if v.dtype.itemsize < 4:        # Mosaic relayout limits on narrow types
        v = v.astype(jnp.float32)
    d_ = v.shape[0]
    red = jnp.min(v, axis=0) if choose_small else jnp.max(v, axis=0)
    ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    hit = jnp.where(v == red[None], ids, d_)
    out_ref[:] = jnp.min(hit, axis=0)


def wta_pallas(vol: jnp.ndarray, choose_small: bool = True,
               interpret: bool = False) -> jnp.ndarray:
    """Plain WTA (gen_dispFromVm cpp:3928-3967) as a Pallas kernel.

    vol: [D, H, W] -> int32 [H, W] (first index achieving the extremum,
    matching jnp.argmin/argmax semantics)."""
    d_, h, w = vol.shape
    # size tiles so ~4 live [D, at, wt] buffers fit in scoped VMEM; for
    # large D the width tiles before the row tile drops below 8
    budget = 10 * 1024 * 1024
    wt = _cdiv(w, 128) * 128
    while wt > 128 and d_ * wt * 16 * 8 > budget:
        wt -= 128
    at = max(8, min(h, budget // (d_ * wt * 16) // 8 * 8))
    grid = (_cdiv(h, at), _cdiv(w, wt))
    return pl.pallas_call(
        functools.partial(_wta_kernel, choose_small=choose_small),
        grid=grid,
        in_specs=[pl.BlockSpec((d_, at, wt), lambda t, s: (0, t, s),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((at, wt), lambda t, s: (t, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(vol)


def _sgm_kernel(vol_ref, ps_ref, mask_ref, init_ref, out_ref, carry,
                *, p1: float, p2: float, has_mask: bool,
                reverse: bool = False, h_total: int = 0):
    """SGM scan over one [Gb, D, Hc, Wt] block, top-down or bottom-up.

    Recurrence per row (updateCost h:2268-2274, matching ops/sgm._scan_down
    bit for bit):
        L(r,d) = C(r,d) + min(L(r-1,d), minL + P2*s,
                              min(L(r-1,d-1), L(r-1,d+1)) + P1*s) - minL
    carry: [Gb, D, Wt] scratch holding the previous row's L, persisted
    across H-chunk grid steps (TPU grid steps run sequentially on the
    core); reset to the zero scan-edge state at each band's first chunk.
    Gb > 1 interleaves that many independent scans in ONE row loop — the
    serial row recurrence carries a fixed per-iteration floor, and a
    fatter body amortizes it across scans.

    ``reverse`` scans bottom-up directly (callers pass chunks in reversed
    grid order via the index map) — no flipped input/output copies. Rows
    at global index >= h_total (the padded tail of the last block, which a
    reverse scan meets FIRST) neither update the carry nor store.
    """
    gb, d_, hc, wt = vol_ref.shape
    big = jnp.asarray(jnp.finfo(vol_ref.dtype).max, vol_ref.dtype)
    big_row = jnp.full((gb, 1, wt), big, vol_ref.dtype)
    n_chunks = pl.num_programs(2)

    @pl.when(pl.program_id(2) == 0)
    def _():
        if init_ref is None:
            carry[:] = jnp.zeros_like(carry)
        else:
            carry[:] = init_ref[:]      # neighbor band's boundary Lr row

    if reverse:
        # this block's first row index within the full (padded) array
        block0 = (n_chunks - 1 - pl.program_id(2)) * hc
    else:
        block0 = pl.program_id(2) * hc

    def update(prev, c, ps, m_row):
        # prev/c: [Gb, D, Wt]; ps/m_row: [Gb, 1, Wt]
        min_l = jnp.min(prev, axis=1, keepdims=True)
        up = jnp.concatenate([big_row, prev[:, :-1]], 1)
        dn = jnp.concatenate([prev[:, 1:], big_row], 1)
        best = jnp.minimum(jnp.minimum(prev, min_l + p2 * ps),
                           jnp.minimum(up, dn) + p1 * ps)
        l = (c + best - min_l).astype(prev.dtype)
        if m_row is not None:
            l = l * m_row
        return l

    def step_rows(rs, prev):
        r = (hc - 1 - rs) if reverse else rs
        c = vol_ref[:, :, pl.ds(r, 1), :][:, :, 0, :]   # [Gb, D, Wt]
        ps = ps_ref[:, pl.ds(r, 1), :]                  # [Gb, 1, Wt]
        m_row = mask_ref[:, pl.ds(r, 1), :] if has_mask else None
        l = update(prev, c, ps, m_row)
        if reverse:
            # padded tail rows are scan-inert (carry unchanged, no store)
            valid = (block0 + r) < h_total
            l = jnp.where(valid, l, prev)
        out_ref[:, :, pl.ds(r, 1), :] = l[:, :, None, :]
        return l

    if vol_ref.dtype.itemsize >= 4:
        carry[:] = jax.lax.fori_loop(0, hc, step_rows, carry[:])
    else:
        # sub-4-byte dtypes need 8-aligned dynamic sublane starts: read an
        # aligned 8-row group, recur over static rows, store the group
        # (gb forced to 1 by the wrapper for narrow dtypes)
        def group(gs, prev):
            gi = (hc // 8 - 1 - gs) if reverse else gs
            base = pl.multiple_of(gi * 8, 8)
            cg = vol_ref[:, :, pl.ds(base, 8), :]           # [1, D, 8, Wt]
            psg = ps_ref[:, pl.ds(base, 8), :]              # [1, 8, Wt]
            mg = mask_ref[:, pl.ds(base, 8), :] if has_mask else None
            outs = [None] * 8
            order = range(7, -1, -1) if reverse else range(8)
            for j in order:
                l = update(prev, cg[:, :, j], psg[:, j:j + 1, :],
                           mg[:, j:j + 1, :] if has_mask else None)
                if reverse:
                    valid = (block0 + base + j) < h_total
                    l = jnp.where(valid, l, prev)
                prev = l
                outs[j] = l[:, :, None]
            out_ref[:, :, pl.ds(base, 8), :] = jnp.concatenate(outs, 2)
            return prev

        carry[:] = jax.lax.fori_loop(0, hc // 8, group, carry[:])


def sgm_scan_pallas(vol: jnp.ndarray, pscale: jnp.ndarray,
                    mask=None, p1: float = 1.0, p2: float = 3.0,
                    init=None, reverse: bool = False,
                    interpret: bool = False,
                    wt_override: int = 0, hc_override: int = 0,
                    g_block: int = 0) -> jnp.ndarray:
    """Batched SGM path-cost scan, top-down (default) or bottom-up.

    vol: [G, D, H, W] cost volumes (callers pre-transpose/skew per
    orientation; ``reverse=True`` scans bottom-up in place of flipping);
    pscale: [G, H, W] per-pixel P1/P2 multiplier; mask: optional [G, H, W]
    in-image mask (skewed diagonal buffers). Returns [G, D, H, W] L_r.

    One pallas_call replaces H sequential XLA scan steps — per-step
    dispatch overhead dominated the lax.scan formulation (~30us x 825
    steps at Teddy scale).
    """
    g, d_, h, w = vol.shape
    # Interleave factor: how many independent scans share one row loop
    # (the serial row recurrence has a fixed per-iteration floor; a
    # fatter body amortizes it). Default 1 until measured on hardware;
    # MYSM_SGM_GB=2 enables pairing for A/B.
    gb = g_block or int(os.environ.get("MYSM_SGM_GB", "1"))
    if vol.dtype.itemsize < 4 or g % gb:
        gb = 1
    # Full-width row steps: the row loop is serial, so fatter rows amortize
    # its fixed per-iteration overhead (measured 4x at Teddy scale vs
    # 128-lane tiles). Cap by VMEM: vol+out blocks, double-buffered, ~10MB;
    # for large D the width shrinks before the row chunk drops below 8.
    budget = 10 * 1024 * 1024
    # per-(d,wt,hc) bytes: f32 fori path keeps ~4 blocks live; the sub-4-byte
    # unrolled-group path additionally hoards ~8 rows of f32 temporaries
    unit = (16 if vol.dtype.itemsize >= 4 else 48) * gb
    wt = min(_cdiv(w, 128) * 128, 1280)
    while wt > 128 and unit * d_ * wt * 8 > budget:
        wt -= 128
    hc = max(8, min(h, budget // (unit * d_ * wt) // 8 * 8))
    if wt_override:
        wt = min(wt_override, _cdiv(w, 128) * 128)
    if hc_override:
        hc = min(hc_override, _cdiv(h, 8) * 8)
    nh = _cdiv(h, hc)
    grid = (g // gb, _cdiv(w, wt), nh)
    hix = (lambda hi: nh - 1 - hi) if reverse else (lambda hi: hi)
    vol_spec = pl.BlockSpec((gb, d_, hc, wt),
                            lambda gi, wi, hi: (gi, 0, hix(hi), wi),
                            memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((gb, hc, wt),
                            lambda gi, wi, hi: (gi, hix(hi), wi),
                            memory_space=pltpu.VMEM)
    init_spec = pl.BlockSpec((gb, d_, wt), lambda gi, wi, hi: (gi, 0, wi),
                             memory_space=pltpu.VMEM)
    has_mask = mask is not None
    has_init = init is not None
    in_specs = ([vol_spec, img_spec] + ([img_spec] if has_mask else [])
                + ([init_spec] if has_init else []))
    args = ((vol, pscale) + ((mask.astype(vol.dtype),) if has_mask else ())
            + ((init.astype(vol.dtype),) if has_init else ()))

    def kern(*refs):
        it = iter(refs)
        vol_ref = next(it)
        ps_ref = next(it)
        mask_ref = next(it) if has_mask else None
        init_ref = next(it) if has_init else None
        out_ref, carry = it
        _sgm_kernel(vol_ref, ps_ref, mask_ref, init_ref, out_ref, carry,
                    p1=p1, p2=p2, has_mask=has_mask, reverse=reverse,
                    h_total=h)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((gb, d_, wt), vol.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=vol.size * 12, bytes_accessed=vol.size * 8,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _sgm_diag_kernel(vol_ref, ps_ref, out_ref, carry, bnd, *, p1: float,
                     p2: float, shift: int, reverse: bool, h_total: int,
                     w_total: int, hc: int, wt: int, hp: int):
    """Diagonal SGM scan over one [1, Hc, Wt, D] block, W on sublanes and
    D on lanes (callers feed volumes transposed to [G, H, W, D]).

    The diagonal predecessor (previous row, u -/+ 1) is the carried row
    shifted one SUBLANE per row step — no skewed buffers. The value
    entering the edge sublane comes from the neighboring W-tile through
    ``bnd``, a ping-pong boundary scratch [2, Hp, D] indexed by global
    row: tile ``wi`` writes its edge column per row into parity (wi+1)%2
    and reads the upstream tile's rows from parity wi%2 (the grid walks
    tiles upstream-first: left-to-right for shift=+1, right-to-left for
    shift=-1, via the caller's index maps).

    shift=+1: predecessor at u-1 (reference offsets ru=-1);
    shift=-1: predecessor at u+1. ``reverse`` scans rows bottom-up.
    Scan-edge semantics (Lr = C, h:2277-2279) fall out of zero vectors:
    the carry starts zero, out-of-image boundary reads are masked to
    zero, and sublanes past the image width are zeroed each row (which
    also keeps the last tile's block-padding garbage from rolling into
    valid lanes when shift=-1).
    """
    d_ = vol_ref.shape[3]
    big = jnp.asarray(jnp.finfo(vol_ref.dtype).max, vol_ref.dtype)
    big_col = jnp.full((wt, 1), big, vol_ref.dtype)
    n_w = pl.num_programs(1)
    n_h = pl.num_programs(2)
    wi = pl.program_id(1)
    hi = pl.program_id(2)

    @pl.when(hi == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    block0 = ((n_h - 1 - hi) if reverse else hi) * hc
    wtile = wi if shift > 0 else n_w - 1 - wi
    wl = w_total - wtile * wt                  # in-image sublanes this tile
    sub = jax.lax.broadcasted_iota(jnp.int32, (wt, 1), 0)
    rd = wi % 2
    wr = (wi + 1) % 2

    def row_step(rs, prev):
        r = (hc - 1 - rs) if reverse else rs
        grow = block0 + r
        prow = grow + (1 if reverse else -1)   # predecessor's global row
        c = vol_ref[0, pl.ds(r, 1)][0]                   # [Wt, D]
        ps = ps_ref[0, pl.ds(r, 1)][0]                   # [Wt, 1]
        vec = bnd[rd, pl.ds(jnp.clip(prow, 0, hp - 1), 1), :]   # [1, D]
        use_vec = (wi > 0) & (prow >= 0) & (prow < h_total)
        vec = jnp.where(use_vec, vec, jnp.zeros_like(vec))
        if shift > 0:
            shifted = jnp.concatenate([vec, prev[:-1]], axis=0)
        else:
            shifted = jnp.concatenate([prev[1:], vec], axis=0)
        min_l = jnp.min(shifted, axis=1, keepdims=True)  # [Wt, 1]
        up = jnp.concatenate([big_col, shifted[:, :-1]], axis=1)
        dn = jnp.concatenate([shifted[:, 1:], big_col], axis=1)
        best = jnp.minimum(jnp.minimum(shifted, min_l + p2 * ps),
                           jnp.minimum(up, dn) + p1 * ps)
        l = (c + best - min_l).astype(prev.dtype)
        l = jnp.where(sub < wl, l, jnp.zeros_like(l))
        if reverse:
            # padded tail rows (met first bottom-up) are scan-inert
            l = jnp.where(grow < h_total, l, prev)
        out_ref[0, pl.ds(r, 1)] = l[None]
        e = wt - 1 if shift > 0 else 0
        bnd[wr, pl.ds(grow, 1), :] = l[e:e + 1, :]
        return l

    carry[:] = jax.lax.fori_loop(0, hc, row_step, carry[:])


def sgm_diag_scan_pallas(volT: jnp.ndarray, psT: jnp.ndarray, shift: int,
                         reverse: bool = False, p1: float = 1.0,
                         p2: float = 3.0, interpret: bool = False,
                         wt_override: int = 0,
                         hc_override: int = 0) -> jnp.ndarray:
    """Batched diagonal SGM path-cost scan without skewed buffers.

    volT: [G, H, W, D] cost volumes TRANSPOSED so W rides sublanes and D
    rides lanes; psT: [G, H, W, 1] per-pixel penalty multiplier. Returns
    [G, H, W, D] L_r for predecessor (rv, ru) with reverse = rv > 0 and
    shift = -ru. Values are bit-identical to ops/sgm.scan_direction (the
    skew formulation) — only the data movement differs: the skew path
    materializes ~1.75x-volume skew/unskew copies around a kernel that
    touches 1.75x data; this kernel reads and writes the volume once.
    """
    g, h, w, d_ = volT.shape
    # blocks (in+out, double-buffered) + bnd scratch + ~6 live [wt, d_]
    # row temporaries share scoped VMEM; sized conservatively until the
    # ceiling is probed on hardware (hc/wt_override to tune)
    budget = 8 * 1024 * 1024
    hc = 8
    wt = _cdiv(w, 8) * 8
    while wt > 8 and ((4 * hc + 6) * wt * d_ * 4
                      + 2 * (h + hc) * d_ * 4 > budget):
        wt -= 8
    if wt_override:
        wt = min(wt_override, _cdiv(w, 8) * 8)
    if hc_override:
        hc = hc_override
    nh = _cdiv(h, hc)
    nw = _cdiv(w, wt)
    hp = nh * hc
    grid = (g, nw, nh)
    hix = (lambda hi: nh - 1 - hi) if reverse else (lambda hi: hi)
    wix = (lambda wi: wi) if shift > 0 else (lambda wi: nw - 1 - wi)
    vol_spec = pl.BlockSpec((1, hc, wt, d_),
                            lambda gi, wi, hi: (gi, hix(hi), wix(wi), 0),
                            memory_space=pltpu.VMEM)
    ps_spec = pl.BlockSpec((1, hc, wt, 1),
                           lambda gi, wi, hi: (gi, hix(hi), wix(wi), 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sgm_diag_kernel, p1=p1, p2=p2,
                          shift=shift, reverse=reverse, h_total=h,
                          w_total=w, hc=hc, wt=wt, hp=hp),
        grid=grid,
        in_specs=[vol_spec, ps_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct(volT.shape, volT.dtype),
        scratch_shapes=[pltpu.VMEM((wt, d_), volT.dtype),
                        pltpu.VMEM((2, hp, d_), volT.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=volT.size * 12, bytes_accessed=volT.size * 8,
            transcendentals=0),
        interpret=interpret,
    )(volT, psT)


def _arms_grow_kernel(img_ref, sched_ref, armf_ref, armb_ref, buf, dm, *,
                      l_out: int, neigh_thresh: float, a: int):
    """Cross-arm growth (judgeColorDif chain, calHorVerDis cpp:2959-3050)
    for ONE opposite-direction pair along the sublane axis.

    img_ref: [3, 1, A, B] f32 color block; sched_ref: [l_out, 1] SMEM f32
    anchor thresholds (two-level / multilevel / adaptive schedules are
    all data). Outputs: armf/armb [1, A, B] int32 arm lengths toward
    +axis / -axis. buf: [3, 1, A + 2P, B] PAD_FAIL-padded image scratch
    (P = l_out + 1); dm: [1, 1, A + 2P, B] f32 0/1 step-1 neighbor mask
    on the padded domain (dm[y] tests rows y <-> y+1; pad rows
    auto-fail). The rank-4 [C, 1, A, B] layout matches the CBCA taps
    kernel — Mosaic accepts unaligned dynamic sublane starts there but
    rejects the rank-3 [C, A, B] form ("index in dimension 1 is a
    multiple of 8").

    The XLA formulation runs ~6 [H,W]-sized ops per (k, direction) from
    HBM (~130 dispatched ops/image); here the whole tap chain stays in
    VMEM — identical comparisons, bit-identical arm counts.
    """
    p = l_out + 1
    pad = jnp.float32(10000.0)                 # arms._PAD_FAIL
    buf[:, :, :p, :] = jnp.full_like(buf[:, :, :p, :], pad)
    buf[:, :, p + a:, :] = jnp.full_like(buf[:, :, p + a:, :], pad)
    buf[:, :, p:p + a, :] = img_ref[:]
    d1 = jnp.max(jnp.abs(buf[:, :, 1:, :] - buf[:, :, :-1, :]), axis=0,
                 keepdims=True)
    dm[:, :, :-1, :] = (d1 <= neigh_thresh).astype(jnp.float32)
    dm[:, :, -1:, :] = jnp.zeros_like(dm[:, :, -1:, :])

    ctr = buf[:, :, pl.ds(p, a), :]            # loop-invariant center rows
    ones = jnp.ones((1, a, img_ref.shape[3]), jnp.int32)

    def body(k, st):
        alive_f, alive_b, arm_f, arm_b = st
        th = sched_ref[k - 1, 0]
        fwd = buf[:, :, pl.ds(p + k, a), :]
        bwd = buf[:, :, pl.ds(p - k, a), :]
        f_ok = (jnp.max(jnp.abs(fwd - ctr), axis=0) <= th).astype(jnp.int32)
        b_ok = (jnp.max(jnp.abs(bwd - ctr), axis=0) <= th).astype(jnp.int32)
        # step-1 chain: d1ok at p+(k-1)a (fwd) / p-ka (bwd), see arms.py
        dp = dm[0, :, pl.ds(p + k - 1, a), :].astype(jnp.int32)
        dn = dm[0, :, pl.ds(p - k, a), :].astype(jnp.int32)
        alive_f = alive_f & f_ok & dp
        alive_b = alive_b & b_ok & dn
        return (alive_f, alive_b, arm_f + alive_f, arm_b + alive_b)

    _, _, arm_f, arm_b = jax.lax.fori_loop(
        1, l_out + 1, body, (ones, ones, ones * 0, ones * 0))
    armf_ref[:] = arm_f
    armb_ref[:] = arm_b


def arms_grow_fits(l_out: int, a: int, bt: int = 128) -> bool:
    """Scoped-VMEM fit check for :func:`arms_grow_pallas` (the kernel
    holds the whole reduction axis per block). Budget model from the
    fullres OOM (round 5): image block + 2 outputs + the two scratch
    planes + double buffering must stay under ~16 MB; 12 MB keeps margin."""
    ap = a + 2 * (l_out + 1)
    elems = (3 * a + 2 * a + 3 * ap + ap) * bt     # img, outs, scratches
    return elems * 4 * 2 < 12 * 2 ** 20            # x2: double buffering


def arms_grow_pallas(img3: jnp.ndarray, sched, neigh_thresh: float,
                     interpret: bool = False):
    """Arm growth for one direction pair along axis 1 of img3 [3, A, B].

    Returns (arm_fwd, arm_bwd) int32 [A, B] — identical to the XLA
    _grow_arms chain for directions (+axis1, -axis1). Callers transpose
    for the horizontal pair and map fwd/bwd onto the reference's
    direction slots."""
    _, a, b = img3.shape
    l_out = len(sched)
    sched_arr = jnp.asarray(sched, jnp.float32).reshape(l_out, 1)
    # lane tiles wider than 128 break Mosaic's unaligned dynamic sublane
    # loads ("cannot statically prove index ... multiple of 8") — measured
    # on-chip; 128 is the supported width for pl.ds tap kernels
    bt = min(_cdiv(b, 128) * 128, 128)
    grid = (_cdiv(b, bt),)
    img_spec = pl.BlockSpec((3, 1, a, bt), lambda t: (0, 0, 0, t),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, a, bt), lambda t: (0, 0, t),
                            memory_space=pltpu.VMEM)
    armf, armb = pl.pallas_call(
        functools.partial(_arms_grow_kernel, l_out=l_out,
                          neigh_thresh=float(neigh_thresh), a=a),
        grid=grid,
        in_specs=[img_spec,
                  pl.BlockSpec((l_out, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((1, a, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, a, b), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((3, 1, a + 2 * (l_out + 1), bt), jnp.float32),
            pltpu.VMEM((1, 1, a + 2 * (l_out + 1), bt), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * a * b * l_out * 8, bytes_accessed=3 * a * b * 8,
            transcendentals=0),
        interpret=interpret,
    )(img3.astype(jnp.float32)[:, None], sched_arr)
    return armf[0], armb[0]


def arm_bounded_sum_pallas(
    vol: jnp.ndarray,
    arm_neg: jnp.ndarray,
    arm_pos: jnp.ndarray,
    axis: int,
    max_arm: int,
    interpret: bool = False,
    op: str = "sum",
) -> jnp.ndarray:
    """Arm-bounded 1-D reduction along a spatial axis, Pallas TPU path.

    vol: [C, B, H, W] (C = channels sharing the same arms, B = batch,
    e.g. disparities); arm_neg/arm_pos: [Ba, H, W] int32 with Ba in
    {1, B}; axis: 2 (H) or 3 (W); op: "sum" | "min" | "max". Returns the
    vol-shaped reduction over [x - arm_neg, x + arm_pos].
    """
    assert vol.ndim == 4 and arm_neg.ndim == 3, (vol.shape, arm_neg.shape)
    assert arm_neg.shape[0] in (1, vol.shape[1]) and axis in (2, 3)
    if axis == 2:
        return sublane_pass_auto(vol, arm_neg, arm_pos, max_arm, interpret, op)
    out = sublane_pass_auto(jnp.swapaxes(vol, 2, 3),
                            jnp.swapaxes(arm_neg, 1, 2),
                            jnp.swapaxes(arm_pos, 1, 2), max_arm, interpret, op)
    return jnp.swapaxes(out, 2, 3)
