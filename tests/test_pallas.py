"""Pallas kernel unit tests (interpret mode on the CPU mesh).

The TPU arm-bounded-sum kernel (ops/pallas_kernels.py) must agree exactly
with the XLA taps formulation it replaces (SURVEY.md §4a: every kernel is
checked against a transcription of the reference semantics — here
gen1DCumu + cal1DCost, stereoMatching.cpp:3896-3926 / h:1643-1715).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mystereomatching_tpu.ops import arms as A
from mystereomatching_tpu.ops.pallas_kernels import arm_bounded_sum_pallas


@pytest.mark.parametrize("axis", [2, 3])
@pytest.mark.parametrize("c,ba", [(1, 1), (1, 5), (2, 5), (2, 1)])
def test_pallas_matches_taps(rng, axis, c, ba):
    b, h, w, m = 5, 24, 40, 7
    vol = jnp.asarray(rng.random((c, b, h, w)), jnp.float32)
    an = jnp.asarray(rng.integers(0, m + 1, (ba, h, w)), jnp.int32)
    ap = jnp.asarray(rng.integers(0, m + 1, (ba, h, w)), jnp.int32)
    # clamp arms to the border so no support crosses the image edge
    # (cross_arms guarantees this in production, cpp:3030-3041)
    vv = jnp.arange(h)[:, None]
    uu = jnp.arange(w)[None, :]
    if axis == 2:
        an = jnp.minimum(an, vv)
        ap = jnp.minimum(ap, h - 1 - vv)
    else:
        an = jnp.minimum(an, uu)
        ap = jnp.minimum(ap, w - 1 - uu)

    got = arm_bounded_sum_pallas(vol, an, ap, axis, m, interpret=True)
    # reference: XLA taps on a matching broadcast layout
    an_b = an[:, None] if ba == 1 else an[None]
    ap_b = ap[:, None] if ba == 1 else ap[None]
    want = A._arm_bounded_sum_taps(vol, an_b, ap_b, axis, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sublane_pass_area_matches_stacked(rng):
    """Fused in-kernel-area pass (round 5, sublane_pass_area) == the
    stacked formulation it replaces: aggregate [vol, min(an1,m)+
    min(ap1,m)+1] along axis 1 with an/ap bounds, divide (cbca second
    pass, genfinalVm_cbca cpp:3969-3992)."""
    from mystereomatching_tpu.ops.pallas_kernels import sublane_pass_area

    b, h, w, m = 5, 24, 40, 7
    vol = jnp.asarray(rng.random((b, h, w)), jnp.float32)
    arms = []
    vv = jnp.arange(h)[:, None]
    for lo in (vv, h - 1 - vv):
        arms.append(jnp.minimum(
            jnp.asarray(rng.integers(0, m + 1, (b, h, w)), jnp.int32), lo))
    an, ap = arms
    an1 = jnp.asarray(rng.integers(0, 2 * m, (b, h, w)), jnp.int32)
    ap1 = jnp.asarray(rng.integers(0, 2 * m, (b, h, w)), jnp.int32)

    got = sublane_pass_area(vol, an1, ap1, an, ap, m, interpret=True)

    area = (jnp.minimum(an1, m) + jnp.minimum(ap1, m) + 1).astype(
        jnp.float32)
    stacked = jnp.stack([vol, area])
    agg = A._arm_bounded_sum_taps(stacked, an[None], ap[None], 2, m)
    want = agg[0] / jnp.maximum(agg[1], 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("axis", [2, 3])
@pytest.mark.parametrize("c,ba,op", [(1, 1, "sum"), (2, 5, "sum"),
                                     (1, 5, "min"), (2, 1, "max")])
def test_windowed_pass_matches_taps(rng, axis, c, ba, op):
    """Lookahead windowed kernel == taps reference on axes longer than any
    single VMEM block (here forced by calling it directly)."""
    from mystereomatching_tpu.ops.pallas_kernels import _sublane_pass_windowed

    b, h, w, m = 5, 61, 90, 7
    vol = jnp.asarray(rng.random((c, b, h, w)), jnp.float32)
    an = jnp.asarray(rng.integers(0, m + 1, (ba, h, w)), jnp.int32)
    ap = jnp.asarray(rng.integers(0, m + 1, (ba, h, w)), jnp.int32)
    vv = jnp.arange(h)[:, None]
    uu = jnp.arange(w)[None, :]
    if axis == 2:
        an = jnp.minimum(an, vv)
        ap = jnp.minimum(ap, h - 1 - vv)
        got = _sublane_pass_windowed(vol, an, ap, m, interpret=True, op=op,
                                     ab=16)
    else:
        an = jnp.minimum(an, uu)
        ap = jnp.minimum(ap, w - 1 - uu)
        got = jnp.swapaxes(
            _sublane_pass_windowed(jnp.swapaxes(vol, 2, 3),
                                   jnp.swapaxes(an, 1, 2),
                                   jnp.swapaxes(ap, 1, 2), m,
                                   interpret=True, op=op, ab=16), 2, 3)
    an_b = an[:, None] if ba == 1 else an[None]
    ap_b = ap[:, None] if ba == 1 else ap[None]
    want = A._arm_bounded_reduce_taps(vol, an_b, ap_b, axis, m, op=op)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_area_formula_matches_mask_count(rng):
    h, w, m = 16, 20, 5
    vol = jnp.asarray(rng.random((3, h, w)), jnp.float32)
    an = jnp.asarray(rng.integers(0, m + 3, (3, h, w)), jnp.int32)
    ap = jnp.asarray(rng.integers(0, m + 3, (3, h, w)), jnp.int32)
    _, area = A.arm_bounded_sum_with_area(vol, an, ap, axis=2, max_arm=m)
    # count by explicit masks
    want = sum(((k >= -an) & (k <= ap)).astype(np.float32)
               for k in range(-m, m + 1))
    np.testing.assert_allclose(np.asarray(area), np.asarray(want))


@pytest.mark.parametrize("choose_small", [True, False])
def test_wta_pallas_matches_argmin(rng, choose_small):
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.pallas_kernels import wta_pallas

    vol = jnp.asarray(rng.integers(0, 7, (9, 21, 33)), jnp.float32)  # ties!
    got = np.asarray(wta_pallas(vol, choose_small, interpret=True))
    want = np.asarray((jnp.argmin(vol, 0) if choose_small
                       else jnp.argmax(vol, 0)).astype(jnp.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("op", ["min", "max"])
def test_pallas_reduce_minmax_matches_taps(rng, op):
    from mystereomatching_tpu.ops.pallas_kernels import arm_bounded_sum_pallas

    b, h, w, m = 3, 16, 24, 5
    vol = jnp.asarray(rng.integers(-9, 9, (1, b, h, w)), jnp.int32)
    vv = jnp.arange(h)[:, None]
    an = jnp.minimum(jnp.asarray(rng.integers(0, m + 1, (b, h, w)), jnp.int32), vv)
    ap = jnp.minimum(jnp.asarray(rng.integers(0, m + 1, (b, h, w)), jnp.int32),
                     h - 1 - vv)
    got = arm_bounded_sum_pallas(vol, an, ap, 2, m, interpret=True, op=op)
    want = A._arm_bounded_reduce_taps(vol, an[None], ap[None], 2, m, op)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_proper_interpolation_pallas_matches_xla(rng, small_pair):
    import jax.numpy as jnp

    from mystereomatching_tpu.ops import refine as R
    from mystereomatching_tpu.ops.pallas_kernels import proper_interpolation_pallas

    h, w, depth = 40, 56, 6
    disp = jnp.asarray(rng.integers(-1, 12, (h, w)), jnp.int32)
    disp = jnp.where(jnp.asarray(rng.random((h, w)) < 0.2), -32, disp)
    img = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)

    want = np.asarray(R.proper_interpolation(disp, img, depth))  # XLA path (CPU)

    offs = R._pi_offsets(depth)
    occ, misd, misc, fany = proper_interpolation_pallas(
        disp, jnp.moveaxis(img, -1, 0), offs, interpret=True)
    inval = disp < 0
    found_any = fany > 0
    mis_found = np.asarray(misc) < np.finfo(np.float32).max
    mis_fill = np.where(mis_found, np.asarray(misd), np.asarray(disp))
    is_occ = np.asarray(disp) == -32
    fill = np.where(is_occ,
                    np.where(np.asarray(found_any), np.asarray(occ),
                             np.asarray(disp)),
                    mis_fill)
    got = np.where(np.asarray(inval), fill, np.asarray(disp))
    np.testing.assert_array_equal(got, want)


def test_proper_interpolation_grid_matches_per_direction(rng):
    """Grid-over-directions PI kernel (one Mosaic compile) == the 16
    per-direction kernels, except mis_disp's sentinel at unfound pixels
    (guarded to -1 vs undefined; callers never read it there)."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops import refine as R
    from mystereomatching_tpu.ops.pallas_kernels import (
        proper_interpolation_pallas, proper_interpolation_pallas_grid)

    h, w, depth = 40, 56, 6
    disp = jnp.asarray(rng.integers(-1, 12, (h, w)), jnp.int32)
    disp = jnp.where(jnp.asarray(rng.random((h, w)) < 0.2), -32, disp)
    img = jnp.moveaxis(
        jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32), -1, 0)
    offs = R._pi_offsets(depth)
    occ_a, misd_a, misc_a, fany_a = proper_interpolation_pallas(
        disp, img, offs, interpret=True)
    occ_b, misd_b, misc_b, fany_b = proper_interpolation_pallas_grid(
        disp, img, offs, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))
    np.testing.assert_array_equal(np.asarray(fany_a), np.asarray(fany_b))
    np.testing.assert_array_equal(np.asarray(misc_a), np.asarray(misc_b))
    found = np.asarray(misc_a) < np.finfo(np.float32).max
    np.testing.assert_array_equal(np.asarray(misd_a)[found],
                                  np.asarray(misd_b)[found])


def test_proper_interpolation_tiled_matches_whole(rng):
    """Halo'd-tile PI kernel == whole-plane PI kernel (forced multi-tile)."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops import refine as R
    from mystereomatching_tpu.ops.pallas_kernels import (
        proper_interpolation_pallas, proper_interpolation_pallas_tiled)

    h, w, depth = 50, 70, 6
    disp = jnp.asarray(rng.integers(-1, 12, (h, w)), jnp.int32)
    disp = jnp.where(jnp.asarray(rng.random((h, w)) < 0.2), -32, disp)
    img = jnp.moveaxis(
        jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32), -1, 0)
    offs = R._pi_offsets(depth)
    whole = proper_interpolation_pallas(disp, img, offs, interpret=True)
    tiled = proper_interpolation_pallas_tiled(disp, img, offs, tile=24,
                                              interpret=True)
    for a, b in zip(whole, tiled):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sgm_scan_pallas_init_carry(rng):
    """Chunked scans with boundary-carry init == one unchunked scan."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops import sgm as S
    from mystereomatching_tpu.ops.pallas_kernels import sgm_scan_pallas

    d_, h, w = 6, 24, 16
    vol = jnp.asarray(rng.random((1, d_, h, w)), jnp.float32)
    ps = jnp.asarray(rng.random((1, h, w)), jnp.float32)

    full = sgm_scan_pallas(vol, ps, interpret=True)
    top = sgm_scan_pallas(vol[:, :, :h // 2], ps[:, :h // 2], interpret=True)
    bot = sgm_scan_pallas(vol[:, :, h // 2:], ps[:, h // 2:],
                          init=top[:, :, -1], interpret=True)
    got = np.concatenate([np.asarray(top), np.asarray(bot)], axis=2)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-6)

    want = np.asarray(S._scan_down(vol[0], ps[0], 1.0, 3.0))
    np.testing.assert_allclose(np.asarray(full[0]), want, rtol=1e-6)


def test_sgm_scan_pallas_reverse(rng):
    """Bottom-up scan == flipped top-down scan (incl. padded-tail rows)."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.pallas_kernels import sgm_scan_pallas

    d_, h, w = 5, 21, 16    # h NOT a multiple of the chunk: tail exercised
    vol = jnp.asarray(rng.random((2, d_, h, w)), jnp.float32)
    ps = jnp.asarray(rng.random((2, h, w)), jnp.float32)

    want = sgm_scan_pallas(vol[:, :, ::-1], ps[:, ::-1],
                           interpret=True)[:, :, ::-1]
    got = sgm_scan_pallas(vol, ps, reverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("rv,ru", [(1, -1), (1, 1), (-1, 1), (-1, -1)])
def test_sgm_diag_roll_matches_scan_direction(rng, rv, ru):
    """Lane-roll diagonal kernel == the skew formulation, bit for bit,
    across W-tile seams (wt_override=8) and a padded last H chunk."""
    from mystereomatching_tpu.ops import sgm as S
    from mystereomatching_tpu.ops.pallas_kernels import sgm_diag_scan_pallas

    d_, h, w = 5, 21, 30          # h, w NOT multiples of chunk/tile
    vol = jnp.asarray(rng.random((d_, h, w)), jnp.float32)
    img = jnp.asarray(rng.random((h, w, 3)) * 255, jnp.float32)
    want = np.asarray(S.scan_direction(vol, img, rv, ru, 1.0, 3.0, 15, 4.0))
    ps = S.penalty_scale(img, rv, ru, 15, 4.0)
    volT = jnp.transpose(vol, (1, 2, 0))[None]
    psT = ps[..., None][None]
    got = sgm_diag_scan_pallas(volT, psT, shift=-ru, reverse=rv > 0,
                               interpret=True, wt_override=8)
    got = np.asarray(jnp.transpose(got[0], (2, 0, 1)))
    np.testing.assert_array_equal(got, want)


def test_sgm_diag_roll_batched_single_tile(rng):
    """g-batched volumes, single W tile, h a chunk multiple."""
    from mystereomatching_tpu.ops import sgm as S
    from mystereomatching_tpu.ops.pallas_kernels import sgm_diag_scan_pallas

    d_, h, w = 4, 16, 12
    vol = jnp.asarray(rng.random((2, d_, h, w)), jnp.float32)
    ps = jnp.asarray(rng.random((2, h, w)), jnp.float32)
    volT = jnp.transpose(vol, (0, 2, 3, 1))
    psT = ps[..., None]
    got = sgm_diag_scan_pallas(volT, psT, shift=1, reverse=False,
                               interpret=True)
    got = np.asarray(jnp.transpose(got, (0, 3, 1, 2)))
    for g in range(2):
        # shift=+1 == predecessor (v-1, u-1): skew formulation per volume
        volS, ok = S._skew(vol[g], -1, 0.0)
        psS, _ = S._skew(ps[g], -1, 1.0)
        outS = S._scan_down(volS, psS, 1.0, 3.0, in_image=ok)
        want = np.asarray(S._unskew(outS, -1, w))
        np.testing.assert_array_equal(got[g], want)


def test_sgm_scan_pallas_g_block(rng):
    """Interleaved scans (g_block=2) == independent scans, bit for bit."""
    from mystereomatching_tpu.ops.pallas_kernels import sgm_scan_pallas

    d_, h, w = 5, 21, 16
    vol = jnp.asarray(rng.random((4, d_, h, w)), jnp.float32)
    ps = jnp.asarray(rng.random((4, h, w)), jnp.float32)
    for rev in (False, True):
        want = sgm_scan_pallas(vol, ps, reverse=rev, interpret=True)
        got = sgm_scan_pallas(vol, ps, reverse=rev, interpret=True,
                              g_block=2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_arms_grow_pallas_interpret(rng):
    """Pallas arm-growth kernel (interpret mode) == XLA _grow_arms chain,
    for the two-level, multilevel and adaptive schedules."""
    import jax.numpy as jnp
    import numpy as np
    from mystereomatching_tpu.ops import arms as A
    from mystereomatching_tpu.ops import pallas_kernels as pk

    img = jnp.asarray(rng.integers(0, 256, (41, 53, 3)), jnp.float32)
    for sched, thr in (
            ([20 if k <= 5 else 6 for k in range(1, 10)], 20),       # two-level
            ([20, 20, 30, 30, 30, 0, 0], 20),                        # multilevel-ish
            ([int(20 - 20 / 5 * k + 10) if k <= 5 else 6
              for k in range(1, 9)], 20),                            # adaptive
    ):
        want = A._grow_arms(img, sched, thr, 1, A.DIRECTIONS)
        imgc = jnp.moveaxis(img, -1, 0)
        fwd_v, bwd_v = pk.arms_grow_pallas(imgc, sched, thr, interpret=True)
        fwd_h, bwd_h = pk.arms_grow_pallas(jnp.swapaxes(imgc, 1, 2), sched,
                                           thr, interpret=True)
        h, w = img.shape[:2]
        raw = (bwd_h.T, fwd_h.T, bwd_v, fwd_v)
        got = jnp.stack([
            jnp.maximum(raw[i], A._border_floor(h, w, dv, du, 1))
            for i, (dv, du) in enumerate(A.DIRECTIONS)])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
