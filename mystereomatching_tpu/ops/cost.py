"""Matching-cost computation (L1): build the [D, H, W] cost volume.

TPU-native re-design of the reference cost family (costCalculate dispatcher,
stereoMatching.cpp:945-1021). All kernels are dense vector ops over the
whole volume; the per-pixel ``for v/u/d`` loops of the reference become one
disparity-shifted gather plus elementwise math.

Conventions: images float32 in [0,255]; left volume (lor=0) matches
I_L(v,u) against I_R(v,u-d); right volume (lor=1) matches I_L(v,u+d)
against I_R(v,u). Out-of-range entries take each cost's DEFAULT.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops import census as census_ops
from mystereomatching_tpu.ops.volume import pointwise_volume, shifted_stack, valid_mask
from mystereomatching_tpu.ops import arms as arms_ops


# ---------------------------------------------------------------------------
# AD / SD / truncated AD  (gen_ad_sd_vm cpp:2468-2509, gen_truncAD_vm 2511-2551)
# ---------------------------------------------------------------------------

def ad_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int, lor: int,
              trunc: float = 1e9, squared: bool = False,
              normalize: bool = False, disps=None) -> jnp.ndarray:
    """Mean over channels of |dI| (or dI^2), truncated (cpp:2468-2509).

    left/right: [H, W, C]. DEFAULT for invalid entries = trunc (or 1 when
    normalized, cpp:2470).
    """
    lc = jnp.moveaxis(left.astype(jnp.float32), -1, 0)    # [C,H,W]
    rc = jnp.moveaxis(right.astype(jnp.float32), -1, 0)

    def cost(a, b):
        d = jnp.abs(a - b)
        if squared:
            d = d * d
        return jnp.minimum(jnp.mean(d, axis=1), trunc)    # mean over C

    default = 1.0 if normalize else trunc
    vol = pointwise_volume(cost, lc, rc, num_disp, lor, default, disps)
    if normalize:
        valid = valid_mask(left.shape[1], num_disp, lor, disps)
        vol = jnp.where(valid, vol / trunc, 1.0)
    return vol


def trunc_ad_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
                    lor: int, trunc: float = 60.0) -> jnp.ndarray:
    """Sum (not mean) of per-channel |dI|, truncated at 60 (cpp:2511-2551)."""
    lc = jnp.moveaxis(left.astype(jnp.float32), -1, 0)
    rc = jnp.moveaxis(right.astype(jnp.float32), -1, 0)

    def cost(a, b):
        return jnp.minimum(jnp.sum(jnp.abs(a - b), axis=1), trunc)

    return pointwise_volume(cost, lc, rc, num_disp, lor, trunc)


# ---------------------------------------------------------------------------
# Gradient cost  (calGrad/calGrad_y cpp:271-388, calgradvm 388-466)
# ---------------------------------------------------------------------------

def central_gradient(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """0.5*(I[x+1]-I[x-1]) interior; one-sided at borders (cpp:271-320)."""
    g = img.astype(jnp.float32)
    fwd = jnp.roll(g, -1, axis)
    bwd = jnp.roll(g, 1, axis)
    grad = 0.5 * (fwd - bwd)
    n = img.shape[axis]
    idx = jnp.arange(n)
    first = jnp.take(g, jnp.array([1]), axis) - jnp.take(g, jnp.array([0]), axis)
    last = jnp.take(g, jnp.array([n - 1]), axis) - jnp.take(g, jnp.array([n - 2]), axis)
    pos = idx.reshape([-1 if a == axis else 1 for a in range(img.ndim)])
    grad = jnp.where(pos == 0, first, grad)
    grad = jnp.where(pos == n - 1, last, grad)
    return grad


def grad_volume(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    num_disp: int,
    lor: int,
    trunc: float = 500.0,
    use_2dir: bool = True,
    adaptive_weight: bool = True,
    arms: Optional[jnp.ndarray] = None,
    normalize: bool = False,
    disps=None,
    grad_y_pair=None,
) -> jnp.ndarray:
    """Gradient cost volume (grad() cpp:603-657 + calgradvm 388-466).

    x/y central-difference gradients of the gray images; cost =
    a*min(|dGx|,T) + (1-a)*min(|dGy|,T) with the adaptive weight
    a = shortestH/(shortestH+shortestV) from the CBCA arm lengths of the
    reference image (cpp:424-433; arms is [4,H,W] for image `lor`).
    DEFAULT for invalid entries = sqrt(2*T^2) (cpp:443).

    ``grad_y_pair``: optional precomputed (gy_left, gy_right) planes — the
    row-band sharded path substitutes y-gradients whose one-sided edge
    rows sit at the TRUE picture borders instead of the band edges.
    """
    gx = (central_gradient(gray_l, 1), central_gradient(gray_r, 1))
    gy = (grad_y_pair if grad_y_pair is not None
          else (central_gradient(gray_l, 0), central_gradient(gray_r, 0)))

    if use_2dir and adaptive_weight:
        assert arms is not None, "adaptive grad weight needs cross arms"
        short_h = jnp.maximum(jnp.minimum(arms[0], arms[1]), 1).astype(jnp.float32)
        short_v = jnp.maximum(jnp.minimum(arms[2], arms[3]), 1).astype(jnp.float32)
        a = short_h / (short_h + short_v)                 # [H,W]
    else:
        a = None

    def build(pair):
        ref, oth = (pair[0], pair[1]) if lor == 0 else (pair[1], pair[0])
        sh = shifted_stack(oth, num_disp, lor, disps)
        return jnp.minimum(jnp.abs(ref[None] - sh), trunc)

    cx = build(gx)
    if not use_2dir:
        default = 1.0 if normalize else trunc
        valid = valid_mask(gray_l.shape[-1], num_disp, lor, disps)
        out = cx / trunc if normalize else cx
        return jnp.where(valid, out, default)

    cy = build(gy)
    if adaptive_weight:
        vol = a[None] * cx + (1.0 - a)[None] * cy
    else:
        vol = cx + cy                                      # cpp:455 (non-adaptive sum)
    import math

    default = math.sqrt(2.0 * trunc * trunc)
    valid = valid_mask(gray_l.shape[-1], num_disp, lor, disps)
    return jnp.where(valid, vol, default)


# ---------------------------------------------------------------------------
# Birchfield-Tomasi  (bt/calCostForBT/calNeiMaxMin cpp:90-268)
# ---------------------------------------------------------------------------

def _nei_max_min(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (min, max) over {I, (I+I_left)/2, (I+I_right)/2} with the
    reference's border quirks (calNeiMaxMin cpp:196-233): at u=0 the set is
    {I0, avg(I0,I1)}; at u=W-1 it is {avg, I_{W-1}} (center excluded)."""
    g = img.astype(jnp.float32)
    il = 0.5 * (jnp.roll(g, 1, -1) + g)
    ir = 0.5 * (jnp.roll(g, -1, -1) + g)
    mn = jnp.minimum(g, jnp.minimum(il, ir))
    mx = jnp.maximum(g, jnp.maximum(il, ir))
    # border columns
    mn0 = jnp.minimum(g[..., 0], 0.5 * (g[..., 0] + g[..., 1]))
    mx0 = jnp.maximum(g[..., 0], 0.5 * (g[..., 0] + g[..., 1]))
    mnl = jnp.minimum(0.5 * (g[..., -2] + g[..., -1]), g[..., -1])
    mxl = jnp.maximum(0.5 * (g[..., -2] + g[..., -1]), g[..., -1])
    mn = mn.at[..., 0].set(mn0).at[..., -1].set(mnl)
    mx = mx.at[..., 0].set(mx0).at[..., -1].set(mxl)
    return mn, mx


def bt_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int, lor: int,
              trunc: float = 20.0) -> jnp.ndarray:
    """Birchfield-Tomasi sampling-insensitive cost (calCostForBT cpp:142-194).

    left/right: [H,W] gray or [H,W,C] color; cost is the channel mean of
    min(d(L->R), d(R->L)), truncated at 20. DEFAULT = trunc.
    """
    if left.ndim == 2:
        left = left[..., None]
        right = right[..., None]
    lc = jnp.moveaxis(left.astype(jnp.float32), -1, 0)     # [C,H,W]
    rc = jnp.moveaxis(right.astype(jnp.float32), -1, 0)
    lmin, lmax = _nei_max_min(lc)
    rmin, rmax = _nei_max_min(rc)

    ref, oth = (lc, rc) if lor == 0 else (rc, lc)
    ref_min, ref_max = (lmin, lmax) if lor == 0 else (rmin, rmax)
    oth_min, oth_max = (rmin, rmax) if lor == 0 else (lmin, lmax)

    sh = shifted_stack(oth, num_disp, lor)                 # [D,C,H,W]
    sh_min = shifted_stack(oth_min, num_disp, lor)
    sh_max = shifted_stack(oth_max, num_disp, lor)

    v0 = jnp.maximum(0.0, jnp.maximum(sh_min - ref[None], ref[None] - sh_max))
    v1 = jnp.maximum(0.0, jnp.maximum(ref_min[None] - sh, sh - ref_max[None]))
    cost = jnp.minimum(jnp.mean(jnp.minimum(v0, v1), axis=1), trunc)
    valid = valid_mask(left.shape[1], num_disp, lor)
    return jnp.where(valid, cost, trunc)


# ---------------------------------------------------------------------------
# ZNCC  (cal_ave_std_ncc / gen_NCC_vm cpp:2384-2464, transform cpp:2696-2707)
# ---------------------------------------------------------------------------

def _box_sum(x: jnp.ndarray, rv: int, ru: int,
             lo_v: int = None, hi_v: int = None,
             lo_u: int = None, hi_u: int = None) -> jnp.ndarray:
    """Windowed sum over dv in [lo_v,hi_v], du in [lo_u,hi_u] (default the
    full +-r window), zero-padded. x: [..., H, W]."""
    lo_v = -rv if lo_v is None else lo_v
    hi_v = rv if hi_v is None else hi_v
    lo_u = -ru if lo_u is None else lo_u
    hi_u = ru if hi_u is None else hi_u
    h, w = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(max(0, -lo_v), max(0, hi_v)),
                                     (max(0, -lo_u), max(0, hi_u))]
    xp = jnp.pad(x, pad)
    # integral image, exclusive-prefix style via padded cumsum
    cs = jnp.cumsum(jnp.cumsum(xp, -1), -2)
    cs = jnp.pad(cs, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    v0 = 0
    u0 = 0
    a = hi_v - lo_v + 1
    b = hi_u - lo_u + 1
    out = (cs[..., v0 + a: v0 + a + h, u0 + b: u0 + b + w]
           - cs[..., v0 + a: v0 + a + h, u0: u0 + w]
           - cs[..., v0: v0 + h, u0 + b: u0 + b + w]
           + cs[..., v0: v0 + h, u0: u0 + w])
    return out


def zncc_volume(gray_l: jnp.ndarray, gray_r: jnp.ndarray, num_disp: int,
                lor: int, rv: int = 3, ru: int = 4) -> jnp.ndarray:
    """ZNCC cost: 1 - NCC, with NCC<0 mapped to cost 1 (transform_NCCVm2).

    Reproduces the reference's window quirks (gen_NCC_vm cpp:2419-2464):
    mean/std use the full (2rv+1)x(2ru+1) window but the correlation sum
    runs dv in [-rv, rv), du in [-ru, ru) (exclusive upper bound); std is
    sqrt(sum sq dev) without area normalization — it cancels in the ratio
    only asymmetrically, which we match. Border band (|v|<rv etc.) and
    invalid disparities -> DEFAULT_MC=-1 -> cost 1.
    """
    gl = gray_l.astype(jnp.float32)
    gr = gray_r.astype(jnp.float32)
    area = (2 * rv + 1) * (2 * ru + 1)
    mean_l = _box_sum(gl, rv, ru) / area
    mean_r = _box_sum(gr, rv, ru) / area
    std_l = jnp.sqrt(_box_sum(gl * gl, rv, ru) - 2 * mean_l * _box_sum(gl, rv, ru)
                     + area * mean_l * mean_l)
    std_r = jnp.sqrt(_box_sum(gr * gr, rv, ru) - 2 * mean_r * _box_sum(gr, rv, ru)
                     + area * mean_r * mean_r)

    ref, oth = (gl, gr) if lor == 0 else (gr, gl)
    ref_mean, oth_mean = (mean_l, mean_r) if lor == 0 else (mean_r, mean_l)
    ref_std, oth_std = (std_l, std_r) if lor == 0 else (std_r, std_l)

    sh = shifted_stack(oth, num_disp, lor)                 # [D,H,W]
    sh_mean = shifted_stack(oth_mean, num_disp, lor)
    sh_std = shifted_stack(oth_std, num_disp, lor)

    # asymmetric-window sums (dv,du in [-r, r))
    def asym(x):
        return _box_sum(x, rv, ru, -rv, rv - 1, -ru, ru - 1)

    s_rr = asym(ref[None] * sh)
    s_r = asym(jnp.broadcast_to(ref[None], sh.shape))
    s_s = asym(sh)
    a_area = (2 * rv) * (2 * ru)
    numer = s_rr - ref_mean[None] * s_s - sh_mean * s_r + a_area * ref_mean[None] * sh_mean
    ncc = numer / jnp.maximum(ref_std[None] * sh_std, 1e-12)

    h, w = gl.shape
    u = jnp.arange(w)[None, None, :]
    v = jnp.arange(h)[None, :, None]
    d = jnp.arange(num_disp)[:, None, None]
    if lor == 0:
        inner = (u - d >= ru) & (u < w - ru)
    else:
        inner = (u + d < w - ru) & (u >= ru)
    inner = inner & (v >= rv) & (v < h - rv)
    ncc = jnp.where(inner, ncc, -1.0)
    return jnp.where(ncc < 0, 1.0, 1.0 - ncc)


# ---------------------------------------------------------------------------
# SSD  (gen_ssd_vm cpp:2589-2638)
# ---------------------------------------------------------------------------

def ssd_volume(gray_l: jnp.ndarray, gray_r: jnp.ndarray, num_disp: int,
               lor: int, rv: int = 3, ru: int = 4) -> jnp.ndarray:
    """Box-summed squared-difference volume (gen_ssd_vm cpp:2589-2638):
    per-pixel SD then (2rv+1)x(2ru+1) window sum. Invalid entries inherit
    the border SD default (we use the truncated max of the window sum)."""
    sd = ad_volume(gray_l[..., None], gray_r[..., None], num_disp, lor,
                   trunc=255.0**2, squared=True)
    return _box_sum(sd, rv, ru)


# ---------------------------------------------------------------------------
# Fused costs (censusGrad cpp:25-48, adGrad 50-70, ADCensus 894-915, ...)
# ---------------------------------------------------------------------------

def exp_fuse2(vm0: jnp.ndarray, vm1: jnp.ndarray, lam0: float, lam1: float) -> jnp.ndarray:
    """2 - exp(-vm0/lam0) - exp(-vm1/lam1) (gen_vm_from2vm_exp cpp:3566-3590)."""
    return 2.0 - jnp.exp(-vm0 / lam0) - jnp.exp(-vm1 / lam1)


def exp_fuse3(vm0, vm1, vm2, lam0, lam1, lam2) -> jnp.ndarray:
    """3-way exponential fusion (gen_vm_from3vm_exp cpp:3592-3620)."""
    return 3.0 - jnp.exp(-vm0 / lam0) - jnp.exp(-vm1 / lam1) - jnp.exp(-vm2 / lam2)


def fix_weight_fuse(vm0, w0, vm1, w1) -> jnp.ndarray:
    """w0*vm0 + w1*vm1 (gen_vm_from2vm_fixWgt cpp:3622-3645)."""
    return w0 * vm0 + w1 * vm1


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------

def _qx_gray(img: jnp.ndarray) -> jnp.ndarray:
    """qx rgb_2_gray (NL/qx_basic.h:72) with the NL path's channel-order
    quirk: the runtime feeds imread's BGR bytes, so the 0.299 weight lands
    on BLUE. img: [H,W,3] RGB.

    uchar(0.299*b+0.587*g+0.114*r+0.5) is emulated as the exact integer
    (299b+587g+114r+500)//1000 (fits f32/int32: max 255500 < 2^24).
    Exhaustively verified vs C-double semantics over all 2^24 triples:
    identical EXCEPT exactly when 299b+587g+114r+500 ≡ 0 (mod 1000)
    (16782 triples, 0.1% of the space), where the double sum sometimes
    lands an ulp below the integer and floors 1 lower (3464 of those).
    Golden tests budget the resulting rare WTA flips."""
    r = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    b = img[..., 2].astype(jnp.int32)
    return ((299 * b + 587 * g + 114 * r + 500) // 1000).astype(jnp.float32)


def _qx_gradient(gray: jnp.ndarray) -> jnp.ndarray:
    """compute_gradient (NL/qx_nonlocal_cost_aggregation.cpp:219-240):
    0.5*(g[x+1]-g[x-1]) + 127.5 interior; FULL one-sided diff (not halved)
    at both borders."""
    interior = 0.5 * (gray[:, 2:] - gray[:, :-2]) + 127.5
    first = (gray[:, 1:2] - gray[:, 0:1]) + 127.5
    last = (gray[:, -1:] - gray[:, -2:-1]) + 127.5
    return jnp.concatenate([first, interior, last], axis=1)


def qx_ad_grad_volume(left: jnp.ndarray, right: jnp.ndarray,
                      num_disp: int, lor: int = 0,
                      disps: jnp.ndarray = None) -> jnp.ndarray:
    """The NL standalone cost (matching_cost_from_color_and_gradient,
    NL/qx_nonlocal_cost_aggregation.cpp:190-218): mean truncated AD over
    color (max 7, weight 0.11) + truncated gradient diff (max 2, weight
    0.89). The shifted image replicates the border column past the edge
    (cpp:202-206) — shifted_stack's clamp gives exactly that.

    lor=1 builds the RIGHT volume directly: vmR(d,y,x) = C(right(x),
    left(min(x+d, w-1))), which equals qx_stereo_flip_corr_vol of the left
    volume bit-for-bit (the flip's past-border replicate-previous-d quirk
    collapses to the same clamp — see ops/nl.flip_corr_vol). The dense NL
    flow keeps the flip (golden-locked); the D-sharded flow builds blocks
    of either volume directly (``disps``)."""
    gl, gr = _qx_gray(left), _qx_gray(right)
    grad_l, grad_r = _qx_gradient(gl), _qx_gradient(gr)
    ref_img, oth_img = (left, right) if lor == 0 else (right, left)
    ref_grad, oth_grad = (grad_l, grad_r) if lor == 0 else (grad_r, grad_l)
    os_ = shifted_stack(jnp.moveaxis(oth_img, -1, 0), num_disp, lor,
                        disps=disps)                         # [D,3,H,W]
    color = jnp.minimum(
        jnp.sum(jnp.abs(jnp.moveaxis(ref_img, -1, 0)[None] - os_),
                axis=1) / 3.0, 7.0)
    gs = shifted_stack(oth_grad, num_disp, lor, disps=disps)
    grad = jnp.minimum(jnp.abs(ref_grad[None] - gs), 2.0)
    return 0.11 * color + 0.89 * grad


def _census_code_fn(func: int, rv: int, ru: int):
    """censusFunc (h:244) -> (code builder, code length in bits):
    0 classic, 1/2 neighbor-chain variants, 3 classic+8-surround (default),
    4 symmetric, 5 mean-census."""
    win = (2 * rv + 1) * (2 * ru + 1)
    return {
        0: (lambda g: census_ops.census_code_classic(g, rv, ru), win),
        1: (lambda g: census_ops.census_code_neighbor(g, rv, ru, 1),
            census_ops.neigh_code_length(rv, ru, 1)),
        2: (lambda g: census_ops.census_code_neighbor(g, rv, ru, 2),
            census_ops.neigh_code_length(rv, ru, 2)),
        3: (lambda g: census_ops.census_code_ncsur(g, rv, ru), win + 8),
        4: (lambda g: census_ops.census_code_symmetric(g, rv, ru), win),
        5: (lambda g: census_ops.census_code_mean(g, rv, ru), win),
    }[func]


def census_from2_volume(gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                        cfg: MatchConfig, lor: int,
                        disps: jnp.ndarray = None) -> jnp.ndarray:
    """Two-window census blend (gen_cenVM_XOR_From2Code(_tem), h:983-1142).

    Both windows' codes use the selected censusFunc builder (the reference
    dispatcher builds every window with one variant, cpp:856-871). Only the
    reference's ACTIVE lines are reproduced — the variance maps and
    arm-shortest weights it computes feed commented-out alternatives:
      * blend="first" (non-tem, active line h:1073): truncated+normalized
        Hamming cost of the FIRST window only;
      * blend="grad" (_tem, active line h:1115-1116): b*c0 + a*c1 with
        per-pixel a = 1-exp(-0.1/(g+1)), g the reference image's calGrad
        x-gradient (cpp:271-318); costs normalized by code length with NO
        truncation (h:1132).
    Off-image entries take 1.0 in both variants (h:1057, h:1124).
    """
    d = cfg.num_disp
    fn0, n0 = _census_code_fn(cfg.census_func, cfg.census_rv, cfg.census_ru)
    if cfg.census_from2_blend == "first":
        return census_ops.hamming_volume(
            fn0(gray_l), fn0(gray_r), d, lor, n0, cfg.census_trunc_ratio,
            normalize=True, disps=disps)
    fn1, n1 = _census_code_fn(cfg.census_func, cfg.census_rv2, cfg.census_ru2)
    c0 = census_ops.hamming_volume(fn0(gray_l), fn0(gray_r), d, lor, n0,
                                   1.0, normalize=True, disps=disps)
    c1 = census_ops.hamming_volume(fn1(gray_l), fn1(gray_r), d, lor, n1,
                                   1.0, normalize=True, disps=disps)
    g = central_gradient(gray_l if lor == 0 else gray_r, 1)
    a = 1.0 - jnp.exp(-0.1 / (g + 1.0))
    return (1.0 - a)[None] * c0 + a[None] * c1


def compute_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    cfg: MatchConfig,
    lor: int,
    arms: Optional[jnp.ndarray] = None,
    grad_y_pair=None,
) -> jnp.ndarray:
    """String-dispatch cost computation (costCalculate, cpp:945-1021).

    left/right: [H,W,3] color float32; gray_l/gray_r: [H,W] gray.
    arms: [4,H,W] cross arms of the reference image (for adaptive grad
    weighting); required for grad-based costs when grad_fuse_adaptive.
    """
    d = cfg.num_disp
    method = cfg.cost

    def census_vm():
        code_fn, n_bits = _census_code_fn(cfg.census_func, cfg.census_rv,
                                          cfg.census_ru)
        cl = code_fn(gray_l)
        cr = code_fn(gray_r)
        return census_ops.hamming_volume(
            cl, cr, d, lor, n_bits, cfg.census_trunc_ratio, cfg.is_census_norm)

    def grad_vm(trunc):
        return grad_volume(gray_l, gray_r, d, lor, trunc, cfg.grad_use_2dir,
                           cfg.grad_fuse_adaptive, arms, cfg.is_grad_norm,
                           grad_y_pair=grad_y_pair)

    if method == "ad":
        return ad_volume(left, right, d, lor, trunc=1e9)
    if method == "sd":
        return ad_volume(left, right, d, lor, trunc=1e9, squared=True)
    if method == "trunc_ad":
        return trunc_ad_volume(left, right, d, lor)
    if method == "bt":
        return bt_volume(gray_l, gray_r, d, lor, cfg.bt_trunc)
    if method == "grad":
        return grad_vm(cfg.grad_trunc)
    if method == "census":
        return census_vm()
    if method == "census_from2":
        return census_from2_volume(gray_l, gray_r, cfg, lor)
    if method == "zncc":
        return zncc_volume(gray_l, gray_r, d, lor, cfg.zncc_win_rv, cfg.zncc_win_ru)
    if method == "ssd":
        return ssd_volume(gray_l, gray_r, d, lor, cfg.ssd_win_rv, cfg.ssd_win_ru)
    if method == "census_grad":
        # default: censusGrad (cpp:25-48), grad trunc 500 (cpp:35)
        return exp_fuse2(census_vm(), grad_vm(cfg.grad_trunc), cfg.lam_cen, cfg.lam_g)
    if method == "ad_grad":
        # adGrad (cpp:50-70): AD trunc 7, grad trunc 2, weights 0.11/0.89
        advm = ad_volume(left, right, d, lor, trunc=cfg.ad_trunc)
        gvm = grad_volume(gray_l, gray_r, d, lor, 2.0, cfg.grad_use_2dir,
                          cfg.grad_fuse_adaptive, arms,
                          grad_y_pair=grad_y_pair)
        return fix_weight_fuse(advm, 0.11, gvm, 0.89)
    if method == "ad_census":
        # adCensus (cpp:5250-5277): exp fusion of AD (lam 10) and census (lam 30)
        advm = ad_volume(left, right, d, lor, trunc=1e9)
        return exp_fuse2(census_vm(), advm, 30.0, 10.0)
    if method == "ad_census_grad":
        advm = ad_volume(left, right, d, lor, trunc=1e9)
        return exp_fuse3(census_vm(), grad_vm(cfg.grad_trunc), advm,
                         cfg.lam_cen, cfg.lam_g, 10.0)
    if method == "ad_census_zncc":
        advm = ad_volume(left, right, d, lor, trunc=1e9)
        zvm = zncc_volume(gray_l, gray_r, d, lor, cfg.zncc_win_rv, cfg.zncc_win_ru)
        return exp_fuse3(census_vm(), zvm, advm, cfg.lam_cen, 1.0, 10.0)
    if method == "qx_ad_grad":
        if lor != 0:
            raise NotImplementedError(
                "qx_ad_grad is left-volume only; the NL flow derives the "
                "right volume via ops/nl.flip_corr_vol like the reference")
        return qx_ad_grad_volume(left, right, d)
    if method == "qx_census":
        cl = census_ops.census_code_qx80(left)
        cr = census_ops.census_code_qx80(right)
        return census_ops.hamming_volume(cl, cr, d, lor, 80)
    raise ValueError(f"unknown cost method {method!r}")


def block_cost_builder(
    left: jnp.ndarray,
    right: jnp.ndarray,
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    cfg: MatchConfig,
    lor: int,
    arms: Optional[jnp.ndarray] = None,
    grad_y_pair=None,
):
    """D-streaming form of :func:`compute_cost_volume` for full-res configs.

    Returns ``block(ds) -> [Db, H, W]`` building the cost for a traced
    contiguous disparity subset ``ds`` (int32 [Db]). Per-image work that
    does not depend on the disparity (census code transforms) is hoisted
    here so a ``lax.fori_loop`` over blocks doesn't recompute it.
    """
    d = cfg.num_disp
    method = cfg.cost

    census_pre = None
    if "census" in method and method != "census_from2":
        code_fn, n_bits = _census_code_fn(cfg.census_func, cfg.census_rv,
                                          cfg.census_ru)
        census_pre = (code_fn(gray_l), code_fn(gray_r), n_bits)

    def census_vm(ds):
        cl, cr, n_bits = census_pre
        return census_ops.hamming_volume(
            cl, cr, d, lor, n_bits, cfg.census_trunc_ratio,
            cfg.is_census_norm, disps=ds)

    def grad_vm(ds, trunc):
        return grad_volume(gray_l, gray_r, d, lor, trunc, cfg.grad_use_2dir,
                           cfg.grad_fuse_adaptive, arms, cfg.is_grad_norm,
                           disps=ds, grad_y_pair=grad_y_pair)

    def block(ds):
        if method == "ad":
            return ad_volume(left, right, d, lor, trunc=1e9, disps=ds)
        if method == "sd":
            return ad_volume(left, right, d, lor, trunc=1e9, squared=True,
                             disps=ds)
        if method == "grad":
            return grad_vm(ds, cfg.grad_trunc)
        if method == "census":
            return census_vm(ds)
        if method == "census_from2":
            return census_from2_volume(gray_l, gray_r, cfg, lor, disps=ds)
        if method == "census_grad":
            return exp_fuse2(census_vm(ds), grad_vm(ds, cfg.grad_trunc),
                             cfg.lam_cen, cfg.lam_g)
        if method == "ad_grad":
            advm = ad_volume(left, right, d, lor, trunc=cfg.ad_trunc, disps=ds)
            gvm = grad_volume(gray_l, gray_r, d, lor, 2.0, cfg.grad_use_2dir,
                              cfg.grad_fuse_adaptive, arms, disps=ds,
                              grad_y_pair=grad_y_pair)
            return fix_weight_fuse(advm, 0.11, gvm, 0.89)
        if method == "ad_census":
            advm = ad_volume(left, right, d, lor, trunc=1e9, disps=ds)
            return exp_fuse2(census_vm(ds), advm, 30.0, 10.0)
        if method == "ad_census_grad":
            advm = ad_volume(left, right, d, lor, trunc=1e9, disps=ds)
            return exp_fuse3(census_vm(ds), grad_vm(ds, cfg.grad_trunc), advm,
                             cfg.lam_cen, cfg.lam_g, 10.0)
        raise NotImplementedError(
            f"cost {method!r} has no D-streaming form; unset d_stream_block")

    return block


def grad_mag_phase_volume(gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                          num_disp: int, lor: int,
                          trunc_mag: float = 2.0, trunc_phase: float = 0.3,
                          w_phase: float = 0.5) -> jnp.ndarray:
    """Gradient magnitude + phase cost (calgradvm_mag_and_phase /
    getAtanGrad, stereoMatching.cpp:466-534): per pixel
    cost = min(|mag_l - mag_r|, trunc_mag)
         + w_phase * min(|atan(gy/gx)_l - atan(gy/gx)_r|, trunc_phase).
    """
    def mag_phase(g):
        gx = central_gradient(g, axis=1)
        gy = central_gradient(g, axis=0)
        mag = jnp.sqrt(gx * gx + gy * gy)
        phase = jnp.arctan2(gy, gx)
        return mag, phase

    mag_l, ph_l = mag_phase(gray_l.astype(jnp.float32))
    mag_r, ph_r = mag_phase(gray_r.astype(jnp.float32))
    ref_m, oth_m = (mag_l, mag_r) if lor == 0 else (mag_r, mag_l)
    ref_p, oth_p = (ph_l, ph_r) if lor == 0 else (ph_r, ph_l)
    sh_m = shifted_stack(oth_m, num_disp, lor)
    sh_p = shifted_stack(oth_p, num_disp, lor)
    dm = jnp.minimum(jnp.abs(ref_m[None] - sh_m), trunc_mag)
    # phase difference wrapped to [0, pi]
    dp = jnp.abs(ref_p[None] - sh_p)
    dp = jnp.minimum(jnp.minimum(dp, 2 * jnp.pi - dp), trunc_phase)
    default = trunc_mag + w_phase * trunc_phase
    valid = valid_mask(gray_l.shape[-1], num_disp, lor)
    return jnp.where(valid, dm + w_phase * dp, default)
