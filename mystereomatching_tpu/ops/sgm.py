"""Semi-global matching on TPU: vectorized multi-direction scanline DP.

Re-design of the reference SGM (costScan stereoMatching.cpp:1983-2029,
updateCost h:2205-2280, sgm cpp:6204-6224): the per-pixel raster scan with a
carried D-vector dependency becomes a ``lax.scan`` along the scan axis whose
element is a full [D, W] (or [D, H]) plane — the VPU processes an entire
image line x disparity per step. Diagonal directions are handled by skewing
rows so the diagonal predecessor becomes the vertical predecessor, then
running the same vertical scan core.

Recurrence (updateCost h:2268-2274):
    Lr(p,d) = C(p,d) + min(Lr(p-r,d),
                           Lr(p-r,d-1)+P1, Lr(p-r,d+1)+P1,
                           min_d' Lr(p-r,d') + P2) - min_d' Lr(p-r,d')
with adaptive penalties: P1,P2 divided by sgm_reduCoeffi1(=4) where the
max-channel color difference between p and its predecessor in the scan's
reference image exceeds sgm_corDifThres(=15) (h:2219-2264; only the D1 term
is active in the reference). Scan-edge pixels take Lr = C (h:2277-2279).

Final volume = sum over directions (gen_sgm_vm cpp:2031-2056). Default
directions: predecessors (+1,0), (-1,0), (0,+1), (0,-1) (cpp:6206-6214);
the 8-direction set adds the four diagonals.
"""

from __future__ import annotations

import os

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# predecessor offsets (rv, ru), reference order (cpp:6206-6208)
DIRECTIONS_8: Tuple[Tuple[int, int], ...] = (
    (1, 0), (-1, 0), (0, 1), (0, -1),
    (1, -1), (1, 1), (-1, 1), (-1, -1),
)


def penalty_scale(image: jnp.ndarray, rv: int, ru: int,
                  thres: int = 15, coeff: float = 4.0) -> jnp.ndarray:
    """Per-pixel P1/P2 multiplier for predecessor offset (rv, ru).

    image: [H,W,3] reference image of this volume. D1 = max-channel
    |I(p) - I(p+r)|; scale = 1/coeff where D1 > thres else 1 (h:2219-2264).
    Out-of-image predecessors produce edge pixels whose Lr=C anyway.
    """
    img = image.astype(jnp.float32)
    shifted = jnp.roll(img, shift=(-rv, -ru), axis=(0, 1))
    d1 = jnp.max(jnp.abs(img - shifted), axis=-1)
    return jnp.where(d1 > thres, 1.0 / coeff, 1.0)


def _scan_down(vol: jnp.ndarray, pscale: jnp.ndarray, p1: float, p2: float,
               in_image: Optional[jnp.ndarray] = None,
               init: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Core scan: predecessor directly above (rv,ru)=(-1,0), top->bottom.

    vol: [D,H,W]; pscale: [H,W]; in_image: [H,W] bool mask (for skewed
    diagonal buffers) — cells outside force L=0 so that the first in-image
    cell of each scan line behaves as a scan edge (Lr=C, since
    min(0, ..., P2*s) - 0 = 0).

    init: optional [D, W] carried Lr state for row 0's predecessor — used
    by the multi-chip row-band pipeline (the neighbor band's last Lr row).
    The default zero state makes row 0 produce Lr = C (scan-edge
    semantics, h:2277-2279).
    """
    d_, h, w = vol.shape
    vol_t = jnp.moveaxis(vol, 1, 0)                     # [H, D, W]
    ps_t = pscale[:, None, :]                           # [H, 1, W]
    if in_image is None:
        mask_t = jnp.ones((h, 1, w), vol.dtype)
    else:
        mask_t = in_image[:, None, :].astype(vol.dtype)
    big = jnp.asarray(jnp.finfo(vol.dtype).max, vol.dtype)

    def step(l_prev, inp):
        c, ps, m = inp                                  # [D,W],[1,W],[1,W]
        min_l = jnp.min(l_prev, axis=0, keepdims=True)  # [1,W]
        p1s = p1 * ps
        up = jnp.concatenate([jnp.full((1, w), big, vol.dtype), l_prev[:-1]], 0)
        dn = jnp.concatenate([l_prev[1:], jnp.full((1, w), big, vol.dtype)], 0)
        best = jnp.minimum(jnp.minimum(l_prev, min_l + p2 * ps),
                           jnp.minimum(up, dn) + p1s)
        l_cur = (c + best - min_l) * m                  # mask padding cells to 0
        return l_cur, l_cur

    if init is None:
        # derive from vol so sharding/varying-axis types match under shard_map
        init = vol_t[0] * 0
    _, out = lax.scan(step, init, (vol_t, ps_t, mask_t))
    return jnp.moveaxis(out, 0, 1)                      # [D,H,W]


def _skew(x: jnp.ndarray, sign: int, fill: float) -> jnp.ndarray:
    """Skew rows of [..., H, W] into [..., H, W+H-1]: row v goes to columns
    shifted by +v (sign=+1) or (H-1-v) (sign=-1), so that diagonal
    predecessors become vertical.

    Gather-free: element (v, u) of the skewed [H, Ws=W+H-1] array sits at
    flat index v*Ws + (u+v) = v*(W+H) + u, so skewing is pad-to-[H, W+H] →
    flatten → truncate → reshape (pure layout ops; a per-element lane
    gather here cost ~2.5s/frame at Teddy scale for the 8-dir SGM)."""
    h, w = x.shape[-2:]
    ws = w + h - 1
    if sign < 0:
        out, ok = _skew(x[..., ::-1, :], 1, fill)
        return out[..., ::-1, :], ok[::-1]
    lead = x.shape[:-2]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, h)]
    p = jnp.pad(x, pad, constant_values=fill)           # [..., H, W+H]
    flat = p.reshape(lead + (h * (w + h),))
    out = flat[..., :h * ws].reshape(lead + (h, ws))
    v = jnp.arange(h, dtype=jnp.int32)[:, None]
    s = jnp.arange(ws, dtype=jnp.int32)[None, :]
    u = s - v
    ok = (u >= 0) & (u < w)
    return out, ok


def _unskew(x: jnp.ndarray, sign: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`_skew` (same pad/reshape trick in reverse)."""
    h, ws = x.shape[-2:]
    if sign < 0:
        return _unskew(x[..., ::-1, :], 1, w)[..., ::-1, :]
    lead = x.shape[:-2]
    flat = x.reshape(lead + (h * ws,))
    pad = [(0, 0)] * (x.ndim - 2) + [(0, h)]
    flat = jnp.pad(flat, pad)                           # [..., H*(W+H)]
    return flat.reshape(lead + (h, w + h))[..., :, :w]


def scan_direction(vol: jnp.ndarray, image: jnp.ndarray, rv: int, ru: int,
                   p1: float, p2: float, thres: int, coeff: float) -> jnp.ndarray:
    """One direction's path-cost volume L_r, [D,H,W]."""
    ps = penalty_scale(image, rv, ru, thres, coeff)

    flip_h = rv > 0 or (rv == 0 and ru > 0)  # scan opposite to predecessor
    # normalize to a predecessor with rv' in {-1, 0}, scanning forward
    if rv == 0:
        # horizontal: transpose W<->H so predecessor becomes vertical
        volT = jnp.swapaxes(vol, 1, 2)
        psT = jnp.swapaxes(ps, 0, 1)
        if ru > 0:                                       # predecessor right
            volT, psT = volT[:, ::-1], psT[::-1]
        out = _scan_down(volT, psT, p1, p2)
        if ru > 0:
            out = out[:, ::-1]
        return jnp.swapaxes(out, 1, 2)

    volF, psF = (vol[:, ::-1], ps[::-1]) if rv > 0 else (vol, ps)
    ruF = ru
    if ru == 0:
        outF = _scan_down(volF, psF, p1, p2)
    else:
        # diagonal: skew so predecessor (-1, ru) becomes (-1, 0).
        # For ru=-1 use s=u+(H-1-v); for ru=+1 use s=u+v.
        sign = 1 if ruF > 0 else -1
        volS, ok = _skew(volF, sign, 0.0)
        psS, _ = _skew(psF, sign, 1.0)
        outS = _scan_down(volS, psS, p1, p2, in_image=ok)
        outF = _unskew(outS, sign, vol.shape[-1])
    return outF[:, ::-1] if rv > 0 else outF


def sgm(
    vol: jnp.ndarray,
    image: jnp.ndarray,
    num_directions: int = 4,
    p1: float = 1.0,
    p2: float = 3.0,
    cor_dif_thres: int = 15,
    redu_coeff: float = 4.0,
) -> jnp.ndarray:
    """Full SGM: sum of per-direction path costs (sgm cpp:6204-6224).

    vol: [D,H,W] matching cost; image: [H,W,3] reference image of this
    volume (I_c[0] for the left volume, I_c[1] for the right, h:2219-2230).

    TPU note: directions sharing an orientation (vertical / horizontal /
    diagonal) are pre-flipped into a common top-down scan frame and run as
    ONE batched scan — a single Pallas kernel with the row loop inside
    (pallas_kernels.sgm_scan_pallas) on TPU, a vmapped ``lax.scan``
    elsewhere — keeping the recurrence bit-identical to
    :func:`scan_direction`.
    """
    return sgm_multi([vol], [image], num_directions, p1, p2,
                     cor_dif_thres, redu_coeff)[0]


def sgm_multi(vol_list, img_list, num_directions: int = 4, p1: float = 1.0,
              p2: float = 3.0, cor_dif_thres: int = 15,
              redu_coeff: float = 4.0):
    """SGM over several volumes at once (e.g. left+right for LRC): all
    same-orientation scans across all volumes share one batched kernel."""
    return sgm_directions(vol_list, img_list, DIRECTIONS_8[:num_directions],
                          p1, p2, cor_dif_thres, redu_coeff)


def sgm_directions(vol_list, img_list, dirs, p1: float = 1.0,
                   p2: float = 3.0, cor_dif_thres: int = 15,
                   redu_coeff: float = 4.0):
    """SGM path-cost sum over an explicit direction set (also used by the
    sharded band pipeline for its shard-local horizontal scans)."""
    from mystereomatching_tpu.ops import pallas_kernels as pk

    use_pallas = pk.tpu_backend()
    n = len(vol_list)
    out = [jnp.zeros_like(v) for v in vol_list]

    if use_pallas:
        # Group by (orientation, scan direction): reverse-capable kernels
        # scan bottom-up in place, so no flipped input/output copies ever
        # materialize. Diagonals run the lane-roll kernel on [H, W, D]
        # transposed volumes (sgm_diag_scan_pallas): no skewed buffers, so
        # each diagonal touches 1x the volume instead of ~1.75x plus
        # materialized skew/unskew copies; the transpose in and out is paid
        # ONCE per volume, shared by all four diagonals which accumulate in
        # transposed space. MYSM_NO_DIAGROLL=1 restores the skew kernels
        # (for diagnosing Mosaic lowering regressions on new toolchains).
        use_roll = not os.environ.get("MYSM_NO_DIAGROLL")
        groups = {}
        for i in range(n):
            vol, image = vol_list[i], img_list[i]
            for rv, ru in dirs:
                p = penalty_scale(image, rv, ru, cor_dif_thres, redu_coeff)
                if ru == 0:
                    groups.setdefault(("v", rv > 0), []).append(
                        (i, vol, p, None, None))
                elif rv == 0:
                    groups.setdefault(("h", ru > 0), []).append(
                        (i, jnp.swapaxes(vol, 1, 2), jnp.swapaxes(p, 0, 1),
                         None, None))
                elif use_roll and vol.dtype.itemsize >= 4:
                    # the roll kernel's boundary scratch needs arbitrary
                    # dynamic sublane offsets — unsupported for sub-4-byte
                    # dtypes (Mosaic requires 8-aligned starts there), so
                    # bf16 volumes keep the skew path
                    groups.setdefault(("t", rv > 0, -ru), []).append(
                        (i, p[..., None], None, None, None))
                else:
                    sign = 1 if ru > 0 else -1
                    s2 = -sign if rv > 0 else sign
                    vS, ok = _skew(vol, s2, 0.0)
                    pS, _ = _skew(p, s2, 1.0)
                    groups.setdefault(("d", rv > 0), []).append(
                        (i, vS, pS, ok, s2))
        # transpose each diagonal-participating volume to [H, W, D] once
        volT = {}
        for key, items in groups.items():
            if key[0] == "t":
                for it in items:
                    i = it[0]
                    if i not in volT:
                        volT[i] = jnp.transpose(vol_list[i], (1, 2, 0))
        # horizontal directions accumulate in TRANSPOSED [D,W,H] space and
        # swap back once per volume; diagonals accumulate in [H,W,D] space
        # likewise (the XLA fallback's association differs only across
        # directions — per-direction values are bit-identical)
        h_acc = {}
        t_acc = {}
        for key, items in groups.items():
            kind = key[0]
            if kind == "t":
                _, rev, shift = key
                volS = jnp.stack([volT[it[0]] for it in items])
                psS = jnp.stack([it[1] for it in items])
                res = pk.sgm_diag_scan_pallas(volS, psS, shift=shift,
                                              reverse=rev, p1=p1, p2=p2)
                for j, it in enumerate(items):
                    i = it[0]
                    t_acc[i] = res[j] if i not in t_acc else t_acc[i] + res[j]
                continue
            rev = key[1]
            volS = jnp.stack([it[1] for it in items])
            psS = jnp.stack([it[2] for it in items])
            maskS = (jnp.stack([it[3] for it in items])
                     if items[0][3] is not None else None)
            res = pk.sgm_scan_pallas(volS, psS, maskS, p1, p2, reverse=rev)
            for j, (i, *_mid, s2) in enumerate(items):
                r = res[j]
                if kind == "h":
                    h_acc[i] = r if i not in h_acc else h_acc[i] + r
                    continue
                if kind == "d":
                    r = _unskew(r, s2, vol_list[i].shape[-1])
                out[i] = out[i] + r
        for i, rt in t_acc.items():
            out[i] = out[i] + jnp.transpose(rt, (2, 0, 1))
        for i, rt in h_acc.items():
            out[i] = out[i] + jnp.swapaxes(rt, 1, 2)
        return out

    groups = {"v": [], "h": [], "d": []}
    for i in range(n):
        vol, image = vol_list[i], img_list[i]
        for rv, ru in dirs:
            p = penalty_scale(image, rv, ru, cor_dif_thres, redu_coeff)
            if ru == 0:
                v, p = (vol[:, ::-1], p[::-1]) if rv > 0 else (vol, p)
                groups["v"].append((i, rv, None, v, p, None))
            elif rv == 0:
                vT, pT = jnp.swapaxes(vol, 1, 2), jnp.swapaxes(p, 0, 1)
                v, p = (vT[:, ::-1], pT[::-1]) if ru > 0 else (vT, pT)
                groups["h"].append((i, ru, None, v, p, None))
            else:
                vF, pF = (vol[:, ::-1], p[::-1]) if rv > 0 else (vol, p)
                sign = 1 if ru > 0 else -1
                vS, ok = _skew(vF, sign, 0.0)
                pS, _ = _skew(pF, sign, 1.0)
                groups["d"].append((i, rv, sign, vS, pS, ok))

    # "h" accumulates in transposed space and swaps back once per volume,
    # LAST — the same summation association as the TPU branch above, so
    # the two paths stay bit-comparable
    h_acc = {}
    for gname in ("v", "d", "h"):
        items = groups[gname]
        if not items:
            continue
        volS = jnp.stack([it[3] for it in items])
        psS = jnp.stack([it[4] for it in items])
        maskS = (jnp.stack([it[5] for it in items])
                 if items[0][5] is not None else None)
        if maskS is None:
            res = jax.vmap(lambda v, p: _scan_down(v, p, p1, p2))(volS, psS)
        else:
            res = jax.vmap(lambda v, p, m: _scan_down(v, p, p1, p2,
                                                      in_image=m))(
                volS, psS, maskS)
        for j, (i, a, sign, *_rest) in enumerate(items):
            r = res[j]
            if gname == "v":
                out[i] = out[i] + (r[:, ::-1] if a > 0 else r)
            elif gname == "h":
                r = r[:, ::-1] if a > 0 else r
                h_acc[i] = r if i not in h_acc else h_acc[i] + r
            else:
                r = _unskew(r, sign, vol_list[i].shape[-1])
                out[i] = out[i] + (r[:, ::-1] if a > 0 else r)
    for i, rt in h_acc.items():
        out[i] = out[i] + jnp.swapaxes(rt, 1, 2)
    return out


def sgm_residual(vol: jnp.ndarray, image: jnp.ndarray, horizontal: bool,
                 **kw) -> jnp.ndarray:
    """sgm_hori / sgm_verti (cpp:6227-6269): 2-direction scan minus the
    input volume (residual form used by the experimental paths)."""
    dirs = ((0, 1), (0, -1)) if horizontal else ((1, 0), (-1, 0))
    out = jnp.zeros_like(vol)
    for rv, ru in dirs:
        out = out + scan_direction(vol, image, rv, ru,
                                   kw.get("p1", 1.0), kw.get("p2", 3.0),
                                   kw.get("cor_dif_thres", 15),
                                   kw.get("redu_coeff", 4.0))
    return out - vol
