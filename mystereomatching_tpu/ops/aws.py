"""AWS: adaptive support-weight aggregation (Yoon & Kweon).

Re-design of the reference AWS (stereoMatching.cpp:5692-5801, calvm_AWS
h:1305-1350, genWeight_AWS h:1472-1493, calW4_AWS h:1533-1548): joint
left/right CIELab bilateral weights in a 35x35 window,
w = exp(-dLab/5) with the L channel scaled by 100/255 (and the spatial
term disabled, as in the reference).

Instead of materializing the [H, W, 1225] weight tensor, a ``lax.scan``
over the 1225 window offsets accumulates numerator/denominator volumes —
each step is a dense [D,H,W] fused multiply-add, the same total work as
the reference but fully vectorized.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops.volume import shifted_stack, valid_mask


def rgb_to_lab(img: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,255] -> Lab with OpenCV 8-bit scaling (L*255/100, a/b+128)."""
    rgb = img.astype(jnp.float32) / 255.0
    # sRGB -> linear
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    x = x / 0.950456
    z = z / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    l_ = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a_ = 500.0 * (fx - fy) + 128.0
    b_ = 200.0 * (fy - fz) + 128.0
    l8 = l_ * 255.0 / 100.0
    # the reference's Lab is uint8 (cvtColor on uchar, cpp:5733): round and
    # saturate to match that quantization (OpenCV's fixed-point tables may
    # still differ by the odd LSB — a documented deviation)
    lab = jnp.stack([l8, a_, b_], -1)
    return jnp.clip(jnp.round(lab), 0.0, 255.0)


def _lab_weight(center: jnp.ndarray, neigh: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """exp(-||dLab||/gamma) with (100/255)^2 on the L term (h:1538-1542)."""
    d = center - neigh
    dist = jnp.sqrt(d[..., 0] ** 2 * 0.153787 + d[..., 1] ** 2 + d[..., 2] ** 2)
    return jnp.exp(-dist / gamma)


def aws_aggregate(vol: jnp.ndarray, image_left: jnp.ndarray,
                  cfg: MatchConfig, image_right: jnp.ndarray = None,
                  lor: int = 0, disps: jnp.ndarray = None) -> jnp.ndarray:
    """Joint-bilateral AWS aggregation of [D,H,W] volume.

    Needs both images (joint weights); when called from the generic
    dispatcher with only one image, falls back to single-image weights.
    ``disps``: optional [Db] disparity indices when ``vol`` is a
    contiguous D-block of a larger volume (the sharded row-band pipeline
    re-shards aggregation over disparity blocks — parallel/sharded.py).
    """
    r = cfg.aws_win
    gamma = cfg.aws_gamma
    d_, h, w = vol.shape

    lab_l = rgb_to_lab(image_left)
    lab_r = rgb_to_lab(image_right) if image_right is not None else None

    pad_img = lambda x: jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="reflect")
    lab_l_pad = pad_img(lab_l)
    lab_r_pad = pad_img(lab_r) if lab_r is not None else None
    vol_pad = jnp.pad(vol, ((0, 0), (r, r), (r, r)), mode="reflect")

    offs = np.array([(dv, du) for dv in range(-r, r + 1)
                     for du in range(-r, r + 1)], np.int32)

    def step(carry, off):
        numer, denom = carry
        dv, du = off[0], off[1]
        sl_img = lambda p: lax.dynamic_slice(p, (dv + r, du + r, 0), (h, w, 3))
        w_l = _lab_weight(lab_l, sl_img(lab_l_pad), gamma)
        if lab_r_pad is not None:
            w_r = _lab_weight(lab_r, sl_img(lab_r_pad), gamma)
            # joint weight: the reference view's weight at the unshifted
            # pixel, the other view's at the matched pixel (u-d for the
            # left volume, u+d for the right; calvm_AWS h:1326-1336)
            w_ref, w_oth = (w_l, w_r) if lor == 0 else (w_r, w_l)
            ele = w_ref[None] * shifted_stack(w_oth, d_, lor, disps=disps)
        else:
            ele = jnp.broadcast_to(w_l[None], (d_, h, w))
        v_sh = lax.dynamic_slice(vol_pad, (0, dv + r, du + r), (d_, h, w))
        return (numer + ele * v_sh, denom + ele), None

    # init derived from the input (not fresh constants) so the carry is
    # "varying" over any enclosing shard_map axes like the body output
    init = (vol * 0.0, vol * 0.0)
    (numer, denom), _ = lax.scan(step, init, jnp.asarray(offs))
    out = numer / jnp.maximum(denom, 1e-12)
    # invalid disparities (matched pixel off-image): keep original cost
    # (the reference leaves them uninitialized, h:1328; we keep vol)
    valid = valid_mask(w, d_, lor, disps=disps)
    return jnp.where(valid, out, vol)


def jbf_volume(vol: jnp.ndarray, image: jnp.ndarray, radius: int = 9,
               sigma_c: float = 25.0, sigma_s: float = 9.0) -> jnp.ndarray:
    """Per-slice joint bilateral filtering of the volume.

    TPU-native equivalent of the reference's JBF_STANDARD path
    (cv::ximgproc::jointBilateralFilter over each disparity slice with the
    color image as the joint guide, stereoMatching.cpp:5738-5767): weights
    w(p,q) = exp(-||I(p)-I(q)||^2 / 2 sigma_c^2) * exp(-||p-q||^2 / 2 sigma_s^2),
    normalized per pixel. Same offset-scan structure as AWS: each of the
    (2r+1)^2 window offsets is one dense fused multiply-add over [D,H,W].
    """
    d_, h, w = vol.shape
    r = radius
    img = image.astype(jnp.float32)
    img_pad = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    vol_pad = jnp.pad(vol, ((0, 0), (r, r), (r, r)), mode="reflect")

    offs = np.array([(dv, du) for dv in range(-r, r + 1)
                     for du in range(-r, r + 1)], np.int32)
    sdist = np.sum(offs.astype(np.float64) ** 2, axis=1)
    w_sp = np.exp(-sdist / (2.0 * sigma_s ** 2)).astype(np.float32)

    def step(carry, inp):
        numer, denom = carry
        off, ws = inp
        dv, du = off[0], off[1]
        neigh = lax.dynamic_slice(img_pad, (dv + r, du + r, 0), (h, w, 3))
        dc = jnp.sum((img - neigh) ** 2, axis=-1)
        wgt = ws * jnp.exp(-dc / (2.0 * sigma_c ** 2))
        v_sh = lax.dynamic_slice(vol_pad, (0, dv + r, du + r), (d_, h, w))
        return (numer + wgt[None] * v_sh, denom + wgt), None

    # derived init (not fresh constants): varying under shard_map axes
    init = (vol * 0.0, vol[0] * 0.0)
    (numer, denom), _ = lax.scan(step, init, (jnp.asarray(offs), jnp.asarray(w_sp)))
    return numer / jnp.maximum(denom[None], 1e-12)
