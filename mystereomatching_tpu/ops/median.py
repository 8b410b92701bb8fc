"""Median filters: sorting-network small-window and histogram (ctmf-style).

TPU-native equivalents of cv::medianBlur and the SIMD constant-time median
``ctmf`` (NL/ctmf.c:108-433). Small windows stack the k^2 shifted planes and
sort across them (fully vectorized over H x W); large radii use the
histogram method — a 256-bin weighted box-sum plus a cumulative scan, the
same O(1)/pixel idea as ctmf but expressed as dense vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted_planes(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """[(2r+1)^2, H, W] stack of replicate-padded window samples."""
    r = radius
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    p = jnp.pad(img, pad, mode="edge")
    h, w = img.shape[-2:]
    planes = [p[..., dv:dv + h, du:du + w]
              for dv in range(2 * r + 1) for du in range(2 * r + 1)]
    return jnp.stack(planes)


def median_small(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Sorting-network median for ksize in {3,5} (cv::medianBlur semantics,
    replicate border). Works on any dtype; [..., H, W]."""
    r = ksize // 2
    planes = _shifted_planes(img, r)
    s = jnp.sort(planes, axis=0)
    return s[planes.shape[0] // 2]


def median_masked(img: jnp.ndarray, valid: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Median over valid window samples only; pixels with no valid sample
    keep their value. Used for sentinel-aware disparity smoothing."""
    r = ksize // 2
    planes = _shifted_planes(img.astype(jnp.float32), r)
    vmask = _shifted_planes(valid.astype(jnp.bool_), r)
    big = jnp.float32(1e30)
    vals = jnp.where(vmask, planes, big)
    s = jnp.sort(vals, axis=0)
    cnt = jnp.sum(vmask, axis=0)
    mid = jnp.maximum((cnt - 1) // 2, 0)
    med = jnp.take_along_axis(s, mid[None], axis=0)[0]
    return jnp.where(cnt > 0, med.astype(img.dtype), img)


def median_histogram(img: jnp.ndarray, radius: int, levels: int = 256) -> jnp.ndarray:
    """ctmf-equivalent large-radius median for integer-valued images in
    [0, levels): per-pixel windowed histogram via 2-D box sums over a
    one-hot [levels, H, W] volume, then the first bin whose cumulative
    count reaches half the window population."""
    from mystereomatching_tpu.ops.cost import _box_sum

    x = img.astype(jnp.int32)
    onehot = (x[None] == jnp.arange(levels, dtype=jnp.int32)[:, None, None])
    hist = _box_sum(onehot.astype(jnp.float32), radius, radius)
    total = jnp.sum(hist, axis=0)
    cum = jnp.cumsum(hist, axis=0)
    half = (total + 1.0) * 0.5
    med = jnp.argmax(cum >= half[None], axis=0)
    return med.astype(img.dtype)


def median_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Dispatch: sorting network for k<=5, histogram for larger (uint8)."""
    if ksize <= 5:
        return median_small(img, ksize)
    return median_histogram(img, ksize // 2)
