"""Edge detection utilities: histogram equalization, Gaussian blur, Canny.

Vectorized equivalents of the OpenCV calls used by the reference's DA and
CBBI stages (equalizeHist + GaussianBlur + Canny, stereoMatching.cpp:6059-6063
and execCanny h:2319-2327). Hysteresis is a fixed number of masked dilation
steps (data-independent control flow for XLA).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def equalize_hist(img: jnp.ndarray) -> jnp.ndarray:
    """cv::equalizeHist on uint8: map through the normalized CDF."""
    x = img.astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[x.reshape(-1)].add(1)
    cdf = jnp.cumsum(hist)
    n = img.size
    # OpenCV: lut = round((cdf - cdf_min) / (n - cdf_min) * 255)
    nonzero = jnp.where(hist > 0, cdf, n + 1)
    cdf_min = jnp.min(nonzero)
    denom = jnp.maximum(n - cdf_min, 1)
    lut = jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0)
    lut = jnp.clip(lut, 0, 255)
    return lut[x].astype(jnp.uint8)


def gaussian_blur(img: jnp.ndarray, ksize: int = 3, sigma: float = 1.0) -> jnp.ndarray:
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-xs * xs / (2 * sigma * sigma))
    k = jnp.asarray(k / k.sum())
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="reflect")
    x = sum(k[i] * xp[i:i + img.shape[0]] for i in range(ksize))
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = sum(k[i] * xp[:, i:i + img.shape[1]] for i in range(ksize))
    return x


def canny_edges(img: jnp.ndarray, low: float = 20.0, high: float = 60.0,
                equalize: bool = False, blur_sigma: float = 0.0,
                hysteresis_iters: int = 8) -> jnp.ndarray:
    """Simplified Canny returning a bool edge map.

    Sobel gradients -> 4-bin orientation -> non-maximum suppression ->
    double threshold -> hysteresis approximated by ``hysteresis_iters``
    dilations of strong edges through weak-edge pixels.
    """
    x = img
    if equalize:
        x = equalize_hist(jnp.clip(x, 0, 255).astype(jnp.uint8))
    x = x.astype(jnp.float32)
    if blur_sigma > 0:
        x = gaussian_blur(x, 3, blur_sigma)

    def shift(a, dv, du):
        h, w = a.shape
        p = jnp.pad(a, ((1, 1), (1, 1)), mode="edge")
        return p[1 + dv:1 + dv + h, 1 + du:1 + du + w]

    gx = (shift(x, -1, 1) + 2 * shift(x, 0, 1) + shift(x, 1, 1)
          - shift(x, -1, -1) - 2 * shift(x, 0, -1) - shift(x, 1, -1))
    gy = (shift(x, 1, -1) + 2 * shift(x, 1, 0) + shift(x, 1, 1)
          - shift(x, -1, -1) - 2 * shift(x, -1, 0) - shift(x, -1, 1))
    mag = jnp.abs(gx) + jnp.abs(gy)          # L1 norm as in cv::Canny default

    ang = jnp.arctan2(gy, gx)
    deg = jnp.mod(jnp.degrees(ang) + 180.0, 180.0)
    # bins: 0 = horizontal gradient (compare left/right), 1 = 45, 2 = vert, 3 = 135
    b0 = (deg < 22.5) | (deg >= 157.5)
    b1 = (deg >= 22.5) & (deg < 67.5)
    b2 = (deg >= 67.5) & (deg < 112.5)
    n_a = jnp.where(b0, shift(mag, 0, 1),
          jnp.where(b1, shift(mag, -1, 1),
          jnp.where(b2, shift(mag, -1, 0), shift(mag, -1, -1))))
    n_b = jnp.where(b0, shift(mag, 0, -1),
          jnp.where(b1, shift(mag, 1, -1),
          jnp.where(b2, shift(mag, 1, 0), shift(mag, 1, 1))))
    keep = (mag >= n_a) & (mag >= n_b)

    strong = keep & (mag > high)
    weak = keep & (mag > low)
    e = strong
    for _ in range(hysteresis_iters):
        grown = e
        for dv in (-1, 0, 1):
            for du in (-1, 0, 1):
                grown = grown | shift(e, dv, du).astype(bool)
        e = weak & grown | strong
    return e
