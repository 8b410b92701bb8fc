"""Cross-scale cost aggregation (Zhang et al. CVPR'14).

Equivalent of the reference's pyramid machinery: the driver builds a
Gaussian pyramid of StereoMatching instances (main_.cpp:131-155, PY_LEV)
and ``SolveAll`` (stereoMatching.cpp:2142-2208) fuses the per-scale cost
volumes with the inverse of the tridiagonal (1+lambda)I - lambda coupling
matrix, reading coarse costs at (y/2^s, x/2^s, ceil(d/2^s)).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown-style: 5-tap Gaussian blur then 2x decimation.

    img: [H, W] or [H, W, C] float.
    """
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, ((2, 2), (0, 0), (0, 0)), mode="reflect")
    x = sum(k[i] * xp[i:i + img.shape[0]] for i in range(5))
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="reflect")
    x = sum(k[i] * xp[:, i:i + img.shape[1]] for i in range(5))
    x = x[::2, ::2]
    return x[..., 0] if squeeze else x


def reg_inverse_weights(n_levels: int, reg_lambda: float = 0.3) -> np.ndarray:
    """First row of the inverse regularization matrix (cpp:2147-2168)."""
    m = np.zeros((n_levels, n_levels), np.float64)
    for s in range(n_levels):
        if s == 0:
            m[s, s] = 1 + reg_lambda
            if n_levels > 1:
                m[s, s + 1] = -reg_lambda
        elif s == n_levels - 1:
            m[s, s] = 1 + reg_lambda
            m[s, s - 1] = -reg_lambda
        else:
            m[s, s] = 1 + 2 * reg_lambda
            m[s, s - 1] = -reg_lambda
            m[s, s + 1] = -reg_lambda
    return np.linalg.inv(m)[0].astype(np.float32)


def solve_all(volumes: Sequence[jnp.ndarray], reg_lambda: float = 0.3,
              row0=0) -> jnp.ndarray:
    """Cross-scale fusion at the finest level (SolveAll cpp:2142-2208).

    volumes: per-level [D_s, H_s, W_s] cost volumes (level 0 finest).
    Each finer-level entry (d, y, x) accumulates invWgt[s] * cost at
    (ceil-chain d, y/2^s, x/2^s) — the exact index chain curY/=2,
    curD=(curD+1)/2 of the reference.

    row0: global row index of volumes[0]'s first row — the sharded band
    path fuses a local finest band against replicated full coarse levels.
    """
    wgt = reg_inverse_weights(len(volumes), reg_lambda)
    d0, h0, w0 = volumes[0].shape
    out = wgt[0] * volumes[0]

    ys = row0 + jnp.arange(h0, dtype=jnp.int32)
    xs = jnp.arange(w0, dtype=jnp.int32)
    ds = jnp.arange(d0, dtype=jnp.int32)
    cy, cx, cd = ys, xs, ds
    for s in range(1, len(volumes)):
        cy = cy // 2
        cx = cx // 2
        cd = (cd + 1) // 2
        vs = volumes[s]
        dsz, hsz, wsz = vs.shape
        iy = jnp.clip(cy, 0, hsz - 1)
        ix = jnp.clip(cx, 0, wsz - 1)
        idd = jnp.clip(cd, 0, dsz - 1)
        out = out + wgt[s] * vs[idd[:, None, None], iy[None, :, None],
                                ix[None, None, :]]
    return out


def build_pyramid_volumes(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg,
    n_levels: int,
    lor: int = 0,
) -> List[jnp.ndarray]:
    """Per-level aggregated cost volumes (the main_.cpp:135-155 loop):
    images pyrDown-ed, max_disp halved (maxdisp/2+1, main_.cpp:152)."""
    from mystereomatching_tpu.pipeline import compute_volumes

    vols = []
    l, r = left, right
    c = cfg
    for s in range(n_levels):
        vs, _ = compute_volumes(l, r, c)
        vols.append(vs[lor])
        if s + 1 < n_levels:
            l, r = pyr_down(l), pyr_down(r)
            c = c.replace(max_disp=c.max_disp // 2 + 1)
    return vols


def cross_scale_volume(left, right, cfg, n_levels: int = 2,
                       reg_lambda: float = 0.3, lor: int = 0) -> jnp.ndarray:
    """End-to-end cross-scale aggregated volume at full resolution."""
    return solve_all(build_pyramid_volumes(left, right, cfg, n_levels, lor),
                     reg_lambda)
