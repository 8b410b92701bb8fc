"""Cost-volume plumbing: disparity-shifted gathers, validity masks, flips.

The reference addresses matching pairs as ``(u_L, u_R) = (u + d*leftCoe,
u + d*rightCoe)`` with ``(leftCoe, rightCoe) = (0,-1)`` for the left volume
and ``(1,0)`` for the right (gen_ad_sd_vm, stereoMatching.cpp:2477-2484).
Here that becomes one gather producing a ``[D, ..., W]`` disparity-shifted
stack plus a validity mask; out-of-range entries take a per-cost DEFAULT.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def shifted_stack(img: jnp.ndarray, num_disp: int, lor: int,
                  disps: jnp.ndarray = None) -> jnp.ndarray:
    """Disparity-shifted stack of the *other* image.

    For the left volume (lor=0) returns S[d, ..., v, u] = img[..., v, u-d]
    (img = right image); for the right volume (lor=1) returns
    S[d, ..., v, u] = img[..., v, u+d] (img = left image). Out-of-range
    entries are clamped; mask them with :func:`valid_mask`.

    TPU note: measured AGAINST a static-roll formulation at Teddy scale —
    the single [D,W]-indexed gather fuses with downstream cost math and is
    ~3x faster than D stacked rolls here (unlike the arm kernels, where
    rolls win).

    img: [..., W] (any leading dims). Returns [D, ..., W].

    ``disps``: optional traced [Db] int32 disparity subset replacing
    arange(num_disp) — the D-streaming path (full-res configs) builds the
    volume one contiguous block of disparities at a time.
    """
    w = img.shape[-1]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = (jnp.arange(num_disp, dtype=jnp.int32) if disps is None
         else disps.astype(jnp.int32))[:, None]
    idx = u - d if lor == 0 else u + d          # [D, W]
    idx = jnp.clip(idx, 0, w - 1)
    out = jnp.take(img, idx, axis=-1)           # [..., D, W]
    # move D to front
    return jnp.moveaxis(out, -2, 0)


def valid_mask(w: int, num_disp: int, lor: int,
               disps: jnp.ndarray = None) -> jnp.ndarray:
    """[D, 1, W] bool — True where the matching pixel is inside the image."""
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    d = (jnp.arange(num_disp, dtype=jnp.int32) if disps is None
         else disps.astype(jnp.int32))[:, None]
    ok = (u - d >= 0) if lor == 0 else (u + d < w)
    return ok[:, None, :]


def pointwise_volume(
    cost_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int,
    lor: int,
    default: float,
    disps: jnp.ndarray = None,
) -> jnp.ndarray:
    """Build [D,H,W] volume from a pointwise cost of (reference, shifted).

    ``cost_fn(ref, other)`` maps two [..., H, W] stacks (channel leading) to
    a cost; broadcast over the leading D axis. ``default`` fills entries
    whose matching pixel falls outside the image (the reference's DEFAULT
    cost, cpp:2470).
    """
    ref, other = (left, right) if lor == 0 else (right, left)
    sh = shifted_stack(other, num_disp, lor, disps)   # [D, ..., H, W]
    vol = cost_fn(ref[None], sh)                      # [D, H, W]
    mask = valid_mask(left.shape[-1], num_disp, lor, disps)
    return jnp.where(mask, vol, jnp.asarray(default, vol.dtype))


def flip_volume_lr(vol_left: jnp.ndarray) -> jnp.ndarray:
    """Reindex a left-reference volume into the right view:
    vmR[d, v, u] = vmL[d, v, u+d] (qx_stereo_flip_corr_vol, NL/qx_basic.cpp:577).
    Out-of-range entries wrap (static rolls — see shifted_stack)."""
    d_ = vol_left.shape[0]
    return jnp.stack([jnp.roll(vol_left[d], -d, axis=-1) for d in range(d_)])
