"""Evaluation metrics: bad-pixel ratio and RMS over region masks.

TPU-native equivalent of the reference's ``calErr`` (stereoMatching.h:1748-1825)
and ``cal_err`` (stereoMatching.cpp:6024-6055):

  * bad-pixel ratio at threshold ``thresh`` (default 1.0, "bad-1.0"):
    fraction of mask pixels where |d - gt| > thresh; *invalid* estimated
    pixels (sentinel codes < 0) always count as errors (h:1788-1792),
  * RMS over the valid estimated pixels, with invalid pixels contributing a
    fixed squared error of ``invalid_rms_penalty`` (h:1788-1792 adds
    errorThreshold+1 for invalids).

Masks follow Middlebury convention: ``nonocc`` (mask==255 in nonocc image),
``all`` (mask==255 in all image), ``disc`` (mask==255 in discontinuity
image). Ground truth value 0 marks pixels with no GT and is excluded
(h:1771).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def bad_pixel_stats(
    disp: jnp.ndarray,
    gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    thresh: float = 1.0,
    invalid_rms_penalty: float = 2.0,
):
    """Return (bad_ratio, rms) for one region mask.

    disp: [H,W] float or int estimated disparity; negative = invalid sentinel.
    gt:   [H,W] float ground-truth disparity; 0 = no ground truth.
    mask: [H,W] bool region mask (True = evaluate), or None for whole image.
    """
    disp = disp.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    region = gt > 0
    if mask is not None:
        region = region & mask
    n = jnp.maximum(jnp.sum(region), 1)

    invalid = disp < 0
    err = jnp.abs(disp - gt)
    bad = jnp.where(invalid, True, err > thresh)
    bad_ratio = jnp.sum(bad & region) / n

    sq = jnp.where(invalid, invalid_rms_penalty**2, err * err)
    rms = jnp.sqrt(jnp.sum(jnp.where(region, sq, 0.0)) / n)
    return bad_ratio, rms


def evaluate(
    disp: jnp.ndarray,
    gt: jnp.ndarray,
    masks: Optional[Dict[str, jnp.ndarray]] = None,
    thresh: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Evaluate over the standard region set.

    masks: optional dict with any of 'nonocc'/'all'/'disc' boolean masks
    (I_mask[0..2] in the reference, main_.cpp:96-108). Missing -> whole image.
    Returns {region: {'bad': x, 'rms': y}} flattened as '{region}_bad'.
    """
    out: Dict[str, jnp.ndarray] = {}
    if not masks:
        masks = {"all": None}
    for name, m in masks.items():
        bad, rms = bad_pixel_stats(disp, gt, m, thresh)
        out[f"{name}_bad"] = bad
        out[f"{name}_rms"] = rms
    return out
