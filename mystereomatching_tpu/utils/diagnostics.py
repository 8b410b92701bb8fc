"""Change-tracking diagnostics & debug visualizations (SURVEY.md §2.8).

Equivalents of the reference's refinement-forensics tools:
  * signDispChange_forRV / _for2Disp (stereoMatching.h:2620-2690): mark
    where a refinement step fixed (green) / broke (red) / changed (blue)
    pixels w.r.t. ground truth,
  * coutInterpolaterEffect (h:2131-2174): counters of how many invalid
    pixels an interpolation pass filled correctly/incorrectly,
  * showArms / drawArmForPoint (cpp:5475-5520, 3445-3475): render the
    cross arms of chosen pixels onto the image,
  * shard-consistency assertion (SURVEY.md §5 "race detection" analog for
    the functional world): sharded vs dense disparity maps.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def disp_change_image(
    before: np.ndarray,
    after: np.ndarray,
    gt: Optional[np.ndarray] = None,
    thresh: float = 1.0,
) -> np.ndarray:
    """RGB map of refinement effect (signDispChange_for2Disp h:2655-2690):
    green = newly correct, red = newly wrong, blue = changed (no GT /
    neutral), gray = unchanged."""
    b = np.asarray(before, np.float32)
    a = np.asarray(after, np.float32)
    out = np.full(b.shape + (3,), 128, np.uint8)
    changed = a != b
    out[changed] = (0, 0, 255)
    if gt is not None:
        g = np.asarray(gt, np.float32)
        ok_b = (np.abs(b - g) <= thresh) & (b >= 0)
        ok_a = (np.abs(a - g) <= thresh) & (a >= 0)
        has_gt = g > 0
        out[changed & has_gt & ~ok_b & ok_a] = (0, 255, 0)
        out[changed & has_gt & ok_b & ~ok_a] = (255, 0, 0)
    return out


def interpolation_effect(
    before: np.ndarray,
    after: np.ndarray,
    gt: np.ndarray,
    thresh: float = 1.0,
) -> Dict[str, int]:
    """Fill-effectiveness counters (coutInterpolaterEffect h:2131-2174)."""
    b = np.asarray(before)
    a = np.asarray(after)
    g = np.asarray(gt, np.float32)
    filled = (b < 0) & (a >= 0) & (g > 0)
    correct = filled & (np.abs(a - g) <= thresh)
    return {
        "invalid_before": int(((b < 0) & (g > 0)).sum()),
        "filled": int(filled.sum()),
        "filled_correct": int(correct.sum()),
        "filled_wrong": int((filled & ~correct).sum()),
    }


def draw_arms(
    image: np.ndarray,
    arms: np.ndarray,
    points: Sequence[Tuple[int, int]],
    color=(255, 0, 0),
) -> np.ndarray:
    """Render cross arms of selected pixels (drawArmForPoint cpp:3445-3475).

    arms: [4,H,W] (left,right,up,down). Returns an RGB copy."""
    img = np.array(image, np.uint8, copy=True)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w = img.shape[:2]
    for (v, u) in points:
        al, ar, au, ad = (int(arms[k, v, u]) for k in range(4))
        img[v, max(0, u - al): min(w, u + ar + 1)] = color
        img[max(0, v - au): min(h, v + ad + 1), u] = color
    return img


def assert_shard_consistent(dense: np.ndarray, sharded: np.ndarray,
                            max_mismatch: float = 0.0, context: str = "") -> None:
    """Sharded == dense disparity assertion (the functional substitute for
    race detection, SURVEY.md §5)."""
    d = np.asarray(dense)
    s = np.asarray(sharded)
    mism = float(np.mean(d != s))
    if mism > max_mismatch:
        raise AssertionError(
            f"shard inconsistency {context}: {mism:.4%} pixels differ "
            f"(allowed {max_mismatch:.4%})")
