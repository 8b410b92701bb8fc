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


def save_from_vm(vol, path: str, choose_small: bool = True) -> np.ndarray:
    """WTA a cost volume and save the normalized disparity PNG
    (saveFromVm cpp:536-546). Returns the uint8 image."""
    from mystereomatching_tpu.ops.wta import wta
    from mystereomatching_tpu.utils.imio import disparity_to_image, imwrite

    disp = np.asarray(wta(vol, choose_small))
    img = disparity_to_image(disp, max_disp=int(vol.shape[0]) - 1)
    imwrite(path, img)
    return img


def save_from_disp(disp, num_disp: int, path: str) -> np.ndarray:
    """Save a disparity map PNG with sentinel coloring
    (saveFromDisp cpp:588-601)."""
    from mystereomatching_tpu.utils.imio import disparity_to_image, imwrite

    img = disparity_to_image(np.asarray(disp), max_disp=num_disp - 1)
    imwrite(path, img)
    return img


def sign_correct_from_top(cand_d: np.ndarray, gt: np.ndarray,
                          thresh: float = 1.0) -> np.ndarray:
    """Candidate-correctness map (signCorrectFromTopVm h:1928-1998):
    white = best candidate correct, gray = some non-best candidate correct,
    black = no candidate correct, 64 = no ground truth.

    cand_d: [H, W, M] top-K candidate disparities (-1 = empty slot)."""
    g = np.asarray(gt, np.float32)
    cd = np.asarray(cand_d, np.float32)
    has = cd >= 0
    ok = has & (np.abs(cd - g[..., None]) <= thresh)
    out = np.zeros(g.shape, np.uint8)
    out[ok.any(-1)] = 128
    out[ok[..., 0]] = 255
    out[g <= 0] = 64
    return out


def top_candidates_csv(path: str, cand_d: np.ndarray, cand_c: np.ndarray,
                       gt: np.ndarray, stride: int = 16) -> None:
    """Per-pixel candidate dump (genExcelFromTopDisp cpp:7868-7926):
    subsampled rows of (v, u, gt, cand disparities, cand costs)."""
    import csv
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cd = np.asarray(cand_d)
    cc = np.asarray(cand_c)
    g = np.asarray(gt, np.float32)
    m = cd.shape[-1]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["v", "u", "gt"]
                   + [f"d{i}" for i in range(m)]
                   + [f"c{i}" for i in range(m)])
        for v in range(0, cd.shape[0], stride):
            for u in range(0, cd.shape[1], stride):
                w.writerow([v, u, float(g[v, u])]
                           + [float(x) for x in cd[v, u]]
                           + [float(x) for x in cc[v, u]])
