"""Artifact I/O: image read/write, disparity visualization, error maps, CSV.

TPU-native equivalent of the reference's L5 artifact layer: ``saveDispMap``
(stereoMatching.h:2004-2129), ``saveBiary`` (h:1832-1922), ``errorMap``
(cpp:5992-6022), ``saveErrorMap`` (cpp:6169-6202), and the CSV sweep writer
(cpp:1940-1948). Arrays are host numpy; PIL handles codecs.
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np


def imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def imwrite(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img).save(path)


def disparity_to_image(
    disp: np.ndarray,
    max_disp: int,
    sentinels: bool = True,
) -> np.ndarray:
    """Normalized grayscale visualization with color-coded sentinels.

    Mirrors saveDispMap (h:2004-2129): disparity scaled to [0,255] by
    255/max_disp; sentinel codes tinted (OCC=blue, MIS=red, PKR=yellow,
    INV=green).
    """
    d = np.asarray(disp, np.float32)
    g = np.clip(d * (255.0 / max(max_disp, 1)), 0, 255).astype(np.uint8)
    out = np.stack([g, g, g], -1)
    if sentinels:
        di = np.asarray(disp)
        out[di == -16] = (0, 255, 0)     # DISP_INV
        out[di == -32] = (0, 0, 255)     # DISP_OCC
        out[di == -48] = (255, 0, 0)     # DISP_MIS
        out[di == -64] = (255, 255, 0)   # DISP_PKR
        out[di == -1] = (0, 128, 0)      # generic invalid
    return out


def error_map_image(
    disp: np.ndarray,
    gt: np.ndarray,
    nonocc: Optional[np.ndarray] = None,
    thresh: float = 1.0,
) -> np.ndarray:
    """Binary error map: white=correct, black=error, gray=occluded-region
    error (saveBiary h:1832-1922 / biaryImg cpp:5950-5989)."""
    d = np.asarray(disp, np.float32)
    g = np.asarray(gt, np.float32)
    valid_gt = g > 0
    bad = ((np.abs(d - g) > thresh) | (d < 0)) & valid_gt
    out = np.full(d.shape, 255, np.uint8)
    out[bad] = 0
    if nonocc is not None:
        out[bad & ~np.asarray(nonocc, bool)] = 128
    return out


def append_csv_row(path: str, row: dict) -> None:
    """Append one result row to the sweep CSV (openCSV/closeCSV
    cpp:1940-1948; calErr writes h:1801-1815). Creates header on first
    write; append-mode so interrupted sweeps resume per object."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow(row)
