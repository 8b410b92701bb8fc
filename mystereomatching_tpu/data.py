"""Datasets: Middlebury loader + synthetic stereo-pair generator.

The reference driver hard-codes a 33-object Middlebury table
(main_.cpp:33-39: object names, image filenames, GT scale factor
``disp_reduceCoeff``, ``maxdisp``). We keep that table, load from a root
directory when present, and otherwise provide a synthetic generator that
produces textured stereo pairs with exact ground-truth disparity — this is
the test/bench oracle in environments without the Middlebury files.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

# 33-object Middlebury table, transcribed from main_.cpp:33-39.
MIDDLEBURY_OBJECTS = [
    # (name, left, right, gt, gt_scale, max_disp)
    ("tsukuba", "scene1.row3.col3", "scene1.row3.col4", "truedisp.row3.col3", 16, 15),
    ("venus", "im2", "im6", "disp2", 8, 19),
    ("teddy", "im2", "im6", "disp2", 4, 59),
    ("cones", "im2", "im6", "disp2", 4, 59),
] + [
    (name, "view1", "view5", "disp1", 3, 85)
    for name in (
        "Art", "Books", "Dolls", "Laundry", "Moebius", "Reindeer", "Aloe",
        "Baby1", "Baby2", "Baby3", "Bowling1", "Bowling2", "Cloth1", "Cloth2",
        "Cloth3", "Cloth4", "Flowerpots", "Lampshade1", "Lampshade2", "Midd1",
        "Midd2", "Monopoly", "Plastic", "Rocks1", "Rocks2", "Wood1", "Wood2",
    )
] + [
    ("Katzaa", "left_matlab_valid_resize", "right_matlab_valid_resize", "all", 5, 80),
    ("Michmoret", "left_matlab_valid_resize", "right_matlab_valid_resize", "all", 5, 80),
]


@dataclasses.dataclass
class StereoPair:
    """One stereo problem instance (host-side numpy)."""

    name: str
    left: np.ndarray          # [H,W,3] uint8
    right: np.ndarray         # [H,W,3] uint8
    gt: Optional[np.ndarray]  # [H,W] float32 disparity (0 = unknown) or None
    max_disp: int
    masks: Optional[Dict[str, np.ndarray]] = None  # bool [H,W] nonocc/all/disc

    @property
    def gray(self) -> Tuple[np.ndarray, np.ndarray]:
        return rgb_to_gray(self.left), rgb_to_gray(self.right)


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """OpenCV-compatible RGB->gray (BGR coeffs applied to RGB order as cvtColor
    COLOR_BGR2GRAY does for its input; we store RGB so use the RGB weights)."""
    w = np.array([0.299, 0.587, 0.114], np.float32)
    g = img.astype(np.float32) @ w
    # match cv::cvtColor's round-to-nearest uint8
    return np.clip(np.round(g), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Synthetic stereo generator (the test oracle)
# ---------------------------------------------------------------------------

def _fractal_noise(rng, h, w, octaves=4, persistence=0.55):
    """Multi-octave value noise in [0,1] — cheap textured field."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        step = max(1, 2 ** (octaves - o + 2))
        gh, gw = h // step + 2, w // step + 2
        grid = rng.random((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1.001, h)
        xs = np.linspace(0, gw - 1.001, w)
        y0 = ys.astype(int); x0 = xs.astype(int)
        fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
        g00 = grid[y0][:, x0]; g01 = grid[y0][:, x0 + 1]
        g10 = grid[y0 + 1][:, x0]; g11 = grid[y0 + 1][:, x0 + 1]
        val = (g00 * (1 - fy) * (1 - fx) + g01 * (1 - fy) * fx
               + g10 * fy * (1 - fx) + g11 * fy * fx)
        out += amp * val
        total += amp
        amp *= persistence
    return out / total


def make_synthetic_pair(
    h: int = 128,
    w: int = 192,
    max_disp: int = 15,
    seed: int = 0,
    n_objects: int = 6,
    noise_sigma: float = 1.0,
    name: str = "synthetic",
) -> StereoPair:
    """Generate a textured stereo pair with exact integer ground truth.

    Scene model: a textured background plane at small disparity plus
    ``n_objects`` textured rectangles at larger disparities (fronto-parallel,
    so GT is piecewise constant and warping is exact). The right image is
    I_R(x) = I_L(x + d(x)) with proper occlusion handling: nearer surfaces
    win where warped pixels collide.
    """
    rng = np.random.default_rng(seed)

    # per-pixel disparity of the LEFT image
    bg_disp = max(1, max_disp // 5)
    disp = np.full((h, w), bg_disp, np.int32)
    for i in range(n_objects):
        oh = rng.integers(h // 6, h // 2)
        ow = rng.integers(w // 6, w // 2)
        oy = rng.integers(0, h - oh)
        ox = rng.integers(0, w - ow)
        od = rng.integers(bg_disp + 1, max_disp + 1)
        # nearer (larger disparity) objects drawn over farther ones
        region = disp[oy:oy + oh, ox:ox + ow]
        disp[oy:oy + oh, ox:ox + ow] = np.maximum(region, od)

    # textured left image: correlated fractal noise + strong per-pixel
    # high-frequency texture (warped with the scene -> matchable detail)
    base = _fractal_noise(rng, h, w, octaves=5)
    detail = rng.random((h, w)).astype(np.float32)
    left = np.stack(
        [
            np.clip(base * 140 + _fractal_noise(rng, h, w, 3) * 45
                    + detail * 60 + rng.random((h, w)) * 15, 0, 255)
            for _ in range(3)
        ],
        axis=-1,
    ).astype(np.float32)

    # right image by forward-warping left: right(x - d) = left(x).
    # Process columns; nearest surface (max disparity) wins collisions.
    right = np.zeros((h, w, 3), np.float32)
    right_d = np.full((h, w), -1, np.int32)
    xs = np.arange(w)
    for v in range(h):
        xr = xs - disp[v]
        ok = xr >= 0
        # iterate in disparity order so larger-d (nearer) overwrites
        order = np.argsort(disp[v], kind="stable")
        for u in order:
            if ok[u]:
                right[v, xr[u]] = left[v, u]
                right_d[v, xr[u]] = disp[v, u]
    # fill disocclusions in right image with background texture continuation
    holes = right_d < 0
    if holes.any():
        fill = _fractal_noise(rng, h, w, 3) * 255
        for c in range(3):
            ch = right[:, :, c]
            ch[holes] = fill[holes]

    if noise_sigma > 0:
        left = left + rng.normal(0, noise_sigma, left.shape)
        right = right + rng.normal(0, noise_sigma, right.shape)

    left8 = np.clip(np.round(left), 0, 255).astype(np.uint8)
    right8 = np.clip(np.round(right), 0, 255).astype(np.uint8)

    # occlusion mask for the left image: pixel (v,u) is occluded if some
    # nearer pixel maps to the same right column
    nonocc = np.ones((h, w), bool)
    for v in range(h):
        best: Dict[int, int] = {}
        for u in range(w):
            xr = u - disp[v, u]
            if xr < 0:
                nonocc[v, u] = False
                continue
            if xr in best and disp[v, best[xr]] >= disp[v, u]:
                nonocc[v, u] = False
            elif xr in best:  # current is nearer: previous was occluded
                nonocc[v, best[xr]] = False
                best[xr] = u
            else:
                best[xr] = u

    gt = disp.astype(np.float32)
    masks = {
        "nonocc": nonocc,
        "all": np.ones((h, w), bool),
    }
    return StereoPair(name=name, left=left8, right=right8, gt=gt,
                      max_disp=max_disp, masks=masks)


# ---------------------------------------------------------------------------
# Middlebury directory loader (mirrors main_.cpp:92-129)
# ---------------------------------------------------------------------------

def _imread(path: str) -> Optional[np.ndarray]:
    from mystereomatching_tpu.utils.imio import imread

    for ext in (".png", ".ppm", ".pgm", ".bmp"):
        p = path + ext
        if os.path.exists(p):
            return imread(p)
    return None


def load_middlebury_object(root: str, name: str) -> StereoPair:
    """Load one object from a Middlebury-style directory tree.

    Expects ``root/<name>/<left>.png`` etc. per the reference table; masks
    ``nonocc.png`` / ``all.png`` / ``disc.png`` are optional
    (main_.cpp:96-108). GT is divided by the per-object scale factor
    (main_.cpp:128-129).
    """
    row = next((r for r in MIDDLEBURY_OBJECTS if r[0] == name), None)
    if row is None:
        raise KeyError(f"unknown Middlebury object {name!r}")
    _, lname, rname, gname, coeff, max_disp = row
    d = os.path.join(root, name)
    left = _imread(os.path.join(d, lname))
    right = _imread(os.path.join(d, rname))
    if left is None or right is None:
        raise FileNotFoundError(f"images for {name} not found under {d}")
    gt_img = _imread(os.path.join(d, gname))
    gt = None
    if gt_img is not None:
        g = gt_img if gt_img.ndim == 2 else gt_img[..., 0]
        gt = g.astype(np.float32) / float(coeff)
    masks = {}
    for mname in ("nonocc", "all", "disc"):
        m = _imread(os.path.join(d, mname))
        if m is not None:
            mm = m if m.ndim == 2 else m[..., 0]
            masks[mname] = mm == 255
    if left.ndim == 2:
        left = np.stack([left] * 3, -1)
    if right.ndim == 2:
        right = np.stack([right] * 3, -1)
    return StereoPair(name=name, left=left, right=right, gt=gt,
                      max_disp=max_disp, masks=masks or None)
