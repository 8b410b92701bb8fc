"""ctypes bindings for the host-side native NL runtime (libnl_runtime.so).

Counterpart of the reference's native NL/ directory: the device path is
pure JAX (ops/mst.py); this module exposes the C++ host implementations
(ctmf-style histogram median, linear-time Kruskal MST + BFS rooting,
two-pass tree filter) for validation oracles and CPU fallback. Builds the
shared library on first use via the Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_DIR, "libnl_runtime.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.msm_median3x3_u8.argtypes = [u8p, u8p] + [ctypes.c_int] * 3
    lib.msm_median_hist_u8.argtypes = [u8p, u8p] + [ctypes.c_int] * 3
    lib.msm_mst_grid.argtypes = [u8p] + [ctypes.c_int] * 3 + [i32p] * 3
    lib.msm_mst_grid_n.argtypes = [u8p] + [ctypes.c_int] * 4 + [i32p] * 3
    lib.msm_tree_filter.argtypes = [i32p, i32p, i32p, f32p, f32p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_float]
    _LIB = lib
    return lib


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def median3x3(img: np.ndarray) -> np.ndarray:
    """3x3 median on uint8 [H,W] or [H,W,C]."""
    lib = _load()
    src = np.ascontiguousarray(img, np.uint8)
    ch = 1 if src.ndim == 2 else src.shape[2]
    dst = np.empty_like(src)
    lib.msm_median3x3_u8(_u8(src), _u8(dst), src.shape[0], src.shape[1], ch)
    return dst


def median_hist(img: np.ndarray, radius: int) -> np.ndarray:
    """ctmf-equivalent arbitrary-radius median on uint8 [H,W]."""
    lib = _load()
    src = np.ascontiguousarray(img, np.uint8)
    assert src.ndim == 2
    dst = np.empty_like(src)
    lib.msm_median_hist_u8(_u8(src), _u8(dst), src.shape[0], src.shape[1], radius)
    return dst


def mst_grid(image: np.ndarray, neighbors: int = 4
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rooted grid MST: (parent[N], weight[N], bfs_order[N]).

    ``neighbors``: 4 or 8 (qx_mst_kruskals_image.h:11-12)."""
    lib = _load()
    img = np.ascontiguousarray(image, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    n = h * w
    parent = np.empty(n, np.int32)
    weight = np.empty(n, np.int32)
    order = np.empty(n, np.int32)
    lib.msm_mst_grid_n(_u8(img), h, w, ch, neighbors,
                       _i32(parent), _i32(weight), _i32(order))
    return parent, weight, order


def tree_filter(parent: np.ndarray, weight: np.ndarray, order: np.ndarray,
                values: np.ndarray, sigma: float = 0.1) -> np.ndarray:
    """Two-pass MST filter of [N, D] float32 values."""
    lib = _load()
    vals = np.ascontiguousarray(values, np.float32)
    squeeze = vals.ndim == 1
    if squeeze:
        vals = vals[:, None]
    n, d = vals.shape
    out = np.empty_like(vals)
    lib.msm_tree_filter(_i32(np.ascontiguousarray(parent, np.int32)),
                        _i32(np.ascontiguousarray(weight, np.int32)),
                        _i32(np.ascontiguousarray(order, np.int32)),
                        _f32(vals), _f32(out), n, d, sigma)
    return out[:, 0] if squeeze else out


def nl_aggregate_host(vol: np.ndarray, image: np.ndarray,
                      sigma: float = 0.1, prefilter: bool = True) -> np.ndarray:
    """Host NL aggregation: [D,H,W] volume, [H,W,3] uint8 image."""
    img = np.asarray(image, np.uint8)
    if prefilter:
        img = median3x3(img)
    parent, weight, order = mst_grid(img)
    d_, h, w = vol.shape
    flat = np.ascontiguousarray(vol.reshape(d_, h * w).T, np.float32)
    filt = tree_filter(parent, weight, order, flat, sigma)
    norm = tree_filter(parent, weight, order,
                       np.ones(h * w, np.float32), sigma)
    filt = filt / np.maximum(norm, 1e-12)[:, None]
    return filt.T.reshape(d_, h, w)
