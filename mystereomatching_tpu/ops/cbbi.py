"""CBBI: cut-based border interpolation.

Re-design of the reference ``cbbi`` (stereoMatching.cpp:7571-7762):
Gaussian blur + equalized Canny -> floodFill segmentation of the left
image -> invalid pixels adopt the disparity of the first valid (>0)
same-segment neighbor over 16 one-step directions, two sweeps.

TPU formulation:
  * segmentation: connected components of the edge-free color-tolerance
    graph (|dI| <= 4 per channel between 4-neighbors, Canny edges cut),
    labeled by iterated row/column masked min-scans (associative scans)
    instead of the sequential floodFill — same components, deterministic
    labels (min flat index);
  * fill: Jacobi sweeps of the 16-direction rule (the reference's two
    in-place raster sweeps propagate within a sweep; extra Jacobi
    iterations reach the same fills).

Reference quirk preserved: the 16-entry direction-Y table contains the
expression ``-2. - 1`` (= -3) as a single element, leaving 15 explicit
entries and an implicit trailing 0 (cpp:7617).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.ops.canny import canny_edges, gaussian_blur
from mystereomatching_tpu.ops.refine import _shift2d

# direction tables with the reference's initializer quirk (cpp:7616-7617)
_DIR_X = (1, 1, 1, 0, 0, -1, -1, -1, 2, 2, 1, -1, -2, -2, -1, 1)
_DIR_Y = (0, -1, 1, -1, 1, -1, 1, 0, 1, -1, -2, -3, 1, 2, 2, 0)


def segment_labels(image: jnp.ndarray, tol: int = 4, blur_sigma: float = 4.0,
                   n_rounds: int = 24) -> jnp.ndarray:
    """[H,W] int32 segment labels (min flat index per component)."""
    img = image.astype(jnp.float32)
    sm = jnp.stack([gaussian_blur(img[..., c], 7, blur_sigma) for c in range(3)], -1)
    gray = jnp.round(0.299 * sm[..., 0] + 0.587 * sm[..., 1] + 0.114 * sm[..., 2])
    edges = canny_edges(jnp.clip(gray, 0, 255).astype(jnp.uint8),
                        low=20.0, high=60.0, equalize=True, blur_sigma=0.0)

    h, w = gray.shape
    sm_c = jnp.moveaxis(sm, -1, 0)   # [C,H,W]: _shift2d moves trailing (H,W)
    # adjacency: neighbors connected if within tolerance and neither is edge
    def conn(dv, du):
        nb = _shift2d(sm_c, dv, du, 1e9)
        ne = _shift2d(edges, dv, du, True)
        ok = jnp.max(jnp.abs(sm_c - nb), axis=0) <= tol
        return ok & ~edges & ~ne

    c_r = conn(0, 1)
    c_l = conn(0, -1)
    c_d = conn(1, 0)
    c_u = conn(-1, 0)
    return label_components(c_l, c_r, c_u, c_d, n_rounds)


def label_components(c_l, c_r, c_u, c_d, n_rounds: int = 24) -> jnp.ndarray:
    """Connected-component labels (min flat index) of the 4-neighbor graph
    whose directed connectivity masks are c_l[v,u] = (v,u)~(v,u-1) etc.
    Iterated masked min-scans along rows/columns; n_rounds bounds the
    label-diffusion diameter (each round moves labels across one full
    row+column pass, so 24 covers components ~24 zigzag turns deep —
    the device analogue of floodFill, cpp:7661-7692)."""
    h, w = c_l.shape
    label0 = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)

    def scan_min(lab, c_fwd, axis, reverse):
        """masked running min along axis: labels flow across connected runs."""
        x = lab if not reverse else jnp.flip(lab, axis)
        m = c_fwd if not reverse else jnp.flip(c_fwd, axis)

        def combine(a, b):
            la, _ = a
            lb, mb = b
            return jnp.where(mb, jnp.minimum(la, lb), lb), a[1] & mb

        out, _ = lax.associative_scan(combine, (x, m), axis=axis)
        return out if not reverse else jnp.flip(out, axis)

    def body(_, lab):
        lab = scan_min(lab, c_l, 1, False)    # left-connected runs, fwd
        lab = scan_min(lab, c_r, 1, True)
        lab = scan_min(lab, c_u, 0, False)
        lab = scan_min(lab, c_d, 0, True)
        return lab

    return lax.fori_loop(0, n_rounds, body, label0)


def cbbi(disp: jnp.ndarray, image: jnp.ndarray, cfg, n_sweeps: int = 4) -> jnp.ndarray:
    """Fill invalid pixels from same-segment neighbors (cpp:7694-7753)."""
    labels = segment_labels(image)
    d = disp
    for _ in range(n_sweeps):
        fill = jnp.full(d.shape, -1, d.dtype)
        found = jnp.zeros(d.shape, jnp.bool_)
        for k in range(16):
            dv, du = _DIR_Y[k], _DIR_X[k]
            nd = _shift2d(d, dv, du, -1)
            nl = _shift2d(labels, dv, du, -1)
            ok = (~found) & (nd > 0) & (nl == labels)
            fill = jnp.where(ok, nd, fill)
            found = found | ok
        d = jnp.where((d < 0) & found, fill, d)
    return d
