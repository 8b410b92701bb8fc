"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's (absent) communication backend:
a named mesh ``('data', 'row')`` — stereo pairs sharded over 'data', image
rows over 'row' — with shardings expressed as ``PartitionSpec``s. ICI
carries the row-halo and SGM-boundary traffic (ppermute); DCN would carry
only per-pair scatter in a multi-slice deployment.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_row: Optional[int] = None, n_data: int = 1,
              n_disp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ('data', 'row'[, 'disp']). Defaults: all devices on the
    row axis. With n_disp > 1 the volume-building stage additionally
    shards the DISPARITY axis (SURVEY §2.7 disparity-block parallelism —
    bounds the per-device [4, D, H, W] intersected-arm tensor); the mesh
    gains a trailing 'disp' axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_row is None:
        n_row = len(devs) // (n_data * n_disp)
    total = n_data * n_row * n_disp
    assert total <= len(devs), (n_data, n_row, n_disp, len(devs))
    if n_disp > 1:
        arr = np.array(devs[:total]).reshape(n_data, n_row, n_disp)
        return Mesh(arr, ("data", "row", "disp"))
    arr = np.array(devs[:total]).reshape(n_data, n_row)
    return Mesh(arr, ("data", "row"))


def row_sharding(mesh: Mesh, ndim: int, row_axis: int, batch_axis: Optional[int] = None):
    """NamedSharding splitting ``row_axis`` over 'row' (and optionally a
    batch axis over 'data')."""
    spec = [None] * ndim
    spec[row_axis] = "row"
    if batch_axis is not None:
        spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))
