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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> None:
    """Multi-host runtime entry (SURVEY §2.7 mesh/runtime row): a thin
    ``jax.distributed.initialize`` wrapper. On TPU pods the arguments are
    auto-detected from the metadata server (call with no args); for
    CPU/GPU or tests pass coordinator_address ("host:port"),
    num_processes and process_id explicitly. Idempotent: a second call in
    an initialized process is a no-op."""
    import jax

    if jax.distributed.is_initialized():
        return
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def make_multihost_mesh(n_disp: int = 1) -> Mesh:
    """{hosts x local chips} mesh for multi-host runs: 'data' spans HOSTS
    (DCN — only independent stereo pairs cross it, no halo traffic), 'row'
    spans each host's local chips (ICI — halo exchange, SGM wavefront
    boundaries and Borůvka segment merges stay intra-host). With
    ``n_disp`` > 1 each host's chips split ('row', 'disp').

    The device array is built host-major from ``process_index`` so the
    mesh axes land on the physical interconnects regardless of global
    device-id order. Works identically under a single process (1 host
    row), so sharded programs are process-count agnostic — asserted by
    tests/test_multihost.py with two jax.distributed CPU processes."""
    byproc = {}
    for d in jax.devices():
        byproc.setdefault(d.process_index, []).append(d)
    rows = [byproc[p] for p in sorted(byproc)]
    n_local = len(rows[0])
    assert all(len(r) == n_local for r in rows), \
        "uneven local device counts across hosts"
    arr = np.array(rows)                                  # [hosts, local]
    if n_disp > 1:
        assert n_local % n_disp == 0, (n_local, n_disp)
        arr = arr.reshape(len(rows), n_local // n_disp, n_disp)
        return Mesh(arr, ("data", "row", "disp"))
    return Mesh(arr, ("data", "row"))


def row_sharding(mesh: Mesh, ndim: int, row_axis: int, batch_axis: Optional[int] = None):
    """NamedSharding splitting ``row_axis`` over 'row' (and optionally a
    batch axis over 'data')."""
    spec = [None] * ndim
    spec[row_axis] = "row"
    if batch_axis is not None:
        spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))
