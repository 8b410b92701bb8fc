"""Trace-time communication counters for the sharded pipeline.

VERDICT r2 item 8: the scaling projection (scripts/scaling_model.py) rested
on hand-derived halo-byte arithmetic and the C+P-1 wavefront bound "by
construction". These counters make both EMPIRICAL: every shape in the
sharded program is static under jit, so each ``exchange_rows`` payload,
wavefront step count, and all_gather size is known exactly at TRACE time.
Recording there captures what the executed program actually communicates —
the virtual-8-device-mesh tests trace the very same program a real pod
would run, so the counters are the real ones, only the ICI bandwidth
remains assumed.

Usage::

    with record_comm() as rec:
        jax.jit(...)(...)          # must trace (fresh jit), not a cache hit
    rec.summary()

Recording costs nothing when inactive (one global None check per call).
"""

from __future__ import annotations

import contextlib
from typing import List, Optional

_active: Optional["CommRecord"] = None


class CommRecord:
    def __init__(self):
        self.events: List[dict] = []

    # --- accumulation -----------------------------------------------------
    def add(self, **ev):
        self.events.append(ev)

    # --- views ------------------------------------------------------------
    def halo_events(self):
        return [e for e in self.events if e["kind"] == "halo"]

    def wavefront_events(self):
        return [e for e in self.events if e["kind"] == "wavefront"]

    def gather_events(self):
        return [e for e in self.events if e["kind"] == "all_gather"]

    def total_bytes(self) -> int:
        return sum(e["bytes"] for e in self.events)

    def summary(self) -> dict:
        return {
            "halo_exchanges": len(self.halo_events()),
            "halo_bytes": sum(e["bytes"] for e in self.halo_events()),
            "wavefront_scans": len(self.wavefront_events()),
            "wavefront_steps": [e["steps"] for e in self.wavefront_events()],
            "wavefront_bytes": sum(e["bytes"]
                                   for e in self.wavefront_events()),
            "all_gathers": len(self.gather_events()),
            "all_gather_bytes": sum(e["bytes"] for e in self.gather_events()),
            "total_bytes": self.total_bytes(),
        }


@contextlib.contextmanager
def record_comm():
    global _active
    rec = CommRecord()
    prev, _active = _active, rec
    try:
        yield rec
    finally:
        _active = prev


def _nbytes(shape, dtype) -> int:
    n = 1
    for s in shape:
        n *= int(s)
    import numpy as np

    return n * np.dtype(dtype).itemsize


def note_halo(x, halo: int, row_axis: int, stage: str = "") -> None:
    """One exchange_rows call: each device SENDS 2*halo rows (one block up,
    one down) of x's row-slab."""
    if _active is None:
        return
    shape = list(x.shape)
    shape[row_axis] = halo
    _active.add(kind="halo", stage=stage, bytes=2 * _nbytes(shape, x.dtype))


def note_wavefront(steps: int, boundary_shape, dtype, stage: str = "sgm"):
    """One wavefront scan: ``steps`` fori iterations, each ppermuting one
    boundary Lr block per device."""
    if _active is None:
        return
    _active.add(kind="wavefront", stage=stage, steps=int(steps),
                bytes=int(steps) * _nbytes(boundary_shape, dtype))


def note_all_gather(x, axis_devices: int, stage: str = "") -> None:
    """One all_gather: each device contributes its block to every peer
    (ring: (P-1)/P of the gathered size crosses links per device)."""
    if _active is None:
        return
    _active.add(kind="all_gather", stage=stage,
                bytes=(axis_devices - 1) * _nbytes(x.shape, x.dtype))
