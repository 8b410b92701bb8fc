"""Stage timing & throughput counters.

Equivalent of the reference's clock() spans -> time.txt (``saveTime``,
stereoMatching.h:1727-1744) plus the BASELINE.json throughput metric
(MP·disparities/sec). Integrates with ``jax.profiler`` for traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class StageTimer:
    """Collect wall-clock spans per named stage.

    JAX is async: callers must block (e.g. ``jax.block_until_ready``) inside
    the span for device work to be attributed correctly.
    """

    def __init__(self) -> None:
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def save(self, path: str) -> None:
        with open(path, "a") as f:
            for k, v in self.spans.items():
                f.write(f"{k}: {v * 1e3:.3f} ms\n")

    def dump_json(self) -> str:
        return json.dumps({k: round(v * 1e3, 3) for k, v in self.spans.items()})


def mp_disparities_per_sec(h: int, w: int, d: int, seconds: float, pairs: int = 1) -> float:
    """Throughput in mega (pixel·disparity) hypotheses per second."""
    return pairs * h * w * d / seconds / 1e6


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Optional jax.profiler trace around a region."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
