"""mystereomatching_tpu — a TPU-native dense stereo-matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU codebase xinge456/myStereoMatching (classical dense two-frame stereo:
matching-cost computation -> cost aggregation -> disparity optimization ->
disparity refinement), built TPU-first:

  * the H x W x D cost volume is a device-resident ``[D, H, W]`` array,
  * every stage is a pure function volume -> volume / volume -> disparity,
  * sequential CPU recurrences (SGM scans, recursive filters, prefix sums)
    are expressed as ``lax.scan`` / ``lax.associative_scan`` / Pallas kernels,
  * multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
    collectives (row-band sharding with halo exchange; see ``parallel/``).

Stage selection is declarative via :class:`mystereomatching_tpu.config.MatchConfig`
instead of the reference's static strings (main_.cpp:15-18) and compile-time
bools (stereoMatching.h:57-83).
"""

from mystereomatching_tpu.config import MatchConfig, default_config
from mystereomatching_tpu.pipeline import StereoPipeline, match_pair

__version__ = "0.1.0"

__all__ = [
    "MatchConfig",
    "default_config",
    "StereoPipeline",
    "match_pair",
]
