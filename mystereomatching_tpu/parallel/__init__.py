"""Multi-chip parallelism: device meshes, halo exchange, sharded pipeline.

The reference is a single-threaded CPU program with no communication layer
(SURVEY.md §2.7). Here scaling is first-class: row-band data parallelism
over a ``jax.sharding.Mesh`` with XLA collectives over ICI — halo exchange
(``ppermute``) for windowed kernels and a chunked-wavefront pipeline for
the vertical SGM recurrence.
"""

from mystereomatching_tpu.parallel.mesh import make_mesh, row_sharding
from mystereomatching_tpu.parallel.sharded import sharded_match_pair
