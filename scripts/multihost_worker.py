"""One process of the multi-PROCESS CPU validation run (SURVEY §2.7
mesh/runtime row; tests/test_multihost.py spawns two of these).

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device runtime. The mesh from make_multihost_mesh puts 'data'
across the two processes (the DCN stand-in) and 'row' on each process's
local devices (the ICI stand-in), and the SAME sharded program that runs
single-process must produce the same bytes.

argv: process_id num_processes coordinator_port out_dir
"""
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mystereomatching_tpu.parallel.mesh import (  # noqa: E402
    initialize_multihost, make_multihost_mesh)

initialize_multihost(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mystereomatching_tpu.config import fast_config  # noqa: E402
from mystereomatching_tpu.data import make_synthetic_pair  # noqa: E402
from mystereomatching_tpu.parallel.sharded import (  # noqa: E402
    sharded_match_pair)

cfg = fast_config(max_disp=7, census_rv=2, census_ru=3)
pairs = [make_synthetic_pair(h=64, w=48, max_disp=7, seed=s) for s in (3, 4)]
lb = np.stack([np.asarray(p.left, np.float32) for p in pairs])
rb = np.stack([np.asarray(p.right, np.float32) for p in pairs])

mesh = make_multihost_mesh()
assert mesh.devices.shape == (nproc, 4), mesh.devices.shape
sh = NamedSharding(mesh, P("data", "row"))
gl = jax.make_array_from_callback(lb.shape, sh, lambda idx: lb[idx])
gr = jax.make_array_from_callback(rb.shape, sh, lambda idx: rb[idx])

out = sharded_match_pair(gl, gr, cfg, mesh, n_chunks=2)
out.block_until_ready()

for shard in out.addressable_shards:
    b = shard.index[0].start or 0
    r = shard.index[1].start or 0
    np.save(os.path.join(outdir, f"shard_p{pid}_b{b}_r{r}.npy"),
            np.asarray(shard.data))
print(f"worker {pid} ok", flush=True)
