"""Time the XLA CPU compile of the NL d-shard dryrun program (item 1,
round 5): the driver's MULTICHIP gate times out in this compile. Usage:
    python scripts/time_nl_dshard_compile.py [n_devices]
Prints lowering time, compile time, and HLO size. Cache disabled.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import functools

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n_dev)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.parallel.mesh import make_mesh
from mystereomatching_tpu.parallel.nl_sharded import nl_disparity_dshard

mesh_nl = make_mesh(n_row=1, n_data=1, n_disp=n_dev)
cfg_nl = MatchConfig(max_disp=7, aggregation="nl", cost="qx_ad_grad",
                     nl_post_process=True).validate()
hn, w = n_dev * 8, 40
rng = np.random.default_rng(0)
left = jnp.asarray(rng.integers(0, 255, (hn, w, 3)), jnp.float32)
right = jnp.roll(left, 2, axis=1)

fn = jax.jit(functools.partial(nl_disparity_dshard, cfg=cfg_nl, mesh=mesh_nl))
t0 = time.time()
lowered = fn.lower(left, right)
t1 = time.time()
hlo = lowered.as_text()
t2 = time.time()
compiled = lowered.compile()
t3 = time.time()
out = compiled(left, right)
out.block_until_ready()
t4 = time.time()
print(f"lower {t1-t0:.1f}s  hlo_chars {len(hlo)}  compile {t3-t2:.1f}s  "
      f"run {t4-t3:.1f}s  total {t3-t0:.1f}s")
