"""Compile-time attribution table (VERDICT r2 item 6): local XLA compile
time for each benchmark config vs the tunnel-side cold numbers recorded in
BENCH_DETAIL.json. Run with JAX_PLATFORMS=cpu (no tunnel involvement):
measures trace+lower time and XLA compile time separately, plus HLO size.
"""
import json, os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import functools

from mystereomatching_tpu import models
from mystereomatching_tpu.pipeline import match_pair

CONFIGS = [
    ("ad_census_wta", {}, 288, 384, 15),
    ("census_cbca_lrc", {}, 375, 450, 63),
    ("sgm8_full", {}, 750, 1000, 127),
    ("nl_tree_filter", {}, 375, 450, 59),
    ("fullres_occfill", {}, 1000, 1400, 191),
]

rows = []
for name, kw, h, w, md in CONFIGS:
    cfg = models.get_model(name, max_disp=md, **kw)
    left = jnp.zeros((h, w, 3), jnp.float32)
    fn = jax.jit(functools.partial(match_pair, cfg=cfg))
    t0 = time.perf_counter()
    lowered = fn.lower(left, left)
    t_lower = time.perf_counter() - t0
    hlo_chars = len(lowered.as_text())
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    row = {"config": name, "h": h, "w": w, "D": md + 1,
           "trace_lower_s": round(t_lower, 1),
           "xla_cpu_compile_s": round(t_compile, 1),
           "hlo_kchars": hlo_chars // 1000}
    rows.append(row)
    print(json.dumps(row), flush=True)

with open("COMPILE_TABLE.json", "w") as f:
    json.dump(rows, f, indent=1)
