"""Benchmark the five BASELINE.json configurations on the attached chip.

Writes BENCH_DETAIL.json (list of per-config rows: throughput + quality on
synthetic oracle scenes). The headline driver metric stays bench.py.

Scales: configs 1/2/4 at their reference scales (Tsukuba / Teddy); config 3
at Middlebury half-res; config 5 at the largest full-res-class size that
fits one chip's HBM without disparity-block streaming (see SURVEY.md §7
hard-part 3 — the [4,D,H,W] intersected-arm tensor dominates).
"""

import json
import os
import time

# persistent compile cache (see bench.py) — set before jax import
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# the axon sitecustomize imports jax at interpreter startup, freezing
# env-derived config — apply at runtime too
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu import models
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.pipeline import StereoPipeline
from mystereomatching_tpu.utils.metrics import bad_pixel_stats

# (model, kwargs, H, W, max_disp, scale_note)
CONFIGS = [
    ("ad_census_wta", {}, 288, 384, 15, "tsukuba-scale D=16"),
    ("census_cbca_lrc", {}, 375, 450, 63, "teddy/cones-scale D=64"),
    ("sgm8_full", {}, 750, 1000, 127, "middlebury half-res D=128"),
    ("nl_tree_filter", {}, 375, 450, 59, "teddy-scale D=60"),
    # batch-4 stacked-forest variant measured 81.2 MP*disp/s — neutral vs
    # single-frame (row-latency-bound costs scale with batch; only the
    # ~25ms dispatch amortizes, eaten by log-factor sort/ranking growth).
    # The API (pipeline.match_pair_nl_batch) stays: bit-identical per
    # frame, useful for suite runs. Re-add {"batch": 4} here to re-measure.
    ("nl_tree_filter", {"nl_tree_host": True}, 375, 450, 59,
     "teddy-scale D=60, host-C++ Kruskal hybrid (nl_tree_host=1)"),
    ("nl_tree_filter", {"nl_filter_dtype": "bfloat16"}, 375, 450, 59,
     "teddy-scale D=60, bf16 tree-filter peel phases (documented-"
     "approximate fast mode; build + core exact)"),
    ("fullres_occfill", {}, 1000, 1400, 191, "2014 large-scale D=192"),
    ("fullres_occfill",
     {"vol_dtype": "bfloat16", "compute_both_volumes": False},
     1280, 1500, 255,
     "D=256 large-scale (bf16 volumes, cooperative WTA; largest plane"
     " without D-streaming)"),
    ("fullres_occfill",
     {"vol_dtype": "bfloat16", "compute_both_volumes": False,
      "d_stream_block": 32},
     1988, 2880, 255,
     "TRUE full-res 2014 D=256 (bf16, cooperative WTA, cost+CBCA streamed"
     " over 32-disparity blocks, windowed-lookahead arm kernels)"),
]

ITERS = 3


def run_one(name, kw, h, w, max_disp, note):
    kw = dict(kw)
    batch = kw.pop("batch", None)
    if batch:
        import functools

        from mystereomatching_tpu.pipeline import match_pair_nl_batch

        pairs = [make_synthetic_pair(h=h, w=w, max_disp=max_disp, seed=s)
                 for s in range(batch)]
        pair = pairs[0]
        cfg = models.get_model(name, max_disp=max_disp, **kw)
        bf = jax.jit(functools.partial(match_pair_nl_batch, cfg=cfg))
        left = jnp.asarray(np.stack([p.left for p in pairs]), jnp.float32)
        right = jnp.asarray(np.stack([p.right for p in pairs]), jnp.float32)
        fn = lambda l, r: bf(l, r)["disparity"][0]
        scale = batch
    else:
        pair = make_synthetic_pair(h=h, w=w, max_disp=max_disp, seed=0)
        cfg = models.get_model(name, max_disp=max_disp, **kw)
        pipe = StereoPipeline(cfg)      # handles host-tree hybrid configs
        fn = lambda l, r: pipe(l, r)["disparity"]
        left = jnp.asarray(pair.left, jnp.float32)
        right = jnp.asarray(pair.right, jnp.float32)
        scale = 1

    t0 = time.perf_counter()
    out = fn(left, right)
    _ = float(jnp.sum(out))
    compile_s = time.perf_counter() - t0

    _ = float(jnp.sum(fn(left, right)))
    t0 = time.perf_counter()
    for _i in range(ITERS):
        out = fn(left, right)
        _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS / scale   # per frame

    d = np.asarray(out, np.float32)
    bad, _rms = bad_pixel_stats(jnp.asarray(d), jnp.asarray(pair.gt), jnp.asarray(pair.masks["nonocc"]), thresh=1.0)
    mpds = h * w * (max_disp + 1) / dt / 1e6
    row = {
        "config": name, "note": note, "h": h, "w": w,
        "num_disp": max_disp + 1,
        "ms_per_frame": round(dt * 1e3, 2),
        "mp_disp_per_s": round(mpds, 1),
        "bad1_nonocc": round(float(bad), 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row))
    return row


def main():
    rows = []
    for spec in CONFIGS:
        try:
            rows.append(run_one(*spec))
        except Exception as e:  # keep going; record the failure
            rows.append({"config": spec[0], "error": str(e)[:300]})
            print(f"{spec[0]}: FAILED {str(e)[:200]}")
    rows.append({"headline": "default census_grad+CBCA+SGM4+refine,"
                 " teddy-scale, batch-12 dispatch (bench.py); quality"
                 " bit-identical to the XLA fallback path"})
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
