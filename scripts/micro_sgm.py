"""On-chip A/B for the SGM scan kernels.

Answers, on the real chip:
  1. Row-step cost model: is the serial row loop data-bound or does it
     carry a fixed per-row floor? (same element count, 8x different row
     counts — if times match, interleaving scans in one body won't help)
  2. Diagonal scans: skew kernels (MYSM_NO_DIAGROLL path) vs the
     lane-roll kernel, at sgm8_full scale
  3. sgm8_full whole-frame before/after

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_sgm.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu.ops import pallas_kernels as pk
from mystereomatching_tpu.ops import sgm as S

REPS = 10


def timed(name, f, *a):
    jf = jax.jit(f)
    _ = float(jnp.sum(jf(*a)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(jf(*a)))
    dt = (time.perf_counter() - t0 - 0.025) / REPS
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}))
    return dt


def chain(op):
    def f(*a):
        x = op(*a)
        for i in range(REPS - 1):
            x = op(a[0] + x * 1e-9, *a[1:])
        return x
    return f


def main():
    r = np.random.default_rng(0)
    d_ = 64

    # 1. row-floor probe: same elements, varying row count
    for h, w in ((1024, 160), (512, 320), (128, 1280)):
        vol = jnp.asarray(r.random((1, d_, h, w)), jnp.float32)
        ps = jnp.asarray(r.random((1, h, w)), jnp.float32)
        timed(f"vscan {h}x{w} (D={d_})",
              chain(lambda v, p: pk.sgm_scan_pallas(v, p)), vol, ps)

    # 1b. g-block interleave A/B on a batched pair of scans
    volp = jnp.asarray(r.random((2, d_, 512, 320)), jnp.float32)
    psp = jnp.asarray(r.random((2, 512, 320)), jnp.float32)
    timed("vscan g=2 gb=1", chain(lambda v, p: pk.sgm_scan_pallas(v, p)),
          volp, psp)
    timed("vscan g=2 gb=2",
          chain(lambda v, p: pk.sgm_scan_pallas(v, p, g_block=2)),
          volp, psp)

    # 2. diagonals at sgm8_full scale (750x1000, D=128), one direction
    d8, h8, w8 = 128, 750, 1000
    vol = jnp.asarray(r.random((d8, h8, w8)), jnp.float32)
    img = jnp.asarray(r.random((h8, w8, 3)) * 255, jnp.float32)
    p = S.penalty_scale(img, -1, -1, 15, 4.0)

    def via_skew(v, ps):
        vS, ok = S._skew(v, -1, 0.0)
        pS, _ = S._skew(ps, -1, 1.0)
        out = pk.sgm_scan_pallas(vS[None], pS[None], ok[None].astype(v.dtype))
        return S._unskew(out[0], -1, v.shape[-1])

    def via_roll(v, ps):
        volT = jnp.transpose(v, (1, 2, 0))[None]
        psT = ps[..., None][None]
        out = pk.sgm_diag_scan_pallas(volT, psT, shift=1, reverse=False)
        return jnp.transpose(out[0], (2, 0, 1))

    t_skew = timed("diag skew (-1,-1) 750x1000xD128", chain(via_skew), vol, p)
    t_roll = timed("diag roll (-1,-1) 750x1000xD128", chain(via_roll), vol, p)
    print(json.dumps({"op": "diag speedup", "x": round(t_skew / t_roll, 2)}))

    # equality on-chip (Mosaic lowering really ran, values match)
    a = np.asarray(jax.jit(via_skew)(vol, p))
    b = np.asarray(jax.jit(via_roll)(vol, p))
    print(json.dumps({"op": "diag bit-equal", "ok": bool((a == b).all()),
                      "maxdiff": float(np.abs(a - b).max())}))

    # 3. full 8-direction SGM stage, both modes
    volL = jnp.asarray(r.random((d8, h8, w8)), jnp.float32)
    f8 = chain(lambda v, im: S.sgm(v, im, 8))
    timed("sgm8 stage (roll)", f8, volL, img)
    os.environ["MYSM_NO_DIAGROLL"] = "1"
    timed("sgm8 stage (skew)", f8, volL, img)
    del os.environ["MYSM_NO_DIAGROLL"]


if __name__ == "__main__":
    main()
