"""TPU smoke: run every registered model preset once on the attached chip.

Catches Mosaic/Pallas lowering issues that the CPU test mesh can't see.
Small frames keep per-model compile manageable; prints one line per model.
"""
import time

import jax.numpy as jnp
import numpy as np

from mystereomatching_tpu import models
from mystereomatching_tpu.data import make_synthetic_pair
from mystereomatching_tpu.pipeline import StereoPipeline

H, W, MD = 120, 160, 15


def main():
    pair = make_synthetic_pair(h=H, w=W, max_disp=MD, seed=0)
    for name in models.list_models():
        t0 = time.perf_counter()
        try:
            cfg = models.get_model(name, max_disp=MD)
            d = np.asarray(StereoPipeline(cfg)(pair.left, pair.right)["disparity"])
            m = (pair.gt > 0) & pair.masks["nonocc"]
            bad = (((np.abs(d - pair.gt) > 1) | (d < 0)) & m).sum() / m.sum()
            print(f"{name:24s} OK   bad1={bad:.3f}  "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:24s} FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
