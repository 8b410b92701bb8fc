"""Golden diff: our pipeline vs the reference binary's disparity dumps.

Run after refbuild/refdriver has produced out/<scene>_{wta,final}.bin
(see scripts/export_ref_inputs.py + refbuild/Makefile). Compares the raw
WTA disparity and the refined disparity pixel-by-pixel, and scores both
pipelines against GT with the reference's bad-1.0 metric.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_ref_disp(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        d = np.frombuffer(f.read(h * w * 2), np.int16).reshape(h, w)
    return d.astype(np.int32)


def stats(name, ours, ref, gt, max_disp):
    ours = np.asarray(ours)
    valid_ref = ref >= 0
    valid_ours = ours >= 0
    both = valid_ref & valid_ours
    agree = (ours == ref) & both
    close = (np.abs(ours - ref) <= 1) & both
    bad1_ref = float(np.mean((np.abs(ref - gt) > 1) | ~valid_ref))
    bad1_ours = float(np.mean((np.abs(ours - gt) > 1) | ~valid_ours))
    print(json.dumps({
        "stage": name,
        "exact_agree_pct": round(100 * agree.sum() / both.sum(), 2),
        "within1_agree_pct": round(100 * close.sum() / both.sum(), 2),
        "invalid_ref_pct": round(100 * (~valid_ref).mean(), 2),
        "invalid_ours_pct": round(100 * (~valid_ours).mean(), 2),
        "bad1_ref": round(bad1_ref, 4),
        "bad1_ours": round(bad1_ours, 4),
    }))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "teddy_scale"
    params = {"teddy_scale": dict(h=375, w=450, max_disp=59, seed=0),
              "tsukuba_scale": dict(h=288, w=384, max_disp=15, seed=1)}[scene]

    from mystereomatching_tpu import data, pipeline
    from mystereomatching_tpu.models.presets import MODEL_REGISTRY

    pair = data.make_synthetic_pair(name=scene, **params)
    gt = np.asarray(pair.gt)

    ref_wta = load_ref_disp(f"/root/repo/refbuild/out/{scene}_wta.bin")
    ref_final = load_ref_disp(f"/root/repo/refbuild/out/{scene}_final.bin")

    cfg = MODEL_REGISTRY["census_grad_cbca_sgm"](max_disp=params["max_disp"])
    out = pipeline.match_pair(pair.left, pair.right, cfg)
    ours_wta = np.asarray(out["disp_left_raw"])
    ours_final = np.asarray(out["disparity"])
    # final map may contain sentinels (<0) = invalid
    stats("wta", ours_wta, ref_wta, gt, params["max_disp"])
    stats("final", np.round(ours_final).astype(np.int32), ref_final, gt,
          params["max_disp"])


if __name__ == "__main__":
    main()
