"""Export synthetic stereo pairs as PNGs in the reference's input format.

Writes left/right/GT images that refbuild/refdriver can consume, so the
reference C++ pipeline (built via refbuild/Makefile) can be run on the same
scenes our framework is benchmarked on (VERDICT.md round-1 item 1: measured
CPU baseline + golden reference outputs). GT is saved scaled by
``reduce_coeff`` exactly like Middlebury disp maps (main_.cpp:128-129).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2

from mystereomatching_tpu import data


def export(pair, outdir: str, reduce_coeff: int = 4) -> None:
    os.makedirs(outdir, exist_ok=True)
    # reference reads with cv::imread(color) == BGR; our arrays are RGB
    cv2.imwrite(os.path.join(outdir, "left.png"),
                np.asarray(pair.left)[:, :, ::-1])
    cv2.imwrite(os.path.join(outdir, "right.png"),
                np.asarray(pair.right)[:, :, ::-1])
    gt = np.asarray(pair.gt).astype(np.float64) * reduce_coeff
    assert gt.max() <= 255, "GT*reduce_coeff must fit u8 like Middlebury"
    cv2.imwrite(os.path.join(outdir, "gt.png"), gt.astype(np.uint8))
    np.save(os.path.join(outdir, "gt.npy"), np.asarray(pair.gt))


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/refbuild/inputs"
    scenes = {
        # teddy-scale: the headline bench scene (bench.py uses seed 0)
        "teddy_scale": dict(h=375, w=450, max_disp=59, seed=0),
        # tsukuba-scale
        "tsukuba_scale": dict(h=288, w=384, max_disp=15, seed=1),
    }
    for name, kw in scenes.items():
        pair = data.make_synthetic_pair(name=name, **kw)
        export(pair, os.path.join(root, name))
        print(f"{name}: h={kw['h']} w={kw['w']} max_disp={kw['max_disp']} "
              f"-> {root}/{name}")

    # photographic-texture scenes (VERDICT r3 item 7): same geometry
    # machinery, real photo textures — natural texture statistics
    photo_scenes = {
        "photo_teddy": dict(h=375, w=450, max_disp=59, seed=0),
        "photo_small": dict(h=144, w=192, max_disp=23, seed=3),
    }
    for name, kw in photo_scenes.items():
        pair = data.make_photo_pair(name=name, **kw)
        export(pair, os.path.join(root, name))
        print(f"{name}: h={kw['h']} w={kw['w']} max_disp={kw['max_disp']} "
              f"-> {root}/{name}")

    # adversarial scenes (VERDICT r2 item 4): slanted planes (non-integer
    # GT), low-texture regions, repeated patterns — dense tie structure
    adversarial = {
        "adv_teddy": dict(h=375, w=450, max_disp=59, seed=0),
        "adv_small": dict(h=144, w=192, max_disp=23, seed=3),
    }
    for name, kw in adversarial.items():
        pair = data.make_adversarial_pair(name=name, **kw)
        export(pair, os.path.join(root, name))
        print(f"{name}: h={kw['h']} w={kw['w']} max_disp={kw['max_disp']} "
              f"-> {root}/{name}")
