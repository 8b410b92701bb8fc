"""Generate golden outputs for the NL disparity flow (incl. non-local
post-processing) from the reference binary.

Runs refbuild/nldriver — which drives the actual qx_nonlocal_cost_
aggregation::disparity(out, {false,true}) flow (NL/qx_nonlocal_cost_
aggregation.cpp:72-109) — on synthetic scenes with a deterministic injected
cost volume, and copies the resulting disparity maps to tests/golden/.
tests/test_nl_golden.py rebuilds the same volume and asserts our
ops/nl.nl_disparity matches.
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mystereomatching_tpu import data
from scripts.export_ref_inputs import export

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")

SCENES = {
    "small_scale": dict(h=144, w=192, max_disp=23, seed=3),
    "tsukuba_scale": dict(h=288, w=384, max_disp=15, seed=1),
    # teddy scale — the scale the NL bench row quotes (VERDICT r2 item 7)
    "teddy_scale": dict(h=375, w=450, max_disp=59, seed=0),
    # adversarial scene: slanted planes + periodic + low texture (item 4)
    "adv_small": dict(h=144, w=192, max_disp=23, seed=3, adversarial=True),
}


def make_nl_vol(pair, num_disp: int) -> np.ndarray:
    """Deterministic [D,H,W] float32 test volume: truncated AD on the green
    channel, clamped at the left border — simple, reproducible without JAX,
    and identical on both sides of the comparison by construction."""
    gl = np.asarray(pair.left)[:, :, 1].astype(np.float32)
    gr = np.asarray(pair.right)[:, :, 1].astype(np.float32)
    h, w = gl.shape
    vol = np.empty((num_disp, h, w), np.float32)
    for d in range(num_disp):
        shifted = np.concatenate([np.repeat(gr[:, :1], d, 1), gr[:, :w - d]], 1)
        vol[d] = np.minimum(np.abs(gl - shifted), 30.0)
    return vol


def write_vol(vol: np.ndarray, path: str) -> None:
    d, h, w = vol.shape
    with open(path, "wb") as f:
        np.asarray([h, w, d], np.int32).tofile(f)
        # driver expects [H,W,D] row-major
        np.ascontiguousarray(vol.transpose(1, 2, 0)).tofile(f)


def main() -> None:
    inputs = os.path.join(REPO, "refbuild", "inputs")
    nldriver = os.path.join(REPO, "refbuild", "nldriver")
    os.makedirs(GOLDEN, exist_ok=True)
    only = sys.argv[1:] or None
    for name, kw in SCENES.items():
        if only and name not in only:
            continue
        kw = dict(kw)
        gen = (data.make_adversarial_pair if kw.pop("adversarial", False)
               else data.make_synthetic_pair)
        pair = gen(name=name, **kw)
        scene_dir = os.path.join(inputs, name)
        export(pair, scene_dir)
        vol = make_nl_vol(pair, kw["max_disp"] + 1)
        vol_path = os.path.join(scene_dir, "nl_vol.bin")
        write_vol(vol, vol_path)
        prefix = os.path.join(scene_dir, name)
        out = subprocess.run(
            [nldriver, os.path.join(scene_dir, "left.png"),
             os.path.join(scene_dir, "right.png"), vol_path, prefix, "0.1"],
            check=True, capture_output=True, text=True)
        print(name, out.stdout.strip())
        for kind in ("nl_nopost", "nl_post"):
            src = f"{prefix}_{kind}.bin"
            dst = os.path.join(GOLDEN, f"{name}_{kind}.bin")
            os.replace(src, dst)
            print("  ->", dst)
        # full standalone presets: the reference's own cost functions
        # (color+gradient / 80-bit census) + the same disparity flow
        nd = str(kw["max_disp"] + 1)
        for mode in ("adgrad", "census"):
            subprocess.run(
                [nldriver, os.path.join(scene_dir, "left.png"),
                 os.path.join(scene_dir, "right.png"), mode, prefix, "0.1",
                 nd],
                check=True, capture_output=True, text=True)
            for kind in ("nl_nopost", "nl_post"):
                src = f"{prefix}_{kind}.bin"
                dst = os.path.join(GOLDEN, f"{name}_{mode}_{kind}.bin")
                os.replace(src, dst)
                print("  ->", dst)
            os.remove(f"{prefix}_nl_rawvol.bin")


if __name__ == "__main__":
    main()
