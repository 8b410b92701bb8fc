"""Experiment harness: the TPU-native equivalent of the reference driver.

Mirrors ``main()`` (main_.cpp:21-195): iterate a dataset table, run the
pipeline per object, evaluate bad-pixel/RMS over region masks, append a
sweep CSV row, save disparity/error artifacts, and record per-stage
timing. Adds what the reference lacked (SURVEY.md §5): resumability (the
CSV is the checkpoint — finished objects are skipped on restart, like the
reference's append-mode CSV but automatic) and batched multi-pair
evaluation over a device mesh.

CLI:  python -m mystereomatching_tpu.runner --model census_grad_cbca_sgm \
          [--root /path/to/middlebury] [--objects teddy cones] \
          [--synthetic N] [--out results/]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from mystereomatching_tpu import models
from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.data import (
    MIDDLEBURY_OBJECTS, StereoPair, load_middlebury_object, make_synthetic_pair)
from mystereomatching_tpu.pipeline import StereoPipeline
from mystereomatching_tpu.utils import imio, metrics
from mystereomatching_tpu.utils.timing import StageTimer, mp_disparities_per_sec


def run_object(pair: StereoPair, cfg: MatchConfig, out_dir: Optional[str] = None,
               save_artifacts: bool = True) -> Dict[str, float]:
    """Run one stereo pair end-to-end and evaluate (main_.cpp:135-191)."""
    import jax

    timer = StageTimer()
    pipe = StereoPipeline(cfg)
    with timer.span("compile+first"):
        out = pipe(pair.left, pair.right)
        d = np.asarray(out["disparity"])
    with timer.span("steady"):
        d = np.asarray(pipe(pair.left, pair.right)["disparity"])

    row: Dict[str, float] = {"object": pair.name, "max_disp": pair.max_disp}
    if pair.gt is not None:
        masks = {k: np.asarray(v) for k, v in (pair.masks or {}).items()}
        ev = metrics.evaluate(d, pair.gt, masks or None, cfg.error_threshold)
        row.update({k: float(v) for k, v in ev.items()})
    h, w = d.shape
    row["mpds"] = mp_disparities_per_sec(h, w, cfg.num_disp,
                                         timer.spans["steady"])
    row["time_ms"] = round(timer.spans["steady"] * 1e3, 2)

    if out_dir and save_artifacts:
        os.makedirs(out_dir, exist_ok=True)
        imio.imwrite(os.path.join(out_dir, f"{pair.name}_disp.png"),
                     imio.disparity_to_image(d, pair.max_disp))
        if pair.gt is not None:
            nonocc = (pair.masks or {}).get("nonocc")
            imio.imwrite(os.path.join(out_dir, f"{pair.name}_err.png"),
                         imio.error_map_image(d, pair.gt, nonocc,
                                              cfg.error_threshold))
        timer.save(os.path.join(out_dir, "time.txt"))
    return row


def synthetic_suite(n: int, base_hw=(192, 256), max_disp: int = 31) -> List[StereoPair]:
    return [make_synthetic_pair(h=base_hw[0], w=base_hw[1], max_disp=max_disp,
                                seed=i, name=f"synthetic{i}") for i in range(n)]


def _done_objects(csv_path: str) -> set:
    import csv as _csv

    if not os.path.exists(csv_path):
        return set()
    with open(csv_path) as f:
        return {r.get("object") for r in _csv.DictReader(f)}


def run_suite(
    model: str,
    objects: Optional[List[str]] = None,
    root: Optional[str] = None,
    synthetic: int = 0,
    out_dir: str = "results",
    resume: bool = True,
    retries: int = 1,
    **cfg_kw,
) -> List[Dict[str, float]]:
    """Sweep over a dataset table (the reference's 33-object loop,
    main_.cpp:75-191), resumable via the sweep CSV. A failing object is
    retried ``retries`` times, then journaled to <model>_failures.json and
    skipped — the suite always completes (SURVEY §5 failure detection);
    :func:`supervise` adds process isolation + hang watchdog on top."""
    csv_path = os.path.join(out_dir, f"{model}.csv")
    done = _done_objects(csv_path) if resume else set()

    pairs: List[StereoPair] = []
    if synthetic:
        pairs += synthetic_suite(synthetic)
    if root:
        names = objects or [r[0] for r in MIDDLEBURY_OBJECTS]
        for name in names:
            try:
                pairs.append(load_middlebury_object(root, name))
            except FileNotFoundError:
                print(f"[skip] {name}: files not found under {root}")

    rows = []
    failures_path = os.path.join(out_dir, f"{model}_failures.json")
    for pair in pairs:
        if pair.name in done:
            print(f"[resume] {pair.name} already in {csv_path}")
            continue
        cfg = models.get_model(model, max_disp=pair.max_disp, **cfg_kw)
        t0 = time.perf_counter()
        row, err = None, None
        for attempt in range(1 + max(retries, 0)):
            try:
                row = run_object(pair, cfg, out_dir)
                break
            except Exception as e:                  # noqa: BLE001 — the
                # suite must survive a bad object / transient device error
                err = e
                print(f"[retry {attempt + 1}] {pair.name}: {e!r}")
        if row is None:
            _record_failure(failures_path, pair.name, repr(err))
            print(f"[FAILED] {pair.name}: {err!r} (recorded, continuing)")
            continue
        row["model"] = model
        imio.append_csv_row(csv_path, row)
        rows.append(row)
        print(f"{pair.name}: {json.dumps(row)} "
              f"({time.perf_counter() - t0:.1f}s total)")
    return rows


def _record_failure(path: str, name: str, err: str) -> None:
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[name] = {"error": err, "time": time.time()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def supervise(model: str, objects: List[str], out_dir: str = "results",
              timeout_s: float = 1200.0, max_restarts: int = 2,
              python: str = None, extra_args: List[str] = None) -> int:
    """Elastic supervisor (SURVEY §5 failure detection / restartable runs):
    run each object in an ISOLATED worker process with a hang watchdog.

    A worker that crashes or exceeds ``timeout_s`` (e.g. a wedged device
    tunnel) is killed BY EXACT PID and the object retried up to
    ``max_restarts`` times; the sweep CSV is the shared checkpoint, so
    completed objects are never re-run (the resume set is re-read before
    every launch). Returns the number of objects that never succeeded.
    """
    import subprocess
    import sys as _sys

    py = python or _sys.executable
    csv_path = os.path.join(out_dir, f"{model}.csv")
    failed = 0
    for name in objects:
        ok = False
        for attempt in range(1 + max_restarts):
            if name in _done_objects(csv_path):
                ok = True
                break
            cmd = [py, "-m", "mystereomatching_tpu.runner", "--model", model,
                   "--objects", name, "--out", out_dir]
            cmd += list(extra_args or [])
            proc = subprocess.Popen(cmd)
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                proc.kill()                          # exact PID, never pattern
                proc.wait()
                print(f"[watchdog] {name}: killed after {timeout_s}s "
                      f"(attempt {attempt + 1})")
                continue
            if rc == 0 and name in _done_objects(csv_path):
                ok = True
                break
            print(f"[supervise] {name}: worker rc={rc} (attempt {attempt + 1})")
        if not ok:
            failed += 1
            _record_failure(os.path.join(out_dir, f"{model}_failures.json"),
                            name, "exhausted supervisor restarts")
    return failed


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="census_grad_cbca_sgm",
                    choices=models.list_models())
    ap.add_argument("--root", default=None, help="Middlebury root directory")
    ap.add_argument("--objects", nargs="*", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="number of synthetic pairs to evaluate")
    ap.add_argument("--out", default="results")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    if not args.root and not args.synthetic:
        args.synthetic = 3
    run_suite(args.model, args.objects, args.root, args.synthetic,
              args.out, resume=not args.no_resume)


if __name__ == "__main__":
    main()
