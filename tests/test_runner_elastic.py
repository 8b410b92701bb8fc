"""Failure-detection / restartable-run semantics of the suite runner."""
import json
import os

import numpy as np


def test_run_suite_survives_failing_object(tmp_path, monkeypatch):
    import mystereomatching_tpu.runner as runner

    calls = {"n": 0}
    real = runner.run_object

    def flaky(pair, cfg, out_dir=None, save_artifacts=True):
        calls["n"] += 1
        if pair.name == "synthetic1":
            raise RuntimeError("injected device loss")
        return real(pair, cfg, out_dir, save_artifacts=False)

    monkeypatch.setattr(runner, "run_object", flaky)
    rows = runner.run_suite("census_wta", synthetic=3, out_dir=str(tmp_path),
                            retries=1)
    # synthetic1 failed both attempts and was journaled; the others completed
    names = {r["object"] for r in rows}
    assert "synthetic1" not in names and len(names) == 2
    fj = json.load(open(tmp_path / "census_wta_failures.json"))
    assert "synthetic1" in fj and "injected device loss" in fj["synthetic1"]["error"]
    # 2 attempts for the failing object + 1 each for the healthy ones
    assert calls["n"] == 4


def test_run_suite_resumes_from_csv(tmp_path, monkeypatch):
    import mystereomatching_tpu.runner as runner

    rows1 = runner.run_suite("census_wta", synthetic=2, out_dir=str(tmp_path))
    assert len(rows1) == 2
    calls = {"n": 0}
    real = runner.run_object

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(runner, "run_object", counting)
    rows2 = runner.run_suite("census_wta", synthetic=2, out_dir=str(tmp_path))
    assert rows2 == [] and calls["n"] == 0      # all resumed, none re-run
