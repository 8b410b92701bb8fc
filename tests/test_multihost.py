"""Multi-host runtime entry (SURVEY §2.7): the sharded program is
process-count agnostic — two jax.distributed CPU processes (4 virtual
devices each, 'data' across processes / 'row' within) reproduce the
single-process dense pipeline bit for bit."""

import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.sharding

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_matches_dense(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "scripts",
                                          "multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=1800)
        logs.append(out.decode())
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)

    # stitch local [1, h_band, W] shards back into per-pair [H, W] maps
    files = sorted(glob.glob(str(tmp_path / "shard_p*_b*_r*.npy")))
    assert files, "workers wrote no shards"
    got = {}
    for f in files:
        toks = os.path.basename(f)[:-4].split("_")
        b, r = int(toks[2][1:]), int(toks[3][1:])
        got.setdefault(b, {})[r] = np.load(f)
    full = {b: np.concatenate([rows[k] for k in sorted(rows)], axis=1)[0]
            for b, rows in got.items()}

    # dense single-process reference
    import jax.numpy as jnp

    from mystereomatching_tpu.config import fast_config
    from mystereomatching_tpu.data import make_synthetic_pair
    from mystereomatching_tpu.pipeline import match_pair

    cfg = fast_config(max_disp=7, census_rv=2, census_ru=3)
    for b, seed in ((0, 3), (1, 4)):
        p = make_synthetic_pair(h=64, w=48, max_disp=7, seed=seed)
        dense = np.asarray(match_pair(jnp.asarray(p.left, jnp.float32),
                                      jnp.asarray(p.right, jnp.float32),
                                      cfg)["disparity"])
        np.testing.assert_array_equal(full[b], dense)
