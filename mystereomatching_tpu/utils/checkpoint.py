"""Stage checkpointing for restartable runs (SURVEY.md §5).

The reference has no checkpoint/resume; its closest analog is the
append-mode sweep CSV. Here, long multi-object (or future multi-host)
runs can persist intermediate stage outputs — cost volumes, disparity
maps — as compressed npz (host) or via orbax when available, so a crashed
sweep resumes mid-pipeline. The sweep CSV checkpointing itself lives in
runner.py (_done_objects).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_stage(path: str, name: str, arrays: Dict[str, np.ndarray]) -> str:
    """Persist one stage's outputs: results/<name>.npz (atomic rename)."""
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, f"{name}.npz")
    tmp = os.path.join(path, f".{name}.tmp.npz")  # savez appends .npz itself
    np.savez_compressed(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, f)
    return f


def load_stage(path: str, name: str) -> Optional[Dict[str, np.ndarray]]:
    f = os.path.join(path, f"{name}.npz")
    if not os.path.exists(f):
        return None
    with np.load(f) as z:
        return {k: z[k] for k in z.files}


def save_stage_orbax(path: str, name: str, pytree) -> str:
    """Orbax-backed checkpoint for device arrays (multi-host friendly)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, pytree, force=True)
    ckptr.wait_until_finished()
    return ckpt_dir


def load_stage_orbax(path: str, name: str, abstract_pytree=None):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, name))
    if not os.path.exists(ckpt_dir):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(ckpt_dir, abstract_pytree)
