"""Checkpoint/resume: the COMPLETE training state for exact resume.

The reference checkpoints only agent.state_dict() and loses Adam state,
constraint running-maxes, and curriculum counters (SURVEY.md §5.4). Here a
checkpoint holds (TrainState, EnvState) entirely: params, optimizer state,
obs/value normalizers, constraint running-max + max_p, env counters, and
PRNG keys — resume is bitwise-identical modulo hardware nondeterminism.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import jax
import numpy as np


def save(path: str, ts, es) -> str:
    """Serialize (TrainState, EnvState) to <path>.pkl (host numpy)."""
    payload = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), (ts, es))
    out = path + ".pkl"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, out)
    return out


def restore(path: str, ts_template, es_template) -> Tuple:
    """Load a checkpoint into the given templates (shapes must match)."""
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as f:
        ts, es = pickle.load(f)
    # structural check against the templates
    jax.tree_util.tree_structure((ts_template, es_template))
    return ts, es


def latest(run_dir: str) -> str:
    """Resolve the newest ckpt_*.pkl in a run directory (the reference's
    regex checkpoint resolution, clean_rl/play.py:84)."""
    cands = [f for f in os.listdir(run_dir)
             if f.startswith("ckpt_") and f.endswith(".pkl")]
    if not cands:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    def key(f):
        stem = f[len("ckpt_"):-len(".pkl")]
        return (1, int(stem)) if stem.isdigit() else (2, 0)
    return os.path.join(run_dir, sorted(cands, key=key)[-1])
