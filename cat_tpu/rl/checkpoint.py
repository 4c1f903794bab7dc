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


def _to_host(x):
    """Fetch a (possibly multi-process global) array to host numpy.

    Env-sharded leaves in a multi-host run are not fully addressable;
    allgather them (tiled: concatenated along the sharded axis). Replicated
    leaves fetch directly.
    """
    if isinstance(x, jax.Array) and not (
        x.is_fully_addressable or x.is_fully_replicated
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def save(path: str, ts, es, write: bool = True) -> str:
    """Serialize (TrainState, EnvState) to <path>.pkl (host numpy).

    Multi-host: every process participates in the allgather of sharded
    leaves; only host 0 should write (pass write=jax.process_index()==0).
    """
    payload = jax.tree.map(_to_host, (ts, es))
    out = path + ".pkl"
    if not write:
        return out
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, out)
    return out


def restore(path: str, ts_template, es_template, strict: bool = True) -> Tuple:
    """Load a checkpoint into the given templates, with validation.

    * Fields that are None in the loaded state (trailing defaulted fields
      added after the checkpoint was written) are filled from the template.
    * Tree structure and every leaf's shape/dtype are validated against the
      templates so a mismatched checkpoint fails HERE with a named path,
      not later with an opaque XLA error.
    * strict=False: leaves whose shape differs from the template keep the
      TEMPLATE value instead of erroring — for loading a training
      checkpoint into a differently-sized eval env (play.py), where only
      the env-size-independent leaves (params, normalizers) matter.
    """
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as f:
        ts, es = pickle.load(f)
    es = _fill_defaults(es, es_template)
    ts = _fill_defaults(ts, ts_template)

    tmpl_struct = jax.tree_util.tree_structure((ts_template, es_template))
    got_struct = jax.tree_util.tree_structure((ts, es))
    if tmpl_struct != got_struct:
        raise ValueError(
            f"checkpoint {path} tree structure does not match the current "
            f"TrainState/EnvState schema:\n  expected {tmpl_struct}\n  "
            f"got      {got_struct}"
        )
    tmpl_leaves = jax.tree_util.tree_leaves_with_path(
        (ts_template, es_template)
    )
    got_leaves = jax.tree_util.tree_leaves((ts, es))
    out_leaves = []
    dropped = []
    for (kp, want), got in zip(tmpl_leaves, got_leaves):
        w_shape = np.shape(want)
        g_shape = np.shape(got)
        if w_shape != g_shape:
            if strict:
                raise ValueError(
                    f"checkpoint {path}: leaf {jax.tree_util.keystr(kp)} "
                    f"has shape {g_shape}, expected {w_shape} (different "
                    f"num_envs or model?)"
                )
            dropped.append(jax.tree_util.keystr(kp))
            out_leaves.append(want)
        else:
            out_leaves.append(got)
    if dropped:
        print(f"restore(strict=False): kept template values for "
              f"{len(dropped)} size-mismatched leaves (e.g. {dropped[0]})")
        treedef = jax.tree_util.tree_structure((ts, es))
        ts, es = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return ts, es


def restore_local_shard(path: str, ts_template, es_template,
                        process_id: int, num_processes: int) -> Tuple:
    """Multi-host resume: load a (global) checkpoint and slice this
    process's env rows out of every env-sharded leaf.

    Templates are the HOST-LOCAL states (leading dim = local env count);
    leaves whose stored leading dim is num_processes x the template's are
    sliced, everything else is validated to match exactly.
    """
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as f:
        ts, es = pickle.load(f)
    es = _fill_defaults(es, es_template)
    ts = _fill_defaults(ts, ts_template)
    tmpl_struct = jax.tree_util.tree_structure((ts_template, es_template))
    got_struct = jax.tree_util.tree_structure((ts, es))
    if tmpl_struct != got_struct:
        raise ValueError(
            f"checkpoint {path} tree structure does not match the current "
            f"schema:\n  expected {tmpl_struct}\n  got {got_struct}"
        )
    tmpl_leaves = jax.tree_util.tree_leaves_with_path(
        (ts_template, es_template)
    )
    got_leaves = jax.tree_util.tree_leaves((ts, es))
    out = []
    for (kp, want), got in zip(tmpl_leaves, got_leaves):
        w_shape, g_shape = np.shape(want), np.shape(got)
        if w_shape == g_shape:
            out.append(got)
        elif (len(w_shape) == len(g_shape) and len(w_shape) >= 1
              and g_shape[0] == num_processes * w_shape[0]
              and g_shape[1:] == w_shape[1:]):
            n_loc = w_shape[0]
            out.append(got[process_id * n_loc:(process_id + 1) * n_loc])
        else:
            raise ValueError(
                f"checkpoint {path}: leaf {jax.tree_util.keystr(kp)} has "
                f"shape {g_shape}, expected {w_shape} or "
                f"{(num_processes * w_shape[0],) + tuple(w_shape[1:]) if w_shape else w_shape}"
            )
    treedef = jax.tree_util.tree_structure((ts, es))
    return jax.tree_util.tree_unflatten(treedef, out)


def _fill_defaults(loaded, template):
    """Replace None fields of a loaded NamedTuple with template values
    (schema evolution: trailing defaulted fields)."""
    if not (hasattr(loaded, "_fields") and hasattr(template, "_fields")):
        return loaded
    updates = {}
    for f in loaded._fields:
        if getattr(loaded, f) is None and getattr(template, f) is not None:
            updates[f] = getattr(template, f)
    return loaded._replace(**updates) if updates else loaded


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
