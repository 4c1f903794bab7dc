"""Multi-chip scaling: mesh construction + shard_map'd training.

TPU-native replacement for the reference's NCCL/torch.distributed data
parallelism (SURVEY.md §2.5: rl_games `--distributed` per-rank device setup,
skrl broadcast/all-reduce hooks). Design:

  * ONE mesh axis ``env``: env batch sharded across every chip (ICI within a
    slice, DCN across hosts via jax.distributed); params/optimizer replicated.
  * All cross-chip communication is inside the jitted train iteration:
    gradient pmean, normalizer-moment psum, constraint running-max pmax,
    metric pmean — XLA emits the collectives, no backend code.
  * The same `PPO.train_iteration` body runs single-chip (axis_name=None) and
    multi-chip (under shard_map) — tested on CPU with
    xla_force_host_platform_device_count (the fake-backend analog).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cat_tpu.envs.env import CatEnv
from cat_tpu.rl.ppo import PPO, PpoCfg

ENV_AXIS = "env"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (ENV_AXIS,))


# TrainState fields that are env-batched BY STRUCTURE, not by shape: these
# three rollout carries are the ONLY deliberately sharded TrainState leaves;
# everything else (params/opt/rms/counters — and any field added later) is
# replicated by default, so a network bias of width == num_envs (e.g. the
# 128-wide Dense_2 at 128 envs) can never fool the leading-dim heuristic
# into batch-sharding a parameter, and a future replicated field cannot
# silently fall back to the heuristic.
_BATCHED_TS_FIELDS = frozenset(["next_obs", "next_done", "next_true_done"])


def _specs_for(tree, num_envs: int):
    """P('env') for leaves whose leading dim is the global env count, else P()
    (replicated). TrainState fields are classified by name (params/opt/rms/
    counters replicated; only the next_* rollout carries are batched)."""
    from cat_tpu.rl.ppo import TrainState

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return P(ENV_AXIS)
        return P()

    if isinstance(tree, TrainState):
        assert _BATCHED_TS_FIELDS <= set(TrainState._fields), (
            _BATCHED_TS_FIELDS, TrainState._fields
        )
        return TrainState(*[
            jax.tree.map(spec, getattr(tree, f))
            if f in _BATCHED_TS_FIELDS
            else jax.tree.map(lambda _: P(), getattr(tree, f))
            for f in tree._fields
        ])
    return jax.tree.map(spec, tree)


def shard_states(mesh: Mesh, tree, num_envs: int):
    """Place a host-built state pytree onto the mesh."""
    specs = _specs_for(tree, num_envs)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def make_train_fn(env: CatEnv, cfg: PpoCfg, mesh: Mesh):
    """Build (ppo, jitted train_fn(ts, es) -> (ts, es, metrics)) over the mesh.

    The global env count must be divisible by mesh size; the GLOBAL
    minibatch_size is split evenly across chips (cfg.minibatch_size //
    n_devices rows per chip per SGD step, gradients pmean'd — the exact
    analog of the reference's multi-GPU all-reduce, skrl/ppo.py:534-537).
    """
    ndev = mesh.size
    num_envs = env.cfg.num_envs
    assert num_envs % ndev == 0, (num_envs, ndev)
    ppo = PPO(env, cfg, axis_name=ENV_AXIS, num_devices=ndev)

    def build(ts, es):
        ts_specs = _specs_for(ts, num_envs)
        es_specs = _specs_for(es, num_envs)
        fn = jax.shard_map(
            ppo.train_iteration,
            mesh=mesh,
            in_specs=(ts_specs, es_specs),
            out_specs=(ts_specs, es_specs, P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0, 1))

    return ppo, build
