"""Multi-host bootstrap: jax.distributed + per-host state construction.

TPU-native replacement for the reference's multi-GPU rank plumbing
(scripts/rl_games/train.py:100-107: per-rank device + seed offset;
utils/skrl/ppo.py:126-131: param broadcast — here params are replicated by
the sharding, so no explicit broadcast is needed).

Usage (same program on every host):

    dist = maybe_initialize(seed)        # no-op unless configured
    mesh = make_global_mesh()            # spans all processes' devices
    es_local = env.init(key(dist.seed), local_envs)      # per-host shard
    es = host_local_to_global(mesh, es_local, num_envs)  # global arrays

Configuration comes from flags or the standard JAX env vars
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — also set by
TPU pod runtimes automatically, in which case initialize() needs no args).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


@dataclasses.dataclass(frozen=True)
class DistContext:
    process_id: int
    num_processes: int
    seed: int            # base seed + process_id (rl_games train.py:106)
    is_host0: bool


def maybe_initialize(
    seed: int,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistContext:
    """Initialize jax.distributed when multi-host is configured; else no-op.

    Per-rank seed offset mirrors the reference (rl_games/train.py:106:
    `args_cli.seed += app_launcher.global_rank`).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is not None and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    pid = jax.process_index()
    nproc = jax.process_count()
    return DistContext(
        process_id=pid,
        num_processes=nproc,
        seed=seed + pid,
        is_host0=(pid == 0),
    )


def make_global_mesh(devices=None) -> Mesh:
    """One 'env' axis over every device of every process (ICI + DCN)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (ENV_AXIS,))


def local_env_count(num_envs: int) -> int:
    n = jax.process_count()
    assert num_envs % n == 0, (num_envs, n)
    return num_envs // n


def host_local_to_global(mesh: Mesh, tree, num_envs: int):
    """Assemble global sharded arrays from each host's LOCAL env shard.

    Leaves with leading dim == local env count are concatenated along the
    env axis across processes; everything else (params, counters, running
    stats) must be identical on every host and is replicated.
    """
    from cat_tpu.parallel.mesh import _specs_for

    n_local = num_envs // jax.process_count()
    # structure-aware specs (TrainState params etc. replicated by NAME, so a
    # parameter whose width happens to equal the env count is not sharded)
    specs = _specs_for(tree, n_local)

    def place(x, s):
        x = np.asarray(x)
        if s == P(ENV_AXIS):
            sharding = NamedSharding(mesh, P(ENV_AXIS))
            global_shape = (num_envs,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape
        )

    return jax.tree.map(place, tree, specs)
