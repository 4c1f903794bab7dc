"""Task registry: task id -> env builder + agent config.

Replaces the reference's gym.register indirection
(solo12/__init__.py:16-39: `Isaac-Velocity-CaT-Flat-Solo12-v0` / `-Play-v0`
with per-backend agent cfg entry points).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple


class TaskSpec(NamedTuple):
    make_env: Callable  # (num_envs:int) -> CatEnv
    make_agent_cfg: Callable  # () -> PpoCfg
    description: str


_REGISTRY: Dict[str, TaskSpec] = {}


def register(name: str, spec: TaskSpec):
    _REGISTRY[name] = spec


def get(name: str) -> TaskSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown task {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_tasks() -> Dict[str, TaskSpec]:
    return dict(_REGISTRY)


def _register_builtin():
    from cat_tpu.rl.ppo import PpoCfg
    from cat_tpu.tasks import solo12_flat

    register(
        "Solo12-CaT-Flat-v0",
        TaskSpec(
            make_env=lambda num_envs=4096, **kw: solo12_flat.make_env(
                num_envs, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Solo12 flat-terrain CaT velocity tracking (train)",
        ),
    )
    from cat_tpu.tasks import solo12_rough

    register(
        "Solo12-CaT-Rough-v0",
        TaskSpec(
            make_env=lambda num_envs=4096, **kw: solo12_rough.make_env(
                num_envs, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Solo12 rough-terrain CaT (heightfield + height scan"
                        " + terrain curriculum)",
        ),
    )
    register(
        "Solo12-CaT-Rough-Play-v0",
        TaskSpec(
            make_env=lambda num_envs=50, **kw: solo12_rough.make_env(
                num_envs, play=True, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Solo12 rough-terrain CaT (50 envs, no noise)",
        ),
    )
    register(
        "Solo12-CaT-Flat-Play-v0",
        TaskSpec(
            make_env=lambda num_envs=50, **kw: solo12_flat.make_env(
                num_envs, play=True, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Solo12 flat-terrain CaT (50 envs, no noise)",
        ),
    )
    from cat_tpu.tasks import go2_flat

    register(
        "Go2-CaT-Flat-v0",
        TaskSpec(
            make_env=lambda num_envs=4096, **kw: go2_flat.make_env(
                num_envs, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Go2-class quadruped flat-terrain CaT (train)",
        ),
    )
    register(
        "Go2-CaT-Flat-Play-v0",
        TaskSpec(
            make_env=lambda num_envs=50, **kw: go2_flat.make_env(
                num_envs, play=True, **kw
            ),
            make_agent_cfg=PpoCfg,
            description="Go2-class quadruped flat-terrain CaT (50 envs, no noise)",
        ),
    )


_register_builtin()
