"""Solo12 rough-terrain CaT task (BASELINE.json config #3).

The reference repo ships only the flat task; its rough capability comes from
Isaac Lab's velocity-rough recipe (heightfield terrains + height-scan
observation + terrain-level curriculum). This task composes the same pieces
TPU-natively: procedural heightfield patches graded by difficulty row
(sim/terrain.py), a 187-point yaw-aligned height scan appended to the policy
observation, and promote/demote spawning curriculum on episode outcome.
"""

from __future__ import annotations

import dataclasses

from cat_tpu.envs.env import CatEnv, EnvCfg, HeightScanCfg, NoiseCfg
from cat_tpu.models.solo12 import (
    SOLO12_ACTUATED_JOINT_ORDER, SOLO12_KD, SOLO12_KP, solo12_model,
)
from cat_tpu.sim import terrain as terrain_mod
from cat_tpu.tasks.solo12_flat import solo12_constraint_terms


def make_env(num_envs: int = 4096, play: bool = False,
             rows: int = 10, cols: int = 8, seed: int = 0,
             overrides: tuple = ()) -> CatEnv:
    from cat_tpu.utils.overrides import apply_overrides

    model = solo12_model()
    terr = terrain_mod.generate_rough(rows=rows, cols=cols, seed=seed)
    cfg = EnvCfg(
        num_envs=(50 if play else num_envs),
        kp=SOLO12_KP, kd=SOLO12_KD,
        terrain=terr,
        height_scan=HeightScanCfg(),
        terrain_curriculum=True,
    )
    if play:
        cfg = dataclasses.replace(cfg, noise=NoiseCfg(enabled=False))
    cfg = apply_overrides(cfg, overrides)
    return CatEnv(
        model=model,
        cfg=cfg,
        constraint_terms=solo12_constraint_terms(model),
        actuated_joint_order=SOLO12_ACTUATED_JOINT_ORDER,
        illegal_contact_bodies=("base_link", ".*_UPPER_LEG"),
    )
