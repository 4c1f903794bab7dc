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

from cat_tpu.envs.env import (
    CatEnv, EnvCfg, HeightScanCfg, NoiseCfg, TerminationsCfg,
)
from cat_tpu.models.solo12 import (
    SOLO12_ACTUATED_JOINT_ORDER, SOLO12_KD, SOLO12_KP, solo12_model,
)
from cat_tpu.sim import terrain as terrain_mod
from cat_tpu.tasks.solo12_flat import solo12_constraint_terms


def rough_constraint_terms(model):
    """Flat constraint table with rough-terrain orientation relaxation.

    The flat recipe's base_orientation limit 0.1 (|g_xy|, ~5.7 deg) assumes
    a level base on a level floor; on graded terrain the base legitimately
    pitches with the slope (a 0.25-grade ramp alone is 14 deg), so the soft
    limit widens to 0.3 (~17.5 deg) — the Isaac Lab rough recipe drops its
    flat_orientation term entirely for the same reason.
    """
    terms = []
    for t in solo12_constraint_terms(model):
        if t.name == "base_orientation":
            t = t._replace(params=dict(t.params, limit=0.3))
        terms.append(t)
    return terms


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
        # style-constraint anneal stretched 4x vs the flat recipe: the
        # measured A/B (runs/solo12_rough_r4/ANALYSIS.md) shows the flat
        # pacing's post-anneal style budget triples falls on terrain and
        # demotes terrain levels 2.3 -> 0.45, while this pacing keeps
        # climbing past level 4.5. The flat task keeps reference pacing
        # (parity); rough has no reference recipe and takes the better
        # setting as default.
        curriculum_steps=24 * 4000,
        # The flat task's upside_down kill at |g_xy| > 0.1 (5.7 deg tilt,
        # cat_flat_env_cfg.py:372-377) is unlearnable on slopes/noise (the
        # r3 smoke died at ep_len ~9 of 500 from it); rough keeps the
        # termination as a true fall detector at 0.7 (~44 deg) — Isaac
        # Lab's rough velocity recipe terminates on base contact only.
        terminations=TerminationsCfg(upside_down_limit=0.7),
    )
    if play:
        cfg = dataclasses.replace(cfg, noise=NoiseCfg(enabled=False))
    cfg = apply_overrides(cfg, overrides)
    return CatEnv(
        model=model,
        cfg=cfg,
        constraint_terms=rough_constraint_terms(model),
        actuated_joint_order=SOLO12_ACTUATED_JOINT_ORDER,
        illegal_contact_bodies=("base_link", ".*_UPPER_LEG"),
    )
