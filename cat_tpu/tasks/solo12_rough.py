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
    """Flat constraint table with two rough-terrain adaptations.

    1. Orientation relax: the flat recipe's base_orientation limit 0.1
       (|g_xy|, ~5.7 deg) assumes a level base on a level floor; on graded
       terrain the base legitimately pitches with the slope (a 0.25-grade
       ramp alone is 14 deg), so the soft limit widens to 0.3 (~17.5 deg) —
       the Isaac Lab rough recipe drops its flat_orientation term entirely
       for the same reason.
    2. Frozen soft budget: every curriculum-annealed term keeps its
       INITIAL max_p 0.05 instead of annealing to 0.25 (reference
       curriculums.py:21-41 pacing, kept for the flat task's parity). The
       round-5 causal control (runs/solo12_rough_r5/ANALYSIS.md) shows
       attained terrain difficulty is style-budget-bound: under ANY anneal
       that completes, the terrain level peaks when the style max_p passes
       ~0.08 and then collapses as the budget tightens — while the style
       violation rates themselves never improve (two_foot ~83%, air_time
       ~21% regardless of budget); tightening buys terminations, not
       compliance, on terrain. Freezing the budget at 0.05 (the exact
       config of the control run) lets the curriculum keep climbing past
       the annealed recipes' peak at equal episode length and fewer falls.
       Rough has no reference recipe to be parity-bound to.
    """
    terms = []
    for t in solo12_constraint_terms(model):
        if t.name == "base_orientation":
            t = t._replace(params=dict(t.params, limit=0.3))
        if t.curriculum:
            t = t._replace(max_p=0.05, curriculum=False)
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
        # constraint-budget anneal is OFF for rough (every term has
        # curriculum=False after rough_constraint_terms) — see that
        # function's docstring; curriculum_steps is inert here. History:
        # r4 stretched the anneal 4x (24*4000) after measuring that flat
        # pacing demotes terrain levels 2.3 -> 0.45; the r5 full-budget
        # run + frozen-budget control showed ANY completing anneal
        # eventually collapses the attained level, so the anneal itself
        # was retired for this task.
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
