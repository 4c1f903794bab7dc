"""Forced-command gait probe ON TERRAIN for a trained rough policy.

Closes the gap noted in runs/solo12_rough_r4/ANALYSIS.md: the flat-task
campaign (runs/trot/) established that the training-time two_foot metric
is not a gait readout, but no footfall measurement had been taken on the
heightfield. Same statistics as tools/trot_ablation.gait_probe (feet-down
histogram, pair types from foot-slot names, duty factor, speed), on the
rough env with noise/pushes off and command forced to (0.8, 0, 0).

Usage: python tools/rough_gait_probe.py <ckpt_path> [out_json]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

PROBE_STEPS = 250
PROBE_ENVS = 256


def main():
    ckpt_path = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 else \
        "runs/solo12_rough_r4/gait_probe.json"

    from cat_tpu.envs.env import CommandsCfg, EventsCfg, NoiseCfg
    from cat_tpu.rl import checkpoint as ckpt
    from cat_tpu.rl.normalize import rms_normalize
    from cat_tpu.rl.ppo import PPO, PpoCfg
    from cat_tpu.tasks import solo12_rough

    env = solo12_rough.make_env(
        num_envs=PROBE_ENVS,
        overrides=(
            "noise.enabled=False",
            "events.push_enabled=False",
            "commands.lin_vel_x=(0.8,0.8)",
            "commands.lin_vel_y=(0.0,0.0)",
            "commands.ang_vel_z=(0.0,0.0)",
            "commands.rel_standing_envs=0.0",
        ),
    )
    ppo = PPO(env, PpoCfg())
    es = env.init(jax.random.PRNGKey(0), PROBE_ENVS)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, first_obs)
    ts, _ = ckpt.restore(ckpt_path, ts, es, strict=False)
    print(f"loaded {ckpt_path}")

    foot_ids = jnp.asarray(env.model.foot_report_ids)

    @jax.jit
    def rollout(ts, es, obs):
        def one(carry, _):
            es, obs = carry
            mean, _, _ = ppo.net.apply(ts.params,
                                       rms_normalize(ts.obs_rms, obs))
            es, obs, reward, dones, _ = env.step(es, mean)
            nr = env.model.nreport
            f = es.sim.forces.reshape(PROBE_ENVS, nr, 3)[:, foot_ids, :]
            down = jnp.linalg.norm(f, axis=-1) > 1.0
            speed = jnp.mean(jnp.linalg.norm(es.sim.qvel[:, 0:2], axis=1))
            return (es, obs), (down, speed, jnp.mean(reward))
        (es, obs), outs = jax.lax.scan(one, (es, obs), None,
                                       length=PROBE_STEPS)
        return outs

    down, speed, rew = jax.device_get(rollout(ts, es, first_obs))
    down = down[50:]
    names = [env.model.report_names[i] for i in env.model.foot_report_ids]
    idx = {n.split("_")[0]: i for i, n in enumerate(names)}
    pairs = {
        "diag": ({idx["FL"], idx["HR"]}, {idx["FR"], idx["HL"]}),
        "lateral": ({idx["FL"], idx["HL"]}, {idx["FR"], idx["HR"]}),
        "frontback": ({idx["FL"], idx["FR"]}, {idx["HL"], idx["HR"]}),
    }
    nfeet = down.sum(-1)
    hist = [float((nfeet == k).mean()) for k in range(5)]
    two = nfeet == 2

    def pair_frac(pair_sets):
        hit = np.zeros(two.shape, dtype=bool)
        for s in pair_sets:
            m = np.ones(two.shape, dtype=bool)
            for f in range(4):
                m &= down[..., f] if f in s else ~down[..., f]
            hit |= m
        return float(hit.sum() / max(two.sum(), 1))

    out = {
        "ckpt": ckpt_path,
        "feet_order": names,
        "feet_down_hist": hist,
        "two_foot_satisfaction": hist[2],
        "pair_frac_given_two": {k: pair_frac(v) for k, v in pairs.items()},
        "duty_factor": float(down.mean()),
        "mean_speed": float(speed[50:].mean()),
        "mean_reward": float(rew[50:].mean()),
        "probe": {"steps": PROBE_STEPS, "envs": PROBE_ENVS,
                  "command": [0.8, 0.0, 0.0], "terrain": "rough default"},
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
