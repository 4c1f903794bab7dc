"""Trot-emergence ablation campaign (VERDICT r3 next-step #2).

The reference recipe's `two_foot_contact` style constraint
(cat_flat_env_cfg.py:348-355) exists to shape a two-beat trot at speed; the
r3 flagship violated it on ~83% of steps at every curriculum stage (>= 3
feet always down). This campaign trains the flat recipe under one-factor
ablations of the mechanisms that could block the gait, then measures the
actual footfall pattern with a forced-command gait probe:

  base          the shipped recipe, unchanged (control)
  tf_static     two_foot max_p fixed at 0.25 from step 0 (no 0.05->0.25
                anneal: is the curriculum pacing too slow to matter?)
  tf_hard       two_foot max_p 1.0 (ceiling of the mechanism: can ANY
                pressure level force the gait?)
  pgs10         10 PGS sweeps instead of 5 (solver-stiffness hypothesis:
                mushy contacts may make 2-foot balance infeasible)
  kp8           Kp 8 / Kd 0.3 (tracking-fidelity hypothesis: Kp=4 tracks
                the action targets loosely)
  mu_high       friction U(1.0, 1.25) (slip hypothesis: low-mu envs may
                make 2-foot stances fall, dragging the whole policy)

Gait probe: noise/push-free rollout at forced command (0.8, 0, 0) m/s;
reports feet-down histogram, two-foot satisfaction, the fraction of 2-foot
stances that are DIAGONAL pairs (the trot signature), duty factor, and
commanded-velocity tracking.

Writes runs/trot/ablation.json. Usage:
  python tools/trot_ablation.py [iters=1000] [num_envs=4096] [variants...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

PROBE_STEPS = 250          # 5 s at 50 Hz
PROBE_ENVS = 256
FINAL_WINDOW = 50          # final metric averaging window (iterations)


def build_env(variant: str, num_envs: int, probe: bool = False):
    from cat_tpu.envs.env import CatEnv, CommandsCfg, EnvCfg, EventsCfg, NoiseCfg
    from cat_tpu.models.solo12 import (
        SOLO12_ACTUATED_JOINT_ORDER, SOLO12_KD, SOLO12_KP, solo12_model,
    )
    from cat_tpu.tasks.solo12_flat import solo12_constraint_terms

    model = solo12_model()
    terms = solo12_constraint_terms(model)
    kp, kd = SOLO12_KP, SOLO12_KD
    solver_iterations = None
    events = EventsCfg()

    if variant == "tf06":
        # round-5 gait-purity x DR experiment (VERDICT r4 next-step #7):
        # keep the FULL friction DR but anneal the two_foot style pressure
        # to a 0.6 ceiling (vs the recipe's 0.25) — the r4 campaign showed
        # max_p=1.0 static forces a 99.3% trot but only with the DR floor
        # raised; this asks whether a stronger ANNEALED ceiling gets
        # diagonal purity at speed under full mu U(0.5, 1.25).
        terms = [t._replace(max_p=0.6) if t.name == "two_foot_contact"
                 else t for t in terms]
    elif variant == "tf04":
        terms = [t._replace(max_p=0.4) if t.name == "two_foot_contact"
                 else t for t in terms]
    elif variant == "tf_static":
        terms = [t._replace(curriculum=False) if t.name == "two_foot_contact"
                 else t for t in terms]
    elif variant == "tf_hard":
        terms = [t._replace(curriculum=False, max_p=1.0)
                 if t.name == "two_foot_contact" else t for t in terms]
    elif variant == "pgs10":
        solver_iterations = 10
    elif variant == "kp8":
        kp, kd = 8.0, 0.3
    elif variant == "mu_high":
        events = dataclasses.replace(events, friction_range=(1.0, 1.25))
    elif variant != "base":
        raise KeyError(variant)

    cfg = EnvCfg(
        num_envs=num_envs, kp=kp, kd=kd,
        solver_iterations=solver_iterations, events=events,
    )
    if probe:
        # forced-command, noise/push-free measurement config
        cfg = dataclasses.replace(
            cfg,
            noise=NoiseCfg(enabled=False),
            events=dataclasses.replace(events, push_enabled=False),
            commands=CommandsCfg(
                lin_vel_x=(0.8, 0.8), lin_vel_y=(0.0, 0.0),
                ang_vel_z=(0.0, 0.0), rel_standing_envs=0.0,
            ),
        )
    return CatEnv(model, cfg, terms, SOLO12_ACTUATED_JOINT_ORDER)


def train(env, num_envs: int, iters: int, seed: int = 1):
    from cat_tpu.rl.ppo import PPO, PpoCfg

    cfg = PpoCfg(num_iterations=iters)
    ppo = PPO(env, cfg)
    es = env.init(jax.random.PRNGKey(seed), num_envs)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(seed + 0x5EED), es, first_obs)
    fn = jax.jit(ppo.train_iteration, donate_argnums=(0, 1))
    keep = (
        "Train/mean_reward_per_step", "Episode/length",
        "Episode_Constraint_violation/cstr_two_foot_contact",
        "Episode_Constraint_violation/cstr_air_time",
        "Episode_Constraint_violation/cstr_foot_contact_force",
        "Curriculum/two_foot_contact_max_p",
    )
    hist = {k: [] for k in keep}
    t0 = time.time()
    for it in range(1, iters + 1):
        ts, es, metrics = fn(ts, es)
        if it % 5 == 0 or it == iters:
            m = jax.device_get({k: metrics[k] for k in keep if k in metrics})
            for k, v in m.items():
                hist[k].append(float(v))
    dt = time.time() - t0
    final = {k: float(np.mean(v[-FINAL_WINDOW // 5:])) if v else None
             for k, v in hist.items()}
    final["train_seconds"] = round(dt, 1)
    final["env_steps_per_sec"] = round(iters * cfg.num_steps * num_envs / dt)
    return ts, final


def gait_probe(variant: str, ts):
    """Forced-command rollout; footfall statistics from contact forces."""
    env = build_env(variant, PROBE_ENVS, probe=True)
    from cat_tpu.rl.normalize import rms_normalize
    from cat_tpu.rl.ppo import PPO, PpoCfg

    ppo = PPO(env, PpoCfg())
    es = env.init(jax.random.PRNGKey(0), PROBE_ENVS)
    first_obs = jax.jit(env.observe)(es)

    foot_ids = jnp.asarray(env.model.foot_report_ids)

    @jax.jit
    def rollout(ts, es, obs):
        def one(carry, _):
            es, obs = carry
            mean, _, _ = ppo.net.apply(ts.params, rms_normalize(ts.obs_rms, obs))
            es, obs, reward, dones, _ = env.step(es, mean)
            nr = env.model.nreport
            f = es.sim.forces.reshape(PROBE_ENVS, nr, 3)[:, foot_ids, :]
            down = jnp.linalg.norm(f, axis=-1) > 1.0       # (N, 4)
            # spawns have random yaw, so track planar SPEED vs the 0.8 m/s
            # forward command, not world vx
            speed = jnp.mean(jnp.linalg.norm(es.sim.qvel[:, 0:2], axis=1))
            return (es, obs), (down, speed, jnp.mean(reward))
        (es, obs), (down, speed, rew) = jax.lax.scan(
            one, (es, obs), None, length=PROBE_STEPS
        )
        return down, speed, rew

    down, vx, rew = jax.device_get(rollout(ts, es, first_obs))
    # skip the first second (transient from reset)
    down = down[50:]                        # (T, N, 4)
    # derive pair indices from the model's actual foot slot NAMES (the
    # order is FL, FR, HL, HR for Solo12 — hardcoded index math silently
    # measured lateral pairs in the first draft)
    names = [env.model.report_names[i] for i in env.model.foot_report_ids]
    idx = {n.split("_")[0]: i for i, n in enumerate(names)}
    pairs = {
        "diag": (({idx["FL"], idx["HR"]}), ({idx["FR"], idx["HL"]})),
        "lateral": (({idx["FL"], idx["HL"]}), ({idx["FR"], idx["HR"]})),
        "frontback": (({idx["FL"], idx["FR"]}), ({idx["HL"], idx["HR"]})),
    }
    nfeet = down.sum(-1)                    # (T, N)
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

    return {
        "feet_order": names,
        "feet_down_hist": hist,
        "two_foot_satisfaction": hist[2],
        "pair_frac_given_two": {k: pair_frac(v) for k, v in pairs.items()},
        "duty_factor": float(down.mean()),
        "mean_speed": float(vx[50:].mean()),   # planar speed vs 0.8 cmd
        "mean_reward": float(rew[50:].mean()),
    }


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    variants = sys.argv[3:] or [
        "base", "tf_static", "tf_hard", "pgs10", "kp8", "mu_high",
    ]
    out_path = "runs/trot/ablation.json"
    os.makedirs("runs/trot", exist_ok=True)
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path)).get("variants", {})
    for v in variants:
        # "variant@seed" runs a seed replicate (VERDICT r4 next-step #4)
        name, _, seed_s = v.partition("@")
        seed = int(seed_s) if seed_s else 1
        print(f"=== variant {name} seed {seed} ({iters} iters, "
              f"{num_envs} envs) ===", flush=True)
        env = build_env(name, num_envs)
        ts, final = train(env, num_envs, iters, seed=seed)
        gait = gait_probe(name, ts)
        results[v] = {"train_final": final, "gait_probe": gait}
        print(json.dumps(results[v], indent=1), flush=True)
        with open(out_path, "w") as f:
            json.dump(
                {"iters": iters, "num_envs": num_envs,
                 "probe": {"steps": PROBE_STEPS, "envs": PROBE_ENVS,
                           "command": [0.8, 0.0, 0.0]},
                 "variants": results},
                f, indent=1,
            )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
