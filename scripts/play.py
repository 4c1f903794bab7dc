"""Roll out a trained policy and export deployable artifacts
(replaces reference scripts/clean_rl/play.py:69-147).

Loads the newest checkpoint of a run, plays the PLAY env variant (50 envs,
noise off) deterministically, logs qpos trajectories to .npz for offline
visualization, and exports the policy (obs normalizer folded in) as a
pure-numpy parameter bundle + ONNX when torch is available.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="Solo12-CaT-Flat-Play-v0")
    p.add_argument("--run_dir", required=True,
                   help="run directory containing ckpt_*.pkl")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--num_envs", type=int, default=50)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cat_tpu.rl import checkpoint as ckpt
    from cat_tpu.rl.export import export_policy
    from cat_tpu.rl.ppo import PPO
    from cat_tpu.tasks import registry

    spec = registry.get(args.task)
    env = spec.make_env(num_envs=args.num_envs)
    cfg = spec.make_agent_cfg()
    ppo = PPO(env, cfg)

    es = env.init(jax.random.PRNGKey(0), args.num_envs)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, first_obs)
    path = ckpt.latest(args.run_dir)
    # non-strict: the training run's env count differs from the play env's;
    # only the env-size-independent leaves (params, normalizers) are loaded
    ts, _ = ckpt.restore(path, ts, es, strict=False)
    print(f"loaded {path}")

    out_dir = args.out or args.run_dir
    export_policy(ppo, ts, out_dir)

    from cat_tpu.rl.normalize import rms_normalize

    # lax.scan rollout: ONE dispatch for the whole playback (~1 ms/dispatch
    # on tunneled rigs makes a host loop needlessly slow) and it exercises
    # the same scanned code path the trainer and the export smoke use.
    @jax.jit
    def rollout(ts, es, obs):
        def one(carry, _):
            es, obs = carry
            mean, _, _ = ppo.net.apply(ts.params, rms_normalize(ts.obs_rms, obs))
            es, obs, reward, _, _ = env.step(es, mean)
            return (es, obs), (es.sim.qpos, jnp.mean(reward))
        (es, obs), (qpos, rew) = jax.lax.scan(
            one, (es, obs), None, length=args.steps
        )
        return qpos, rew

    qpos, rews = jax.device_get(rollout(ts, es, first_obs))
    np.savez_compressed(
        os.path.join(out_dir, "play_traj.npz"),
        qpos=qpos, reward=rews,
    )
    print(f"mean reward/step {float(np.mean(rews)):.4f}; "
          f"trajectory saved to {out_dir}/play_traj.npz")


if __name__ == "__main__":
    main()
