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

    @jax.jit
    def act(ts, obs):
        mean, _, _ = ppo.net.apply(ts.params, obs)
        return mean

    @jax.jit
    def step(es, a):
        return env.step(es, a)

    from cat_tpu.rl.normalize import rms_normalize
    obs = first_obs
    traj = []
    rews = []
    for _ in range(args.steps):
        a = act(ts, rms_normalize(ts.obs_rms, obs))
        es, obs, reward, dones, _ = step(es, a)
        traj.append(np.asarray(es.sim.qpos))
        rews.append(float(reward.mean()))
    np.savez_compressed(
        os.path.join(out_dir, "play_traj.npz"),
        qpos=np.stack(traj), reward=np.array(rews),
    )
    print(f"mean reward/step {np.mean(rews):.4f}; "
          f"trajectory saved to {out_dir}/play_traj.npz")


if __name__ == "__main__":
    main()
