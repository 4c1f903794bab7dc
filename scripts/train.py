"""Train a CaT policy (replaces reference scripts/clean_rl/train.py).

Usage:
  python scripts/train.py --task Solo12-CaT-Flat-v0 --num_envs 4096 \
      --seed 1 --max_iterations 2000 [--logdir logs] [--override k=v ...]

Multi-chip: shards the env batch over all visible devices automatically
(mesh axis 'env'); set --single_chip to pin to one device.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="Solo12-CaT-Flat-v0")
    p.add_argument(
        "--agent", default="clean_rl",
        choices=["clean_rl", "rl_games", "skrl"],
        help="RL backend recipe (reference solo12/__init__.py:20-25 "
             "registers one agent cfg per backend)",
    )
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--logdir", default="logs")
    p.add_argument("--run_name", default=None)
    p.add_argument("--single_chip", action="store_true")
    p.add_argument("--checkpoint", default=None, help="resume path")
    p.add_argument(
        "--writer", default="tensorboard",
        choices=["tensorboard", "wandb", "none"],
        help="metric writer on top of JSONL (reference cleanrl/ppo.py:127-138"
             " TB-or-W&B switch)",
    )
    p.add_argument(
        "--override", nargs="*", default=[],
        help="agent cfg overrides key=value (e.g. learning_rate=1e-4)",
    )
    p.add_argument(
        "--env_override", nargs="*", default=[],
        help="env cfg dotted-path overrides (e.g. events.push_enabled=False"
             " commands.lin_vel_x='(-0.5,1.0)')",
    )
    # multi-host bootstrap (reference rl_games/train.py:100-107 rank setup);
    # also configurable via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID env vars (or nothing, on TPU pod runtimes)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from cat_tpu.parallel import distributed as pdist

    dist = pdist.maybe_initialize(
        args.seed, args.coordinator, args.num_processes, args.process_id
    )

    import numpy as np

    from cat_tpu.parallel import mesh as pmesh
    from cat_tpu.rl import checkpoint as ckpt
    from cat_tpu.tasks import registry
    from cat_tpu.utils.logging import MetricLogger

    spec = registry.get(args.task)
    if args.agent == "clean_rl":
        agent_cfg = spec.make_agent_cfg()
    else:
        from cat_tpu.rl import agent_cfgs

        kw = {"num_envs": args.num_envs or 4096} if args.agent == "skrl" else {}
        agent_cfg = agent_cfgs.get(args.agent, **kw)
    from cat_tpu.utils.overrides import apply_overrides

    agent_cfg = apply_overrides(agent_cfg, args.override)
    if args.max_iterations:
        agent_cfg = dataclasses.replace(
            agent_cfg, num_iterations=args.max_iterations
        )

    devices = jax.devices()[:1] if args.single_chip else jax.devices()
    mesh = pmesh.make_mesh(devices)
    num_envs = args.num_envs or 4096
    assert num_envs % mesh.size == 0
    env = spec.make_env(num_envs=num_envs,
                        overrides=tuple(args.env_override))
    # startup constraint table (reference constraint_manager.py:153-184)
    print(env.cset.table())

    run_name = args.run_name or time.strftime("%Y-%m-%d_%H-%M-%S")
    run_path = os.path.join(args.logdir, args.agent, args.task, run_name)
    def _json_default(o):
        # terrain cfgs embed numpy arrays (the heightfield grid): summarize
        # instead of dumping megabytes of grid data into config.json
        if isinstance(o, np.ndarray):
            return {"ndarray_shape": list(o.shape), "dtype": str(o.dtype)}
        if isinstance(o, (np.integer, np.floating)):
            return o.item()
        return str(o)

    if dist.is_host0:
        os.makedirs(run_path, exist_ok=True)
        with open(os.path.join(run_path, "config.json"), "w") as f:
            json.dump(
                {"task": args.task, "agent": args.agent,
                 "num_envs": num_envs, "seed": args.seed,
                 "agent_cfg": dataclasses.asdict(agent_cfg),
                 "env_cfg": dataclasses.asdict(env.cfg),
                 "devices": mesh.size,
                 "processes": dist.num_processes},
                f, indent=1, default=_json_default,
            )
    logger = (
        MetricLogger(run_path, writer=args.writer) if dist.is_host0 else None
    )

    ppo, build = pmesh.make_train_fn(env, agent_cfg, mesh)
    if dist.num_processes > 1:
        # per-host env shard with rank-offset seed (env decorrelation);
        # params from the BASE seed so every host initializes identically
        # (the implicit broadcast, skrl/ppo.py:126-131)
        n_local = pdist.local_env_count(num_envs)
        es = env.init(jax.random.PRNGKey(dist.seed), n_local)
        first_obs = jax.jit(env.observe)(es)
        ts = ppo.init(jax.random.PRNGKey(args.seed + 0x5EED), es, first_obs)
        if args.checkpoint:
            ts, es = ckpt.restore_local_shard(args.checkpoint, ts, es,
                                              dist.process_id,
                                              dist.num_processes)
            print(f"resumed from {args.checkpoint} "
                  f"at iter {int(np.asarray(ts.iteration))}")
        ts = pdist.host_local_to_global(mesh, ts, num_envs)
        es = pdist.host_local_to_global(mesh, es, num_envs)
    else:
        key = jax.random.PRNGKey(args.seed)
        k_env, k_ppo = jax.random.split(key)
        es = env.init(k_env, num_envs)
        first_obs = jax.jit(env.observe)(es)
        ts = ppo.init(k_ppo, es, first_obs)
        if args.checkpoint:
            ts, es = ckpt.restore(args.checkpoint, ts, es)
            print(f"resumed from {args.checkpoint} at iter {int(ts.iteration)}")
        ts = pmesh.shard_states(mesh, ts, num_envs)
        es = pmesh.shard_states(mesh, es, num_envs)
    train_fn = build(ts, es)

    print(f"training {args.task}: {num_envs} envs on {mesh.size} chip(s), "
          f"{agent_cfg.num_iterations} iterations")
    steps_per_iter = agent_cfg.num_steps * num_envs
    t_start = time.time()
    start_iter = int(ts.iteration)
    last_ckpt = args.checkpoint
    for it in range(start_iter + 1, agent_cfg.num_iterations + 1):
        t0 = time.perf_counter()
        ts, es, metrics = train_fn(ts, es)
        metrics = jax.device_get(metrics)
        dt = time.perf_counter() - t0
        # NaN/divergence guard: a physics or SGD blow-up must not silently
        # poison the params (the reference at least dies visibly; we abort
        # with the resume command for the last good checkpoint).
        loss_val = float(metrics["Loss/mean_surrogate_loss"])
        if not (np.isfinite(loss_val)
                and np.isfinite(metrics["Train/mean_reward_per_step"])):
            bad = ckpt.save(os.path.join(run_path, f"ckpt_diverged_{it}"),
                            ts, es, write=dist.is_host0)
            print(f"FATAL: non-finite loss at iteration {it} "
                  f"(loss={loss_val}); diverged state dumped to {bad}.")
            if last_ckpt:
                print(f"resume from the last good checkpoint with:\n"
                      f"  --checkpoint {last_ckpt}")
            sys.exit(1)
        metrics["Perf/env_steps_per_sec"] = steps_per_iter / dt
        metrics["Perf/iter_seconds"] = dt
        if logger is not None:
            logger.log(metrics, it)
        if dist.is_host0 and (it % 10 == 0 or it == 1):
            print(
                f"iter {it:5d} | {steps_per_iter / dt:9.0f} steps/s | "
                f"rew/step {metrics['Train/mean_reward_per_step']:.4f} | "
                f"ep_len {metrics.get('Episode/length', 0):.0f} | "
                f"loss {metrics['Loss/mean_surrogate_loss']:.4f}"
            )
        if it % agent_cfg.save_interval == 0:
            path = ckpt.save(os.path.join(run_path, f"ckpt_{it}"), ts, es,
                             write=dist.is_host0)
            last_ckpt = path
            if dist.is_host0:
                print(f"saved {path}")
    ckpt.save(os.path.join(run_path, "ckpt_final"), ts, es,
              write=dist.is_host0)
    if dist.is_host0:
        print(f"done in {time.time() - t_start:.0f}s; logs at {run_path}")


if __name__ == "__main__":
    main()
