"""Benchmark harness: env-steps/sec/chip on the flagship CaT training loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): env steps/sec/chip at 4096 envs. The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
reported against this repo's own round-1 measured figure (BENCH_r01.json:
74,829 env-steps/s on one TPU chip, pre-lanes pre-self-collision engine) —
progress must show up as vs_baseline > 1 with the HARDER current physics
(36 contact candidates incl. self-collision vs 28 then).
"""

import json
import os
import sys
import time

# Real chip: let the preset platform (TPU) stand; only force CPU if nothing set.
os.environ.setdefault("JAX_PLATFORMS", "")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Measured baseline: this repo's round-1 number on the same chip/config
# (BENCH_r01.json), not an invented GPU figure.
BASELINE_R1_STEPS_PER_SEC = 74_829.0


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters_warm = 2
    iters_meas = int(os.environ.get("BENCH_ITERS", 5))
    task = os.environ.get("BENCH_TASK", "flat")  # flat | rough

    from cat_tpu.rl.ppo import PPO, PpoCfg

    if task == "rough":
        from cat_tpu.tasks.solo12_rough import make_env
    else:
        from cat_tpu.tasks.solo12_flat import make_env

    env = make_env(num_envs=num_envs)
    cfg = PpoCfg()
    ppo = PPO(env, cfg)

    es = env.init(jax.random.PRNGKey(0), num_envs)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, first_obs)

    train_fn = jax.jit(ppo.train_iteration, donate_argnums=(0, 1))

    for _ in range(iters_warm):
        ts, es, metrics = train_fn(ts, es)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(iters_meas):
        ts, es, metrics = train_fn(ts, es)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    env_steps = iters_meas * cfg.num_steps * num_envs
    sps = env_steps / dt
    rec = {
        "metric": (
            "env_steps_per_sec_per_chip_4096envs_full_ppo"
            if task == "flat"
            else f"env_steps_per_sec_per_chip_{task}_full_ppo"
        ),
        "value": round(sps, 1),
        "unit": "env_steps/s",
    }
    if task == "flat":
        # the r1 anchor is a FLAT-task number; a cross-task ratio would be
        # misleading, so rough benches report the raw value only
        rec["vs_baseline"] = round(sps / BASELINE_R1_STEPS_PER_SEC, 3)
        # which anchor the ratio used (vs_baseline semantics changed
        # in r3 from an invented GPU figure to the measured r1 number)
        rec["baseline"] = f"BENCH_r01:{BASELINE_R1_STEPS_PER_SEC:.0f}"
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
