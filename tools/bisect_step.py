"""Bisect env.step cost by timing jitted sub-pipelines of the step.

Usage: python tools/bisect_step.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.tasks.solo12_flat import make_env

    env = make_env(num_envs=N)
    es = env.init(jax.random.PRNGKey(0), N)
    a = jnp.zeros((N, 12))
    cfg = env.cfg

    def keys_and_target(state, raw_action):
        k_step = jax.random.fold_in(
            jax.random.PRNGKey(state.seed[0]), state.common_step
        )
        ks = jax.random.split(k_step, 8)
        target_task = env.default_joint_pos_task + cfg.action_scale * raw_action
        target_model = target_task[:, env.m2t]
        return ks, ks, target_model

    @jax.jit
    def upto_engine(state, raw_action):
        _, _, target_model = keys_and_target(state, raw_action)
        return env._engine_step(state.sim, target_model, state.mu)

    timeit("A: keys+target+engine", upto_engine, es, a)

    @jax.jit
    def upto_constraints(state, raw_action):
        _, _, target_model = keys_and_target(state, raw_action)
        sim = env._engine_step(state.sim, target_model, state.mu)
        data = env._step_data(sim, state.command, raw_action, state.prev_action)
        from cat_tpu.envs.cat import curriculum_max_p
        max_p = curriculum_max_p(env.cset.terms, state.common_step + 1,
                                 cfg.curriculum_steps)
        return env.cset.compute(data, state.running_max, max_p)

    timeit("B: A + stepdata + constraints", upto_constraints, es, a)

    @jax.jit
    def upto_reset(state, raw_action):
        ks, _, target_model = keys_and_target(state, raw_action)
        sim = env._engine_step(state.sim, target_model, state.mu)

        fresh = env._reset_sim(ks[0], N, jnp.zeros((N, 2)))
        rmask = state.episode_len > 250
        sim = jax.tree.map(
            lambda new, old: jnp.where(
                rmask.reshape((N,) + (1,) * (old.ndim - 1)), new, old
            ),
            fresh, sim,
        )
        return sim

    timeit("C: A + fresh-reset + masked select", upto_reset, es, a)

    @jax.jit
    def cmd_update(state):
        ks = jax.random.split(jax.random.PRNGKey(state.seed[0]), 8)
        return env._update_commands(
            state.command, state.command_time_left, ks[2], ks[3], ks[4]
        )

    timeit("D: command update alone", cmd_update, es)

    @jax.jit
    def full(state, raw_action):
        return env.step(state, raw_action)

    timeit("E: FULL env.step", full, es, a)


if __name__ == "__main__":
    main()
