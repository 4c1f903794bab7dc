"""Chained timing of the lanes vs vmap engine on the real chip.

Usage: python tools/bench_lanes.py [N] [stage]
  stage: engine (default) | step | iter
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def chain(name, fn, state, n=20):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(state)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return state


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    stage = sys.argv[2] if len(sys.argv) > 2 else "engine"
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import engine as em
    from cat_tpu.sim.engine import EngineParams

    model = solo12_model()
    params = EngineParams()
    target0 = jnp.zeros((N, 12))
    mu1 = jnp.ones(N)

    if stage == "engine":
        for layout in ("lanes", "vmap"):
            raw = em.make_batched_step(model, params, num_envs=N,
                                       layout=layout)

            @functools.partial(jax.jit, donate_argnums=0)
            def eng(s, raw=raw):
                return raw(s, target0, mu1)

            s = em.make_batched_init(model, N)
            chain(f"engine control_step ({layout})", eng, s)
    elif stage == "step":
        from cat_tpu.tasks.solo12_flat import make_env

        env = make_env(num_envs=N)
        es = env.init(jax.random.PRNGKey(0), N)

        @functools.partial(jax.jit, donate_argnums=0)
        def estep(es):
            es2, *_ = env.step(es, target0)
            return es2

        chain("FULL env.step", estep, es)
    else:
        from cat_tpu.rl.ppo import PPO, PpoCfg
        from cat_tpu.tasks.solo12_flat import make_env

        env = make_env(num_envs=N)
        es = env.init(jax.random.PRNGKey(0), N)
        ppo = PPO(env, PpoCfg())
        obs0 = jax.jit(env.observe)(es)
        ts = ppo.init(jax.random.PRNGKey(1), es, obs0)

        @functools.partial(jax.jit, donate_argnums=0)
        def titer(c):
            ts, es = c
            ts, es, m = ppo.train_iteration(ts, es)
            return ts, es

        chain("FULL train_iteration", titer, (ts, es), n=5)


if __name__ == "__main__":
    main()
