"""Pin down why env._engine_step costs 56 ms from env.init state but the
identical make_batched_step program costs 0.07 ms from make_batched_init
state at N=4096.

Usage: python tools/engine_anomaly.py [N]
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
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import engine as em
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.tasks.solo12_flat import make_env

    model = solo12_model()
    params = EngineParams()
    env = make_env(num_envs=N)
    es = env.init(jax.random.PRNGKey(0), N)

    s_default = em.make_batched_init(model, N)
    target0 = jnp.zeros((N, 12))
    mu1 = jnp.ones(N)

    step = jax.jit(em.make_batched_step(model, params, num_envs=N))
    estep = jax.jit(env._engine_step)

    # 1. profile_step's exact setup
    timeit("standalone step, default state, mu=1", step, s_default, target0, mu1)
    # 2. same program, env.init's sim state
    timeit("standalone step, env.init sim, mu=1", step, es.sim, target0, mu1)
    # 3. same program, env mu
    timeit("standalone step, env.init sim, env mu", step, es.sim, target0,
           es.mu)
    # 4. env's own engine fn, default state
    timeit("env._engine_step, default state, mu=1", estep, s_default, target0,
           mu1)
    # 5. env's own engine fn, env state (bisect A equivalent)
    timeit("env._engine_step, env.init sim, env mu", estep, es.sim, target0,
           es.mu)
    # 6. after some steps (settled contact state)
    es2 = es
    stepfn = jax.jit(lambda st, a: env.step(st, a))
    for _ in range(5):
        es2, *_ = stepfn(es2, jnp.zeros((N, 12)))
    jax.block_until_ready(es2)
    timeit("standalone step, settled sim, env mu", step, es2.sim, target0,
           es2.mu)


if __name__ == "__main__":
    main()
