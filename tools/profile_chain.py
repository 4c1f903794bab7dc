"""Honest per-stage profiling: CHAINED timing (each call consumes the
previous call's output), so the tunnel runtime cannot dedupe repeated
identical dispatches — repeating a pure program on the very same input
buffers was measured to return in ~0.08 ms regardless of its true cost,
which poisoned the earlier profile_step.py numbers.

Every timed stage is state -> state with donated buffers, exactly like the
real training loop.

Usage: python tools/profile_chain.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

RESULTS = []


def chain(name, fn, state, n=20):
    """fn: state -> state (jitted, donated). Times n chained calls."""
    state = fn(state)            # warm/compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    RESULTS.append((name, dt * 1e3))
    return state


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import collision, dynamics, engine as em, solver
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.sim.terrain import plane
    from cat_tpu.tasks.solo12_flat import make_env

    model = solo12_model()
    params = EngineParams()
    anc = model.ancestor_mask()
    terr = plane()
    env = make_env(num_envs=N)
    target0 = jnp.zeros((N, 12))
    mu1 = jnp.ones(N)

    # --- 1. full engine control step (pallas path), chained ---
    raw_step = em.make_batched_step(model, params, num_envs=N)

    @functools.partial(jax.jit, donate_argnums=0)
    def eng(s):
        return raw_step(s, target0, mu1)

    s = em.make_batched_init(model, N)
    chain("engine control_step (pallas)", eng, s)

    # --- 2. engine, XLA solver path ---
    raw_step_xla = em.make_batched_step(model, params, num_envs=0)

    @functools.partial(jax.jit, donate_argnums=0)
    def eng_xla(s):
        return raw_step_xla(s, target0, mu1)

    s = em.make_batched_init(model, N)
    chain("engine control_step (XLA solver)", eng_xla, s)

    # --- 3. dynamics only: fk+jacs+M+C+Minv, chained via qpos/qvel ---
    @functools.partial(jax.jit, donate_argnums=0)
    def dyn(c):
        qpos, qvel = c

        def one(qpos, qvel):
            kin = dynamics.fk(model, qpos, qvel)
            jacs = dynamics.body_jacobians(model, kin, anc)
            I_w = dynamics.world_inertias(model, kin)
            M = dynamics.mass_matrix(model, jacs, I_w)
            C = dynamics.bias_forces(model, kin, jacs, I_w, qvel)
            Minv = dynamics.mass_matrix_inverse(M, n_branch=model.nj // 3)
            v = qvel + params.dt * (Minv @ (-C))
            return qpos + 1e-6 * jnp.concatenate([v[:3], jnp.zeros(4),
                                                  v[6:]]), v

        return jax.vmap(one)(qpos, qvel)

    s = em.make_batched_init(model, N)
    chain("dynamics fk+jacs+M+C+Minv (x1)", dyn, (s.qpos, s.qvel))

    # --- 4. + collision & Delassus prep (no solve) ---
    @functools.partial(jax.jit, donate_argnums=0)
    def dyn_con(c):
        qpos, qvel = c

        def one(qpos, qvel):
            kin = dynamics.fk(model, qpos, qvel)
            jacs = dynamics.body_jacobians(model, kin, anc)
            I_w = dynamics.world_inertias(model, kin)
            M = dynamics.mass_matrix(model, jacs, I_w)
            C = dynamics.bias_forces(model, kin, jacs, I_w, qvel)
            Minv = dynamics.mass_matrix_inverse(M, n_branch=model.nj // 3)
            v_free = qvel + params.dt * (Minv @ (-C))
            con = collision.detect_contacts(model, terr, kin, anc)
            E = con.J.reshape(-1, model.nv)
            minvEt = Minv @ E.T
            b = E @ v_free
            corr = minvEt @ b
            v2 = v_free + 1e-9 * corr
            return qpos + 1e-6 * jnp.concatenate(
                [v2[:3], jnp.zeros(4), v2[6:]]), v2

        return jax.vmap(one)(qpos, qvel)

    s = em.make_batched_init(model, N)
    chain("dynamics + collision + E/minvEt/b (x1)", dyn_con, (s.qpos, s.qvel))

    # --- 5. env.step chained ---
    es = env.init(jax.random.PRNGKey(0), N)

    @functools.partial(jax.jit, donate_argnums=0)
    def estep(es):
        es2, obs, rew, dones, tout = env.step(es, target0)
        return es2

    chain("FULL env.step", estep, es)

    # --- 6. train iteration chained ---
    from cat_tpu.rl.ppo import PPO, PpoCfg
    ppo = PPO(env, PpoCfg())
    es = env.init(jax.random.PRNGKey(0), N)
    obs0 = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs0)

    @functools.partial(jax.jit, donate_argnums=0)
    def titer(c):
        ts, es = c
        ts, es, m = ppo.train_iteration(ts, es)
        return ts, es

    chain("FULL train_iteration (24 steps + SGD)", titer, (ts, es), n=5)

    import json
    os.makedirs("runs/profile", exist_ok=True)
    with open(f"runs/profile/chain_N{N}.json", "w") as f:
        json.dump({"N": N, "ms": dict(RESULTS)}, f, indent=1)


if __name__ == "__main__":
    main()
