"""Microbenchmark the pieces of the training step on the real chip.

Usage: python tools/profile_step.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import collision, dynamics, engine as em, solver
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.tasks.solo12_flat import make_env

    model = solo12_model()
    params = EngineParams()
    anc = model.ancestor_mask()
    s = em.make_batched_init(model, N)
    target = jnp.zeros((N, 12))
    mu = jnp.ones(N)

    # full control step
    step = jax.jit(em.make_batched_step(model, params, num_envs=N))
    timeit("engine control_step (4 substeps)", step, s, target, mu)

    # dynamics pieces (single substep granularity)
    @jax.jit
    @jax.vmap
    def dyn_only(qpos, qvel):
        kin = dynamics.fk(model, qpos, qvel)
        jacs = dynamics.body_jacobians(model, kin, anc)
        I_w = dynamics.world_inertias(model, kin)
        M = dynamics.mass_matrix(model, jacs, I_w)
        C = dynamics.bias_forces(model, kin, jacs, I_w, qvel)
        return M, C

    M, C = timeit_ret("fk+jacs+M+C", dyn_only, s.qpos, s.qvel)

    @jax.jit
    @jax.vmap
    def chol_solve(M, C):
        ch = jax.scipy.linalg.cho_factor(M)
        return jax.scipy.linalg.cho_solve(ch, C)

    timeit("cho_factor + cho_solve(nv)", chol_solve, M, C)

    @jax.jit
    @jax.vmap
    def chol_solve_wide(M):
        ch = jax.scipy.linalg.cho_factor(M)
        return jax.scipy.linalg.cho_solve(ch, jnp.eye(M.shape[0])[:, :84])

    timeit("cho_solve (nv x 84)", chol_solve_wide, M)

    @jax.jit
    @jax.vmap
    def contact_path(qpos, qvel, M, lam0, mu1):
        kin = dynamics.fk(model, qpos, qvel)
        con = collision.detect_plane_contacts(model, kin, anc)
        E = con.J.reshape(-1, model.nv)
        ch = jax.scipy.linalg.cho_factor(M)
        minvEt = jax.scipy.linalg.cho_solve(ch, E.T)
        A = E @ minvEt
        b = E @ qvel
        lam = solver.pgs_solve(A, b, con.phi, mu1, lam0, 0.005,
                               solver.SolverParams())
        return lam

    timeit("collision+delassus+pgs", contact_path, s.qpos, s.qvel, M,
           s.lam.reshape(N, -1, 3), mu)

    @jax.jit
    @jax.vmap
    def pgs_only(A, b, phi, lam0, mu1):
        return solver.pgs_solve(A, b, phi, mu1, lam0, 0.005,
                                solver.SolverParams())

    # build A once
    @jax.jit
    @jax.vmap
    def build_A(qpos, qvel, M):
        kin = dynamics.fk(model, qpos, qvel)
        con = collision.detect_plane_contacts(model, kin, anc)
        E = con.J.reshape(-1, model.nv)
        ch = jax.scipy.linalg.cho_factor(M)
        minvEt = jax.scipy.linalg.cho_solve(ch, E.T)
        return E @ minvEt, E @ qvel, con.phi

    A, b, phi = build_A(s.qpos, s.qvel, M)
    timeit("pgs only (8 sweeps x 28)", pgs_only, A, b, phi,
           s.lam.reshape(N, -1, 3), mu)

    # env + rng
    env = make_env(num_envs=N)
    es = env.init(jax.random.PRNGKey(0), N)
    estep = jax.jit(lambda st, a: env.step(st, a))
    timeit("env.step (engine + managers)", estep, es, jnp.zeros((N, 12)))

    # env internals
    data = env._step_data(es.sim, es.command, es.action, es.prev_action)
    import jax.random as jr
    k = jr.PRNGKey(0)

    @jax.jit
    def constraints_only(data, rm, mp):
        return env.cset.compute(data, rm, mp)

    timeit("constraint set compute", constraints_only, data,
           es.running_max, es.max_p)

    @jax.jit
    def reset_only(k):
        return env._reset_sim(k, N, jnp.zeros((N, 2)))

    timeit("fresh reset states", reset_only, k)

    @jax.jit
    def obs_only(data, k):
        return env._observations(data, k)

    timeit("observations+noise", obs_only, data, k)

    # full PPO train iteration
    from cat_tpu.rl.ppo import PPO, PpoCfg
    ppo = PPO(env, PpoCfg())
    obs0 = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs0)
    tf = jax.jit(ppo.train_iteration)
    timeit("FULL train_iteration (24 steps+SGD)", tf, ts, es, n=3)


def timeit_ret(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out


if __name__ == "__main__":
    main()
