"""Stage-level profile of the PRODUCTION lanes engine on the real chip.

Chained timing (every call consumes the previous call's output — see
profile_chain.py for why) of the lanes substep pipeline, cumulative stages:

  fk                 forward kinematics
  +jacs              + body Jacobians
  +M/C/Minv          + inertias, mass matrix, bias forces, structured inverse
  +collision/E/W/b   + contact detection, Delassus operands (full pre stage)
  +pallas            + the PGS contact kernel
  substep            the real _substep_lanes (pre + solve + post)
  control_step       4 substeps under the scan + boundary transposes

Writes runs/profile/lanes_stages_N{N}.json. The deltas between cumulative
stages bound each stage's cost (XLA may fuse differently per program, so
deltas are indicative, not exact).

MEASUREMENT LIMITS (measured on this rig, r3): the tunneled chip has
~0.9-1.3 ms of per-dispatch overhead for chained non-trivial programs
(flat in N from 512 to 8192) and ~25 ms single-call latency, while raw
streaming bandwidth is enormous (64 MB scale op ~0.03 ms). Sub-millisecond
stage deltas are therefore NOT resolvable here — only multi-ms aggregates
(full substep, control step, train iteration) are trustworthy, and kernel
A/B decisions must use bench.py (one dispatch per full iteration). This is
how the in-kernel-Delassus-operand variant was (correctly) rejected: stage
deltas suggested a 2 ms win, bench.py showed an 8% full-program LOSS.

Usage: python tools/profile_lanes.py [N=4096]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

RESULTS = []


def chain(name, fn, state, n=30):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    RESULTS.append((name, dt * 1e3))
    return state


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.ops import pgs_pallas
    from cat_tpu.sim import dynamics_lanes as dl
    from cat_tpu.sim import engine as em
    from cat_tpu.sim import engine_lanes as el
    from cat_tpu.sim import solver
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.sim.terrain import plane

    model = solo12_model()
    params = EngineParams()
    anc = model.ancestor_mask()
    terr = plane()
    sp = params.solver
    target0 = jnp.zeros((model.nj, N))
    mu1 = jnp.ones(N)

    s = em.make_batched_init(model, N)
    qpos0, qvel0 = s.qpos.T, s.qvel.T

    # tiny state feedback so each stage is state->state (chained)
    def feedback(qpos, qvel, v):
        qpos = qpos.at[:3].add(1e-7 * v[:3]).at[7:].add(1e-7 * v[6:])
        return qpos, qvel + 1e-7 * v

    @functools.partial(jax.jit, donate_argnums=0)
    def st_fk(c):
        qpos, qvel = c
        kin = dl.fk_lanes(model, qpos, qvel)
        v = jnp.concatenate([kin.o[0], kin.v_o[1][:1] * 0 + qvel[3:6],
                             qvel[6:] + 1e-9 * kin.o[1][0][None]], axis=0)
        return feedback(qpos, qvel, v)

    @functools.partial(jax.jit, donate_argnums=0)
    def st_jacs(c):
        qpos, qvel = c
        kin = dl.fk_lanes(model, qpos, qvel)
        jacs = dl.body_jacobians_lanes(model, kin, anc)
        v = jnp.sum(jacs.Jv[-1] + jacs.Jw[-1], axis=0)   # (nv, N)
        return feedback(qpos, qvel, v)

    @functools.partial(jax.jit, donate_argnums=0)
    def st_dyn(c):
        qpos, qvel = c
        kin = dl.fk_lanes(model, qpos, qvel)
        jacs = dl.body_jacobians_lanes(model, kin, anc)
        I_w = dl.world_inertias_lanes(model, kin)
        M = dl.mass_matrix_lanes(model, jacs, I_w)
        C = dl.bias_forces_lanes(model, kin, jacs, I_w, qvel)
        Minv = dl.mass_matrix_inverse_lanes(M, n_branch=model.nj // 3)
        v = qvel + params.dt * el._matvec(Minv, -C)
        return feedback(qpos, qvel, v)

    @functools.partial(jax.jit, donate_argnums=0)
    def st_pre(c):
        qpos, qvel = c
        tau_j, v_free, E, W, b, phi, frame = el._substep_pre_lanes(
            model, params, anc, terr, qpos, qvel, target0, None)
        v = v_free + 1e-9 * el._matvec(W, b)
        return feedback(qpos, qvel, v)

    @functools.partial(jax.jit, donate_argnums=0)
    def st_solve(c):
        qpos, qvel = c
        tau_j, v_free, E, W, b, phi, frame = el._substep_pre_lanes(
            model, params, anc, terr, qpos, qvel, target0, None)
        bias = solver.contact_bias(phi, params.dt, sp)
        active = (phi < sp.margin).astype(jnp.float32)
        lam = pgs_pallas.pgs_solve_lanes(
            E, W, b, bias, active, mu1[None, :],
            jnp.zeros((3 * model.ncand, N)),
            nc=model.ncand, nv=model.nv,
            iterations=sp.iterations, cfm=sp.cfm)
        v = v_free + el._matvec(W, lam)
        return feedback(qpos, qvel, v)

    chain("fk", st_fk, (qpos0.copy(), qvel0.copy()))
    chain("+jacs", st_jacs, (qpos0.copy(), qvel0.copy()))
    chain("+M/C/Minv", st_dyn, (qpos0.copy(), qvel0.copy()))
    chain("+collision/E/W/b (pre)", st_pre, (qpos0.copy(), qvel0.copy()))
    chain("+pallas solve", st_solve, (qpos0.copy(), qvel0.copy()))

    # full substep + control step on real SimState
    sT = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), s)

    @functools.partial(jax.jit, donate_argnums=0)
    def st_sub(sT):
        return el._substep_lanes(model, params, anc, terr, True, sT,
                                 target0, mu1, None)

    chain("substep (pre+solve+post)", st_sub, sT)

    step = em.make_batched_step(model, params, num_envs=N, layout="lanes")

    @functools.partial(jax.jit, donate_argnums=0)
    def st_ctrl(s):
        return step(s, target0.T, mu1)

    chain("control_step (4 substeps)", st_ctrl, em.make_batched_init(model, N))

    os.makedirs("runs/profile", exist_ok=True)
    with open(f"runs/profile/lanes_stages_N{N}.json", "w") as f:
        json.dump({"N": N, "device": str(jax.devices()[0]),
                   "ms": dict(RESULTS)}, f, indent=1)


if __name__ == "__main__":
    main()
