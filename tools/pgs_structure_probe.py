"""Convergence probe for PGS sweep structures on PHYSICAL contact problems.

Round-5 speed-of-light experiment (VERDICT r4 next-step #1): the serial
Gauss-Seidel sweep is the kernel's latency wall; the block-Jacobi variant
(ops/pgs_pallas.py) restructures it. Random dense test problems are far more
coupled than physical ones, so this probe captures REAL contact problems
from flat-env rollouts (standing, stumbling under random actions, fallen
robots with base contacts) and scores each candidate (n_blocks, omega,
iterations) against a converged GS reference (100 sweeps, fori_loop CPU
solver) and against the shipped GS-5 budget.

Metrics per variant, over all captured problems:
  * imp_err   — RMS impulse error vs the converged reference, relative to
                the reference RMS (solution-space distance);
  * vn_viol   — worst post-solve approach speed on active contacts
                (max over envs of -(A lam + b + bias)_n clamped >=0):
                the physical "still penetrating" residual;
  * depth     — serial sweep depth per solve (blocks x iterations), the
                latency proxy the restructure is buying down.

The bar is GS-5 (the shipped budget), not perfect convergence.
Writes runs/profile/pgs_structure_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.ops import pgs_pallas
from cat_tpu.sim import engine_lanes, solver
from cat_tpu.sim.engine import EngineParams
from cat_tpu.tasks.solo12_flat import make_env

N = 256
CAPTURE_STEPS = (0, 3, 10, 25, 50)


def capture_problems(env):
    """Roll the env under random actions; return a list of lanes-layout
    contact problems (E, W, b, bias, active, mu, lam0) at CAPTURE_STEPS."""
    model = env.model
    params = EngineParams(dt=env.cfg.sim_dt, decimation=env.cfg.decimation,
                          kp=env.cfg.kp, kd=env.cfg.kd)
    anc_mask = model.ancestor_mask()
    terrain = env.cfg.terrain

    es = env.init(jax.random.PRNGKey(0), N)
    step = jax.jit(lambda s, a: env.step(s, a))
    key = jax.random.PRNGKey(42)
    probs = []

    def problem_from(es):
        sT = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), es.sim)
        # MODEL-order PD targets (the engine's convention)
        tgt = (jnp.asarray(model.default_qpos_joints,
                           dtype=jnp.float32)[:, None]
               * jnp.ones((1, N))).astype(jnp.float32)
        pre = jax.jit(functools.partial(
            engine_lanes._substep_pre_lanes, model, params, anc_mask,
            terrain))
        tau_j, v_free, E, W, b, phi, frame = pre(
            sT.qpos, sT.qvel, tgt, None)
        sp = params.solver
        bias = solver.contact_bias(phi, params.dt, sp)
        active = (phi < sp.margin).astype(jnp.float32)
        return tuple(np.asarray(x) for x in
                     (E, W, b, bias, active, es.mu, sT.lam))

    for t in range(max(CAPTURE_STEPS) + 1):
        if t in CAPTURE_STEPS:
            probs.append(problem_from(es))
        key, k = jax.random.split(key)
        act = jax.random.uniform(k, (N, env.num_actions), minval=-1.0,
                                 maxval=1.0)
        es, *_ = step(es, act)
    return probs


def ref_solution(model, E, W, b, bias, active, mu, lam0, iters=100):
    """Converged GS via the fori_loop CPU solver (compile-cheap at 100
    sweeps), vmapped over envs."""
    nc = model.ncand
    A = jnp.einsum("rkn,kcn->rcn", jnp.asarray(E), jnp.asarray(W))

    def solve_one(A1, b1, bias1, act1, mu1, lam1):
        p = solver.SolverParams(iterations=iters)
        # feed bias/active directly through a phi surrogate: pgs_solve
        # recomputes bias from phi, so call it with phi chosen to reproduce
        # (bias, active): bias = (erp/h)(phi+slop) inverts to
        # phi = bias*h/erp - slop (bias <= 0 -> phi <= -slop, active);
        # active=0 -> phi=+1. The depen clamp round-trips (clamped bias
        # maps to a deep phi that re-clamps to the same bias).
        h = 0.005
        phi = jnp.where(act1 > 0, bias1 * h / p.erp - p.slop, 1.0)
        return solver.pgs_solve(A1, b1, phi, mu1, lam1, h, p)

    lam = jax.jit(jax.vmap(solve_one, in_axes=(2, 1, 1, 1, 0, 0)))(
        A, jnp.asarray(b), jnp.asarray(bias), jnp.asarray(active),
        jnp.asarray(mu), jnp.asarray(lam0).T.reshape(-1, nc, 3),
    )  # (N, nc, 3)
    return np.asarray(lam).reshape(-1, 3 * nc).T, np.asarray(A)


@functools.lru_cache(maxsize=64)
def _solver_for(nc, variant, cperm, blocks):
    nb, om, it = variant
    return jax.jit(functools.partial(
        pgs_pallas.pgs_lanes_xla_bj,
        nc=nc, iterations=it, cfm=solver.SolverParams().cfm, omega=om,
        contact_perm=cperm, blocks=blocks,
    ))


def score(model, prob, lam_ref, A, variant):
    nc = model.ncand
    E, W, b, bias, active, mu, lam0 = prob
    nb, om, it = variant
    if nb == 0:   # GS serial
        cperm, blocks = tuple(range(nc)), tuple((i, 1) for i in range(nc))
        variant = (nb, 1.0, it)
    else:
        cperm, blocks = pgs_pallas.plan_contact_blocks(model, nb)
    fn = _solver_for(nc, variant, cperm, blocks)
    lam = np.asarray(fn(
        jnp.asarray(E), jnp.asarray(W), jnp.asarray(b), jnp.asarray(bias),
        jnp.asarray(active), jnp.asarray(mu), jnp.asarray(lam0),
    ))
    ref_rms = max(float(np.sqrt((lam_ref ** 2).mean())), 1e-9)
    imp_err = float(np.sqrt(((lam - lam_ref) ** 2).mean())) / ref_rms
    # two-sided normal complementarity residual on active contacts:
    #   lam_n > 0  ->  |v_n + bias|      (pushing contacts must null the
    #                                     biased approach speed — catches
    #                                     Jacobi OVERSHOOT, not just
    #                                     under-impulse)
    #   lam_n = 0  ->  max(-(v_n+bias), 0)  (separating contacts may not
    #                                        still be approaching)
    w = np.einsum("rcn,cn->rn", A, lam)
    vn = (w + b)[2::3] + bias            # (nc, N) normal rows
    lam_n = lam[2::3]
    comp = np.where(lam_n > 1e-6, np.abs(vn), np.maximum(-vn, 0.0)) * active
    viol = np.maximum(-vn, 0.0) * active
    return (imp_err, float(viol.max()), float(viol.mean()),
            float(comp.max()), float(comp.mean()))


def main():
    env = make_env(num_envs=N)
    model = env.model
    print(f"capturing {len(CAPTURE_STEPS)} problem batches (N={N}) ...")
    probs = capture_problems(env)
    refs = [ref_solution(model, *p) for p in probs]

    # (n_blocks, omega, iterations); n_blocks=0 => serial GS
    variants = [
        (0, 1.0, 5), (0, 1.0, 4), (0, 1.0, 3), (0, 1.0, 8),
        (1, 0.5, 8), (1, 0.5, 12), (1, 0.35, 12), (1, 0.7, 10),
        (2, 0.7, 6), (2, 0.7, 8), (2, 0.8, 8), (2, 0.6, 10),
        (3, 0.8, 5), (3, 0.8, 6), (3, 0.9, 6), (3, 0.7, 8),
        (4, 0.9, 5), (4, 0.8, 6), (4, 1.0, 5), (4, 0.9, 6),
        (6, 1.0, 5), (6, 0.9, 5), (6, 1.0, 4), (6, 0.9, 6),
        (9, 1.0, 4), (9, 1.0, 5),
    ]
    out = []
    for v in variants:
        errs, vmaxs, vmeans, cmaxs, cmeans = [], [], [], [], []
        for p, (lam_ref, A) in zip(probs, refs):
            e, vm, vu, cm, cu = score(model, p, lam_ref, A, v)
            errs.append(e), vmaxs.append(vm), vmeans.append(vu)
            cmaxs.append(cm), cmeans.append(cu)
        nb, om, it = v
        depth = (model.ncand if nb == 0 else nb) * it
        rec = {
            "n_blocks": nb, "omega": om, "iterations": it,
            "serial_depth": depth,
            "imp_err": max(errs), "imp_err_mean": float(np.mean(errs)),
            "vn_viol_max": max(vmaxs), "vn_viol_mean": float(np.mean(vmeans)),
            "comp_max": max(cmaxs), "comp_mean": float(np.mean(cmeans)),
        }
        out.append(rec)
        tag = "GS " if nb == 0 else f"bj{nb}"
        print(f"{tag} om={om:<4} it={it:<2} depth={depth:<4} "
              f"imp_err={rec['imp_err']:.4f} vn_max={rec['vn_viol_max']:.4f} "
              f"vn_mean={rec['vn_viol_mean']:.5f} "
              f"comp_max={rec['comp_max']:.4f} "
              f"comp_mean={rec['comp_mean']:.5f}")

    os.makedirs("runs/profile", exist_ok=True)
    with open("runs/profile/pgs_structure_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote runs/profile/pgs_structure_probe.json")


if __name__ == "__main__":
    main()
