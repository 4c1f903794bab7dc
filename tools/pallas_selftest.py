"""On-chip Pallas/XLA contact-solver equivalence artifact (VERDICT r1 #8).

Runs the compiled Pallas PGS kernel (ops/pgs_pallas.py) against the pure-XLA
mirror solver (engine_lanes._pgs_lanes_xla) on the REAL device, on contact
problems produced by the actual dynamics pipeline (not synthetic matrices):
N randomly perturbed Solo12 states are pushed through the lanes substep
pre-stage to get (E, W, b, bias, active, mu) exactly as the engine builds
them, then both solvers run on identical inputs.

The interpret-mode CPU test (tests/test_pgs_pallas.py) pins the kernel's
semantics; this tool pins the MOSAIC-COMPILED kernel on hardware, where
float contraction order / FMA fusion can differ. Writes
runs/profile/pallas_equiv.json with max|dlam| and relative error.

Usage: python tools/pallas_selftest.py [N=128]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.ops import pgs_pallas
    from cat_tpu.sim import engine as em
    from cat_tpu.sim import engine_lanes as el
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.sim.terrain import plane

    model = solo12_model()
    params = EngineParams()
    anc = model.ancestor_mask()
    terr = plane()
    sp = params.solver

    # Perturbed init states: some airborne, some in penetration, random
    # joint angles/velocities — a spread of active-set patterns.
    key = jax.random.PRNGKey(0)
    kz, kq, kv, km = jax.random.split(key, 4)
    s = em.make_batched_init(model, N)
    dz = jax.random.uniform(kz, (N,), minval=-0.06, maxval=0.15)
    qpos = s.qpos.at[:, 2].add(dz)
    qpos = qpos.at[:, 7:].add(
        jax.random.uniform(kq, (N, model.nj), minval=-0.3, maxval=0.3)
    )
    qvel = s.qvel.at[:].add(
        jax.random.uniform(kv, (N, model.nv), minval=-1.0, maxval=1.0)
    )
    mu = jax.random.uniform(km, (N,), minval=0.3, maxval=1.2)
    target = jnp.zeros((N, model.nj))

    qposT, qvelT, targetT = qpos.T, qvel.T, target.T

    @jax.jit
    def build(qposT, qvelT, targetT):
        tau_j, v_free, E, W, b, phi, frame = el._substep_pre_lanes(
            model, params, anc, terr, qposT, qvelT, targetT, None
        )
        from cat_tpu.sim import solver as solver_mod
        bias = solver_mod.contact_bias(phi, params.dt, sp)
        active = (phi < sp.margin).astype(jnp.float32)
        return E, W, b, bias, active

    E, W, b, bias, active = build(qposT, qvelT, targetT)
    lam0 = jnp.zeros((3 * model.ncand, N))

    pallas_fn = jax.jit(
        lambda E, W, b, bias, active, mu, lam0: pgs_pallas.pgs_solve_lanes(
            E, W, b, bias, active, mu[None, :], lam0,
            nc=model.ncand, nv=model.nv,
            iterations=sp.iterations, cfm=sp.cfm,
            # production config: static row-sparse Delassus assembly
            row_dofs=pgs_pallas.contact_row_dofs(model, anc),
        )
    )
    xla_fn = jax.jit(
        lambda E, W, b, bias, active, mu, lam0: el._pgs_lanes_xla(
            E, W, b, bias, active, mu, lam0,
            nc=model.ncand, iterations=sp.iterations, cfm=sp.cfm,
        )
    )

    lam_p = np.asarray(pallas_fn(E, W, b, bias, active, mu, lam0))
    lam_x = np.asarray(xla_fn(E, W, b, bias, active, mu, lam0))

    dlam = np.abs(lam_p - lam_x)
    scale = max(np.abs(lam_x).max(), 1e-12)
    n_active = int(np.asarray(active).sum())
    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "N": N,
        "nc": model.ncand,
        "iterations": sp.iterations,
        "active_candidates": n_active,
        "max_abs_dlam": float(dlam.max()),
        "max_rel_dlam": float(dlam.max() / scale),
        "lam_abs_max": float(scale),
        "pallas_nonzero_rows": int((np.abs(lam_p) > 0).any(axis=1).sum()),
    }
    os.makedirs("runs/profile", exist_ok=True)
    with open("runs/profile/pallas_equiv.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    tol = 1e-3 * scale
    assert dlam.max() <= tol, (dlam.max(), tol)
    print("PASS: compiled Pallas kernel matches XLA solver on device")


if __name__ == "__main__":
    main()
