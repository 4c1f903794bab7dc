"""Batched contact impulse solver: regularized projected Gauss-Seidel (PGS)
on the per-env Delassus operator, with friction cones and warm starting.

TPU-native replacement for the PhysX PGS rigid-contact solver the reference
configures (solver_type 0 = PGS, 4 position + 1 velocity iterations,
cat_flat_env_cfg.py:483-487). Design notes:

  * Fixed-size candidate set with masking (no dynamic shapes under jit).
  * Velocity-impulse NCP with Baumgarte stabilization (ERP) and constraint
    regularization (CFM).
  * Contact frame == world frame for the plane terrain (normal = +z).
  * Warm-started from the previous step's impulses (carried in SimState).
  * LAYOUT MATTERS ON TPU: the sweep indexes per-contact 3-blocks. Dynamic
    slicing at unaligned LANE offsets is catastrophically slow (profiled:
    ~0.25 ms per block update at N=4096 — 1000x the arithmetic cost), so the
    Delassus operator is kept as row blocks A_blk (nc, 3, 3nc) and the
    running product w = A lam as (nc, 3): every slice in the sweep is then a
    STATIC leading-dim index, and the rank-3 update is a dense (3,)x(3,3nc)
    contraction. The contact loop is unrolled (static); only the sweep loop
    is a fori_loop.

All functions single-env; vmapped by the engine. The Pallas kernel in
cat_tpu/ops/pgs_pallas.py is the VMEM-resident production variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SolverParams(NamedTuple):
    iterations: int = 5          # PGS sweeps; matches the reference PhysX
                                 # budget (solver_type 0 PGS, 4 position +
                                 # 1 velocity iterations,
                                 # cat_flat_env_cfg.py:483-487). Warm
                                 # starting carries convergence across
                                 # substeps; all contact tests (slope
                                 # statics, pyramid ridges, self-collision
                                 # depenetration, penetration bounds) pass
                                 # at 5, and the serial PGS sweep is the
                                 # dominant kernel cost.
    erp: float = 0.2             # penetration correction per step
    cfm: float = 1e-4            # constraint regularization
    slop: float = 0.002          # penetration tolerance (m)
    margin: float = 0.0          # activation distance
    max_depen_vel: float = 2.0   # cap on Baumgarte push-out speed (m/s);
                                 # PhysX analog: max_depenetration_velocity
                                 # (odri.py:32 sets 100 — effectively off;
                                 # ours is tight to keep deep-spawn
                                 # penetrations from ballistic pop-out)
    structure: str = "gs"        # sweep structure (lanes/Pallas path only):
                                 # "gs" = serial Gauss-Seidel over contacts;
                                 # "bj" = block-Jacobi (bj_blocks groups,
                                 # Jacobi within, GS between — see
                                 # ops/pgs_pallas.py round-5 notes)
    bj_blocks: int = 1           # contact groups for structure="bj"
    omega: float = 1.0           # under-relaxation for structure="bj"


def contact_bias(phi, h: float, params: SolverParams):
    """Baumgarte stabilization velocity (<= 0), depenetration-clamped."""
    return jnp.maximum(
        (params.erp / h) * jnp.minimum(phi + params.slop, 0.0),
        -params.max_depen_vel,
    )


def pgs_solve(
    A: jnp.ndarray,          # (3nc, 3nc) Delassus J M^-1 J^T (symmetric)
    b: jnp.ndarray,          # (3nc,) J v_free
    phi: jnp.ndarray,        # (nc,) signed distances
    mu: jnp.ndarray,         # () or (nc,) friction coefficient
    lam0: jnp.ndarray,       # (nc, 3) warm-start impulses
    h: float,
    params: SolverParams,
) -> jnp.ndarray:
    """Solve the contact NCP; returns impulses lam (nc, 3) in contact frame."""
    nc = phi.shape[0]
    n3 = 3 * nc
    active = (phi < params.margin).astype(A.dtype)        # (nc,)
    lam = lam0 * active[:, None]                          # (nc, 3)

    bias = contact_bias(phi, h, params)                   # (nc,) <= 0
    mu = jnp.broadcast_to(mu, (nc,))

    # Row-block view: A_blk[i] = A[3i:3i+3, :]. By symmetry these are also
    # the column blocks, so both the residual read and the rank-3 update use
    # only leading-dim indexing.
    A_blk = A.reshape(nc, 3, n3)
    # diagonal 3x3 blocks (static gather)
    D = jnp.stack([A_blk[i][:, 3 * i:3 * i + 3] for i in range(nc)])  # (nc,3,3)
    inv_d = 1.0 / (jnp.stack([jnp.diagonal(D[i]) for i in range(nc)])
                   + params.cfm)                           # (nc, 3)

    b_blk = b.reshape(nc, 3)
    w = (A @ lam.reshape(-1)).reshape(nc, 3)               # w = A lam

    def sweep(_, carry):
        lam, w = carry
        for i in range(nc):                                # static unroll
            v = w[i] + b_blk[i]                            # (3,)
            li = lam[i]
            ln_new = (
                jnp.maximum(li[2] - (v[2] + bias[i]) * inv_d[i, 2], 0.0)
                * active[i]
            )
            dn = ln_new - li[2]
            vt1 = v[0] + D[i, 0, 2] * dn
            vt2 = v[1] + D[i, 1, 2] * dn
            lt1 = li[0] - vt1 * inv_d[i, 0]
            lt2 = li[1] - vt2 * inv_d[i, 1]
            tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
            scale = jnp.minimum(1.0, mu[i] * ln_new / tn) * active[i]
            new_i = jnp.stack([lt1 * scale, lt2 * scale, ln_new])
            delta = new_i - li                             # (3,)
            # w += (A[:, 3i:3i+3] @ delta) == (delta @ A_blk[i]) by symmetry
            w = w + (delta @ A_blk[i]).reshape(nc, 3)
            lam = lam.at[i].set(new_i)                     # leading-dim update
        return lam, w

    lam, _ = lax.fori_loop(0, params.iterations, sweep, (lam, w))
    return lam * active[:, None]
