"""Batched contact impulse solver: regularized projected Gauss-Seidel (PGS)
on the per-env Delassus operator, with friction cones and warm starting.

TPU-native replacement for the PhysX PGS rigid-contact solver the reference
configures (solver_type 0 = PGS, 4 position + 1 velocity iterations,
cat_flat_env_cfg.py:483-487). Design notes:

  * Fixed-size candidate set with masking (no dynamic shapes under jit).
  * Velocity-impulse NCP with Baumgarte stabilization (ERP) and constraint
    regularization (CFM) — the soft-constraint trick that keeps the sweep
    well-conditioned when the Delassus diagonal is small.
  * Contact frame == world frame for the plane terrain (normal = +z), so the
    Jacobian rows are world xyz and component 2 is the normal.
  * Warm-started from the previous step's impulses (carried in SimState), the
    standard PhysX trick that lets few sweeps converge.
  * The sweep maintains w = A @ lam incrementally with dense rank-3 updates
    (no scatters into A) inside nested ``lax.fori_loop``s — compact XLA
    program, fused over the env batch. A Pallas VMEM-resident version is the
    planned production kernel (cat_tpu/ops).

All functions single-env; vmapped by the engine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SolverParams(NamedTuple):
    iterations: int = 8          # PGS sweeps (PhysX runs 4 pos + 1 vel)
    erp: float = 0.2             # penetration correction per step
    cfm: float = 1e-4            # constraint regularization
    slop: float = 0.002          # penetration tolerance (m)
    margin: float = 0.0          # activation distance


def pgs_solve(
    A: jnp.ndarray,          # (3nc, 3nc) Delassus J M^-1 J^T
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

    # Baumgarte bias on normal components: drives penetration out
    bias = (params.erp / h) * jnp.minimum(phi + params.slop, 0.0)  # (nc,) <= 0
    mu = jnp.broadcast_to(mu, (nc,))

    diag = jnp.diagonal(A).reshape(nc, 3)
    inv_d = 1.0 / (diag + params.cfm)                     # (nc, 3)
    # normal->tangent coupling entries A[t, n] of each diagonal block
    blk_tn = jnp.stack(
        [A[jnp.arange(0, n3, 3), jnp.arange(2, n3, 3)],
         A[jnp.arange(1, n3, 3), jnp.arange(2, n3, 3)]], axis=1
    )  # (nc, 2)

    w = A @ lam.reshape(-1)                               # (3nc,)

    def contact_body(i, carry):
        lam, w = carry
        k = 3 * i
        v = lax.dynamic_slice(w, (k,), (3,)) + lax.dynamic_slice(b, (k,), (3,))
        li = lax.dynamic_slice(lam, (i, 0), (1, 3))[0]
        # normal impulse (projected to >= 0)
        ln_new = jnp.maximum(li[2] - (v[2] + bias[i]) * inv_d[i, 2], 0.0)
        ln_new = ln_new * active[i]
        dn = ln_new - li[2]
        # tangentials, accounting for the just-applied normal delta
        vt1 = v[0] + blk_tn[i, 0] * dn
        vt2 = v[1] + blk_tn[i, 1] * dn
        lt1 = li[0] - vt1 * inv_d[i, 0]
        lt2 = li[1] - vt2 * inv_d[i, 1]
        # friction cone projection
        tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
        scale = jnp.minimum(1.0, mu[i] * ln_new / tn) * active[i]
        new_i = jnp.stack([lt1 * scale, lt2 * scale, ln_new])
        delta = new_i - li
        Acol = lax.dynamic_slice(A, (0, k), (n3, 3))
        w = w + Acol @ delta
        lam = lax.dynamic_update_slice(lam, new_i[None], (i, 0))
        return lam, w

    def sweep(_, carry):
        return lax.fori_loop(0, nc, contact_body, carry)

    lam, _ = lax.fori_loop(0, params.iterations, sweep, (lam, w))
    return lam * active[:, None]
