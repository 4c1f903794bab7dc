"""Pallas TPU kernel: fused Delassus assembly + PGS contact solve.

Production path for the contact NCP (SURVEY.md §7.3 hard part #1). The XLA
fallback (sim/solver.py) re-reads the (N, 3nc, 3nc) Delassus operator from
HBM on every one of iterations*nc sequential PGS updates — O(GB) of traffic
per control step at N=4096. This kernel instead:

  * tiles the env batch (grid over N/TILE envs),
  * computes A = E M^-1 E^T IN VMEM from E (3nc x nv) and the pre-solved
    M^-1 E^T (nv x 3nc) — A never touches HBM,
  * runs all PGS sweeps on the VMEM-resident A with the impulse vector in
    registers/VMEM,
  * writes only the (nc, 3) impulses back.

HBM traffic per substep drops to one pass over E/minvEt (~30 MB at N=4096)
instead of ~6 GB.

Env-batch layout inside the kernel: the env axis is the LANE axis (size-128
tiles) and constraint rows live on sublanes, so every vector op below is a
(rows, TILE_N) VPU op — contacts are solved for 128 envs simultaneously per
grid step; the sequential PGS recurrence is over rows only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # env tile = lane width


def _pgs_kernel(
    # refs: (TILE_N leading is transposed to trailing for lane layout)
    E_ref,        # (3nc, nv, TILE_N)
    W_ref,        # (nv, 3nc, TILE_N)  = M^-1 E^T
    b_ref,        # (3nc, TILE_N)
    bias_ref,     # (nc, TILE_N)
    active_ref,   # (nc, TILE_N)
    mu_ref,       # (1, TILE_N)
    lam0_ref,     # (3nc, TILE_N)
    lam_out_ref,  # (3nc, TILE_N)
    A_scratch,    # (3nc, 3nc, TILE_N) VMEM
    w_scratch,    # (3nc, TILE_N) VMEM
    *,
    nc: int,
    nv: int,
    iterations: int,
    cfm: float,
):
    n3 = 3 * nc
    # ---- A = E @ (M^-1 E^T) per env, env on lanes ----
    # A[i, j, n] = sum_k E[i, k, n] * W[k, j, n]
    E = E_ref[:]                       # (3nc, nv, T)
    W = W_ref[:]                       # (nv, 3nc, T)
    A = jax.lax.dot_general(
        E.transpose(2, 0, 1), W.transpose(2, 0, 1),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                   # (T, 3nc, 3nc)
    A = A.transpose(1, 2, 0)            # (3nc, 3nc, T)
    A_scratch[:] = A

    active = active_ref[:]              # (nc, T)
    lam0 = lam0_ref[:]                  # (3nc, T)
    lam = lam0 * jnp.repeat(active, 3, axis=0)
    # w = A @ lam (per env)
    w = jnp.einsum(
        "ijn,jn->in", A_scratch[:], lam,
        preferred_element_type=jnp.float32,
    )
    w_scratch[:] = w

    b = b_ref[:]
    bias = bias_ref[:]
    mu = mu_ref[0, :]

    inv = []
    for c in range(nc):
        k = 3 * c
        inv.append(
            (1.0 / (A_scratch[k, k, :] + cfm),
             1.0 / (A_scratch[k + 1, k + 1, :] + cfm),
             1.0 / (A_scratch[k + 2, k + 2, :] + cfm))
        )

    def contact_update(lam, c):
        k = 3 * c
        w = w_scratch[:]
        v0 = w[k, :] + b[k, :]
        v1 = w[k + 1, :] + b[k + 1, :]
        v2 = w[k + 2, :] + b[k + 2, :]
        l0, l1, l2 = lam[k, :], lam[k + 1, :], lam[k + 2, :]
        it1, it2, idn = inv[c]
        ln_new = jnp.maximum(l2 - (v2 + bias[c, :]) * idn, 0.0) * active[c, :]
        dn = ln_new - l2
        vt1 = v0 + A_scratch[k, k + 2, :] * dn
        vt2 = v1 + A_scratch[k + 1, k + 2, :] * dn
        lt1 = l0 - vt1 * it1
        lt2 = l1 - vt2 * it2
        tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
        scale = jnp.minimum(1.0, mu * ln_new / tn) * active[c, :]
        n0, n1, n2 = lt1 * scale, lt2 * scale, ln_new
        d0, d1, d2 = n0 - l0, n1 - l1, n2 - l2
        # rank-3 update of w: w += A[:, k:k+3] @ delta (per env)
        w_scratch[:] = (
            w
            + A_scratch[:, k, :] * d0[None, :]
            + A_scratch[:, k + 1, :] * d1[None, :]
            + A_scratch[:, k + 2, :] * d2[None, :]
        )
        lam = lam.at[k, :].set(n0).at[k + 1, :].set(n1).at[k + 2, :].set(n2)
        return lam

    for _ in range(iterations):
        for c in range(nc):
            lam = contact_update(lam, c)

    lam_out_ref[:] = lam


@functools.partial(
    jax.jit, static_argnames=("nc", "nv", "iterations", "cfm")
)
def pgs_solve_batched(
    E: jnp.ndarray,        # (N, 3nc, nv)
    minvEt: jnp.ndarray,   # (N, nv, 3nc)
    b: jnp.ndarray,        # (N, 3nc)
    bias: jnp.ndarray,     # (N, nc)
    active: jnp.ndarray,   # (N, nc) float
    mu: jnp.ndarray,       # (N,)
    lam0: jnp.ndarray,     # (N, nc, 3)
    *,
    nc: int, nv: int, iterations: int = 8, cfm: float = 1e-4,
) -> jnp.ndarray:
    """Batched PGS via the Pallas kernel. N must be a multiple of TILE_N."""
    N = E.shape[0]
    assert N % TILE_N == 0, N
    n3 = 3 * nc
    grid = (N // TILE_N,)

    # transpose env axis to lanes
    E_t = E.transpose(1, 2, 0)         # (3nc, nv, N)
    W_t = minvEt.transpose(1, 2, 0)    # (nv, 3nc, N)
    b_t = b.T                          # (3nc, N)
    bias_t = bias.T
    active_t = active.T
    mu_t = mu[None, :]
    lam0_t = lam0.reshape(N, n3).T

    kernel = functools.partial(
        _pgs_kernel, nc=nc, nv=nv, iterations=iterations, cfm=cfm
    )
    lam_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n3, nv, TILE_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, n3, TILE_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, TILE_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n3, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n3, n3, TILE_N), jnp.float32),
            pltpu.VMEM((n3, TILE_N), jnp.float32),
        ],
    )(E_t, W_t, b_t, bias_t, active_t, mu_t, lam0_t)

    return lam_t.T.reshape(N, nc, 3)
