"""Pallas PGS kernel vs the XLA reference solver (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.sim.solver import SolverParams, pgs_solve


def _random_problem(rng, nc=4, nv=6):
    """Small random contact problem with PSD Delassus."""
    J = rng.normal(size=(3 * nc, nv)).astype(np.float32)
    Mchol = rng.normal(size=(nv, nv)).astype(np.float32)
    M = Mchol @ Mchol.T + nv * np.eye(nv, dtype=np.float32)
    Minv = np.linalg.inv(M)
    A = J @ Minv @ J.T
    v = rng.normal(size=nv).astype(np.float32)
    b = J @ v
    phi = rng.uniform(-0.01, 0.01, size=nc).astype(np.float32)
    lam0 = np.zeros((nc, 3), dtype=np.float32)
    return J, Minv @ J.T, A, b, phi, lam0


@pytest.mark.slow
def test_pallas_kernel_matches_reference():
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(0)
    nc, nv = 4, 6
    N = pgs_pallas.TILE_N  # one tile
    params = SolverParams(iterations=6)
    h = 0.005

    Es, Ws, bs, biases, actives, lam_refs = [], [], [], [], [], []
    mu = np.full(N, 0.8, dtype=np.float32)
    for i in range(N):
        J, minvJt, A, b, phi, lam0 = _random_problem(rng, nc, nv)
        lam_ref = pgs_solve(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(phi),
            jnp.asarray(mu[i]), jnp.asarray(lam0), h, params,
        )
        Es.append(J); Ws.append(minvJt); bs.append(b)
        biases.append((params.erp / h) * np.minimum(phi + params.slop, 0.0))
        actives.append((phi < params.margin).astype(np.float32))
        lam_refs.append(np.asarray(lam_ref))

    solve = functools.partial(
        pgs_pallas.pgs_solve_batched,
        nc=nc, nv=nv, iterations=params.iterations, cfm=params.cfm,
    )
    with jax.disable_jit():  # run pallas_call in interpret-friendly eager
        import jax.experimental.pallas as pl  # noqa: F401
        lam_pal = _interpret_solve(
            np.stack(Es), np.stack(Ws), np.stack(bs), np.stack(biases),
            np.stack(actives), mu, np.zeros((N, nc, 3), np.float32),
            nc, nv, params,
        )
    np.testing.assert_allclose(
        lam_pal, np.stack(lam_refs), rtol=2e-4, atol=2e-5
    )


def _interpret_solve(E, W, b, bias, active, mu, lam0, nc, nv, params):
    """Invoke the kernel logic via pallas interpret mode."""
    import functools as ft

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cat_tpu.ops.pgs_pallas import TILE_N, _pgs_kernel

    N = E.shape[0]
    n3 = 3 * nc
    kernel = ft.partial(
        _pgs_kernel, nc=nc, nv=nv, iterations=params.iterations,
        cfm=params.cfm,
    )
    lam_t = pl.pallas_call(
        kernel,
        grid=(N // TILE_N,),
        in_specs=[
            pl.BlockSpec((n3, nv, TILE_N), lambda i: (0, 0, i)),
            pl.BlockSpec((nv, n3, TILE_N), lambda i: (0, 0, i)),
            pl.BlockSpec((n3, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((nc, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((nc, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((n3, TILE_N), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n3, TILE_N), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n3, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n3, n3, TILE_N), jnp.float32),
            pltpu.VMEM((n3, TILE_N), jnp.float32),
        ],
        interpret=True,
    )(
        jnp.asarray(E).transpose(1, 2, 0),
        jnp.asarray(W).transpose(1, 2, 0),
        jnp.asarray(b).T,
        jnp.asarray(bias).T,
        jnp.asarray(active).T,
        jnp.asarray(mu)[None, :],
        jnp.asarray(lam0).reshape(N, n3).T,
    )
    return np.asarray(lam_t).T.reshape(N, nc, 3)
