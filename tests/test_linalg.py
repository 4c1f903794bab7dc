"""Unrolled Cholesky/solve vs scipy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.sim.dynamics import cholesky_factor, cholesky_solve


def _spd(rng, n):
    A = rng.normal(size=(n, n)).astype(np.float32)
    return A @ A.T + n * np.eye(n, dtype=np.float32)


def test_cholesky_factor_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (3, 18):
        M = _spd(rng, n)
        L = np.array(cholesky_factor(jnp.asarray(M)))
        np.testing.assert_allclose(L, np.linalg.cholesky(M), rtol=2e-4,
                                   atol=2e-4)


def test_cholesky_solve_vec_and_mat():
    rng = np.random.default_rng(1)
    n = 18
    M = _spd(rng, n)
    L = cholesky_factor(jnp.asarray(M))
    b = rng.normal(size=n).astype(np.float32)
    x = np.array(cholesky_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(M @ x, b, rtol=2e-3, atol=2e-3)
    B = rng.normal(size=(n, 7)).astype(np.float32)
    X = np.array(cholesky_solve(L, jnp.asarray(B)))
    np.testing.assert_allclose(M @ X, B, rtol=2e-3, atol=2e-3)


def test_batched_under_vmap():
    rng = np.random.default_rng(2)
    Ms = np.stack([_spd(rng, 18) for _ in range(8)])
    bs = rng.normal(size=(8, 18)).astype(np.float32)
    xs = jax.vmap(lambda M, b: cholesky_solve(cholesky_factor(M), b))(
        jnp.asarray(Ms), jnp.asarray(bs)
    )
    for i in range(8):
        np.testing.assert_allclose(Ms[i] @ np.array(xs[i]), bs[i],
                                   rtol=2e-3, atol=2e-3)
