"""Pallas PGS kernel vs the XLA reference solver (interpret mode on CPU)."""

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
    return J, (Minv @ J.T).astype(np.float32), A, b, phi, lam0


@pytest.mark.slow
def test_pallas_kernel_matches_reference():
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(0)
    nc, nv = 4, 6
    N = pgs_pallas.TILE_N  # one tile
    params = SolverParams(iterations=6)
    h = 0.005

    Es, Ws, bs, lam_refs, phis = [], [], [], [], []
    mu = np.full(N, 0.8, dtype=np.float32)
    for i in range(N):
        J, minvJt, A, b, phi, lam0 = _random_problem(rng, nc, nv)
        lam_ref = pgs_solve(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(phi),
            jnp.asarray(mu[i]), jnp.asarray(lam0), h, params,
        )
        Es.append(J); Ws.append(minvJt); bs.append(b); phis.append(phi)
        lam_refs.append(np.asarray(lam_ref))

    phi_all = np.stack(phis)
    bias = (params.erp / h) * np.minimum(phi_all + params.slop, 0.0)
    active = (phi_all < params.margin).astype(np.float32)
    lam_pal = pgs_pallas.pgs_solve_batched(
        jnp.asarray(np.stack(Es)), jnp.asarray(np.stack(Ws)),
        jnp.asarray(np.stack(bs)), jnp.asarray(bias), jnp.asarray(active),
        jnp.asarray(mu), jnp.zeros((N, nc, 3), jnp.float32),
        nc=nc, nv=nv, iterations=params.iterations, cfm=params.cfm,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(lam_pal), np.stack(lam_refs), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_row_dofs_sparse_assembly_matches_dense():
    """Static row-sparsity (contact_row_dofs) must be exact: zeroing the
    masked E columns and passing their dof sets gives identical impulses
    to the dense kernel."""
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(1)
    nc, nv = 4, 10
    N = pgs_pallas.TILE_N
    params = SolverParams(iterations=5)
    h = 0.005

    # per-row dof sets: base(0..3) + one of two "legs"
    sets = [
        (0, 1, 2, 3, 4, 5, 6),
        (0, 1, 2, 3, 7, 8, 9),
    ]
    row_dofs = tuple(sets[i % 2] for i in range(nc) for _ in range(3))

    Es, Ws, bs, phis = [], [], [], []
    mu = np.full(N, 0.7, dtype=np.float32)
    for i in range(N):
        J, minvJt, A, b, phi, lam0 = _random_problem(rng, nc, nv)
        # impose the sparsity pattern on J's rows
        for r in range(3 * nc):
            keep = np.zeros(nv, np.float32)
            keep[list(row_dofs[r])] = 1.0
            J[r] *= keep
        Es.append(J); phis.append(phi)
    # rebuild W/b from the sparsified J with a fresh SPD mass matrix
    Mchol = rng.normal(size=(nv, nv)).astype(np.float32)
    M = Mchol @ Mchol.T + nv * np.eye(nv, dtype=np.float32)
    Minv = np.linalg.inv(M).astype(np.float32)
    v = rng.normal(size=nv).astype(np.float32)
    Ws = [(Minv @ J.T).astype(np.float32) for J in Es]
    bs = [J @ v for J in Es]

    phi_all = np.stack(phis)
    bias = np.maximum(
        (params.erp / h) * np.minimum(phi_all + params.slop, 0.0),
        -params.max_depen_vel,
    )
    active = (phi_all < params.margin).astype(np.float32)

    def run(rd):
        return np.asarray(pgs_pallas.pgs_solve_batched(
            jnp.asarray(np.stack(Es)), jnp.asarray(np.stack(Ws)),
            jnp.asarray(np.stack(bs)), jnp.asarray(bias),
            jnp.asarray(active), jnp.asarray(mu),
            jnp.zeros((N, nc, 3), jnp.float32),
            nc=nc, nv=nv, iterations=params.iterations, cfm=params.cfm,
            interpret=True, row_dofs=rd,
        ))

    np.testing.assert_allclose(run(row_dofs), run(None), rtol=1e-6, atol=1e-7)


def _lanes_problem(rng, nc=6, nv=10, N=40, warm=False):
    """Stacked lanes-layout problem set (interleaved rows)."""
    from cat_tpu.sim.solver import SolverParams

    params = SolverParams(iterations=6)
    h = 0.005
    Es, Ws, bs, phis = [], [], [], []
    mu = rng.uniform(0.4, 1.2, size=N).astype(np.float32)
    for _ in range(N):
        J, minvJt, A, b, phi, lam0 = _random_problem(rng, nc, nv)
        Es.append(J); Ws.append(minvJt); bs.append(b); phis.append(phi)
    phi_all = np.stack(phis)
    bias = np.maximum(
        (params.erp / h) * np.minimum(phi_all + params.slop, 0.0),
        -params.max_depen_vel,
    )
    active = (phi_all < params.margin).astype(np.float32)
    lam0 = (
        rng.uniform(0.0, 0.1, size=(3 * nc, N)).astype(np.float32)
        if warm else np.zeros((3 * nc, N), np.float32)
    )
    return (
        jnp.asarray(np.stack(Es).transpose(1, 2, 0)),
        jnp.asarray(np.stack(Ws).transpose(1, 2, 0)),
        jnp.asarray(np.stack(bs).T),
        jnp.asarray(bias.T),
        jnp.asarray(active.T),
        jnp.asarray(mu),
        jnp.asarray(lam0),
        params,
    )


@pytest.mark.slow
def test_bj_singleton_blocks_equals_gs():
    """blocks=((0,1),(1,1),...) with omega=1 is mathematically the serial
    Gauss-Seidel sweep: the bj kernel must reproduce the GS kernel."""
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(7)
    nc, nv, N = 6, 10, 40
    E_t, W_t, b_t, bias_t, act_t, mu, lam0_t, params = _lanes_problem(
        rng, nc, nv, N, warm=True
    )
    lam_gs = pgs_pallas.pgs_solve_lanes(
        E_t, W_t, b_t, bias_t, act_t, mu[None, :], lam0_t,
        nc=nc, nv=nv, iterations=params.iterations, cfm=params.cfm,
        interpret=True,
    )
    lam_bj = pgs_pallas.pgs_solve_lanes_bj(
        E_t, W_t, b_t, bias_t, act_t, mu[None, :], lam0_t,
        nc=nc, nv=nv, iterations=params.iterations, cfm=params.cfm,
        omega=1.0, blocks=tuple((i, 1) for i in range(nc)),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(lam_bj), np.asarray(lam_gs), rtol=2e-5, atol=2e-6
    )


@pytest.mark.slow
def test_bj_kernel_matches_mirror():
    """The bj Pallas kernel (interpret) and the pure-XLA mirror share the
    _bj_sweeps core but assemble A differently — outputs must agree,
    including with a nontrivial contact permutation."""
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(8)
    nc, nv, N = 6, 10, 40
    E_t, W_t, b_t, bias_t, act_t, mu, lam0_t, params = _lanes_problem(
        rng, nc, nv, N, warm=True
    )
    perm = (3, 0, 4, 1, 5, 2)
    blocks = ((0, 3), (3, 3))
    lam_k = pgs_pallas.pgs_solve_lanes_bj(
        E_t, W_t, b_t, bias_t, act_t, mu[None, :], lam0_t,
        nc=nc, nv=nv, iterations=8, cfm=params.cfm,
        omega=0.8, contact_perm=perm, blocks=blocks, interpret=True,
    )
    lam_m = pgs_pallas.pgs_lanes_xla_bj(
        E_t, W_t, b_t, bias_t, act_t, mu, lam0_t,
        nc=nc, iterations=8, cfm=params.cfm,
        omega=0.8, contact_perm=perm, blocks=blocks,
    )
    np.testing.assert_allclose(
        np.asarray(lam_k), np.asarray(lam_m), rtol=2e-5, atol=2e-6
    )


@pytest.mark.slow
def test_bj_velocity_residual_comparable_to_gs():
    """On random problems the friction NCP's impulse solution is not unique
    (degenerate same-body contacts), so the meaningful convergence metric is
    the VELOCITY-space residual: post-solve normal approach speed on active
    contacts. Blocked-Jacobi must land in the same residual regime as the
    shipped GS-5 budget. (Physical-problem scoring lives in
    tools/pgs_structure_probe.py — this is the math sanity tier.)"""
    from cat_tpu.ops import pgs_pallas

    rng = np.random.default_rng(9)
    nc, nv, N = 6, 10, 64
    E_t, W_t, b_t, bias_t, act_t, mu, lam0_t, params = _lanes_problem(
        rng, nc, nv, N
    )
    A = np.einsum("rkn,kcn->rcn", np.asarray(E_t), np.asarray(W_t))

    def vn_viol(lam):
        lam = np.asarray(lam)
        w = np.einsum("rcn,cn->rn", A, lam)
        vn = (w + np.asarray(b_t))[2::3] + np.asarray(bias_t)
        return float((np.maximum(-vn, 0.0) * np.asarray(act_t)).max())

    viol_gs = vn_viol(pgs_pallas.pgs_lanes_xla_bj(
        E_t, W_t, b_t, bias_t, act_t, mu, lam0_t,
        nc=nc, iterations=5, cfm=params.cfm,
        omega=1.0, blocks=tuple((i, 1) for i in range(nc)),
    ))
    viol_bj = vn_viol(pgs_pallas.pgs_lanes_xla_bj(
        E_t, W_t, b_t, bias_t, act_t, mu, lam0_t,
        nc=nc, iterations=10, cfm=params.cfm,
        omega=0.7, blocks=((0, 3), (3, 3)),
    ))
    # comparable residual: within 2x of GS-5 plus an absolute floor
    assert viol_bj < 2.0 * viol_gs + 0.05, (viol_bj, viol_gs)
