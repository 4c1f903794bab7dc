"""Analytic validation of the articulated dynamics core.

The reference trusts PhysX; we cannot (SURVEY.md §4), so the dynamics are
validated against closed-form mechanics: free-fall, mass-matrix structure,
gravity generalized forces, energy conservation of a passive swing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.models.solo12 import solo12_model
from cat_tpu.sim import dynamics
from cat_tpu.sim.model import RobotModel


def _rand_state(model, rng, vel_scale=1.0):
    q = model.default_qpos()
    q[0:3] = rng.normal(size=3)
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.uniform(-0.5, 0.5, size=model.nj) + q[7:]
    v = rng.normal(size=model.nv) * vel_scale
    return jnp.asarray(q), jnp.asarray(v)


def _setup(qpos, qvel):
    model = solo12_model()
    anc = model.ancestor_mask()
    kin = dynamics.fk(model, qpos, qvel)
    jacs = dynamics.body_jacobians(model, kin, anc)
    I_w = dynamics.world_inertias(model, kin)
    return model, kin, jacs, I_w


def test_mass_matrix_symmetric_posdef():
    rng = np.random.default_rng(0)
    model = solo12_model()
    q, v = _rand_state(model, rng)
    model, kin, jacs, I_w = _setup(q, v)
    M = np.array(dynamics.mass_matrix(model, jacs, I_w))
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    eig = np.linalg.eigvalsh(M)
    assert eig.min() > 0, f"M not positive definite: min eig {eig.min()}"


def test_total_mass_in_linear_block():
    """The base-linear 3x3 block of M must equal total mass * I."""
    rng = np.random.default_rng(1)
    model = solo12_model()
    q, v = _rand_state(model, rng)
    model, kin, jacs, I_w = _setup(q, v)
    M = np.array(dynamics.mass_matrix(model, jacs, I_w))
    np.testing.assert_allclose(
        M[0:3, 0:3], model.mass.sum() * np.eye(3), atol=1e-6
    )


def test_kinetic_energy_vs_bodywise():
    """0.5 v^T M v must equal the sum of body kinetic energies from FK."""
    rng = np.random.default_rng(2)
    model = solo12_model()
    q, v = _rand_state(model, rng)
    model, kin, jacs, I_w = _setup(q, v)
    M = dynamics.mass_matrix(model, jacs, I_w)
    ke_M = 0.5 * float(v @ M @ v)
    # armature energy included in M; add to bodywise sum
    ke_arm = 0.5 * float(jnp.sum(jnp.asarray(model.armature) * v[6:] ** 2))
    v_com = jnp.einsum("bik,k->bi", jacs.Jv, v)
    omega = jnp.einsum("bik,k->bi", jacs.Jw, v)
    ke_body = 0.5 * float(
        jnp.sum(jnp.asarray(model.mass)[:, None] * v_com**2)
        + jnp.einsum("bi,bij,bj->", omega, I_w, omega)
    )
    np.testing.assert_allclose(ke_M, ke_body + ke_arm, rtol=1e-5)


def test_bodywise_velocities_match_fk():
    """Jw v must reproduce the FK-propagated body angular velocities."""
    rng = np.random.default_rng(3)
    model = solo12_model()
    q, v = _rand_state(model, rng)
    model, kin, jacs, I_w = _setup(q, v)
    omega_jac = jnp.einsum("bik,k->bi", jacs.Jw, v)
    np.testing.assert_allclose(np.array(omega_jac), np.array(kin.omega),
                               atol=1e-5)
    vcom_jac = jnp.einsum("bik,k->bi", jacs.Jv, v)
    vcom_fk = kin.v_o + jnp.cross(kin.omega, kin.x_com - kin.o)
    np.testing.assert_allclose(np.array(vcom_jac), np.array(vcom_fk), atol=1e-5)


def test_gravity_forces_match_jacobian_formula():
    """At v=0, C must equal -sum_b Jv_b^T m_b g (pure gravity load)."""
    rng = np.random.default_rng(4)
    model = solo12_model()
    q, _ = _rand_state(model, rng)
    v = jnp.zeros(model.nv)
    model, kin, jacs, I_w = _setup(q, v)
    C = dynamics.bias_forces(model, kin, jacs, I_w, v)
    g = jnp.asarray(dynamics.GRAVITY)
    C_expected = -jnp.einsum(
        "bik,bi->k", jacs.Jv, jnp.asarray(model.mass)[:, None] * g[None]
    )
    np.testing.assert_allclose(np.array(C), np.array(C_expected), atol=1e-5)


def test_free_fall_acceleration():
    """With zero torque and no contact, qacc must be pure free fall."""
    rng = np.random.default_rng(5)
    model = solo12_model()
    q, _ = _rand_state(model, rng, vel_scale=0.0)
    v = jnp.zeros(model.nv)
    model, kin, jacs, I_w = _setup(q, v)
    M = dynamics.mass_matrix(model, jacs, I_w)
    C = dynamics.bias_forces(model, kin, jacs, I_w, v)
    qacc = jnp.linalg.solve(M, -C)
    np.testing.assert_allclose(np.array(qacc[0:3]), dynamics.GRAVITY, atol=1e-4)
    # no spin, no joint acceleration induced purely by gravity at rest?
    # (coupling through off-diagonal M means joints DO accelerate; but total
    # momentum rate must equal m g)
    # check momentum rate: d/dt (sum m v_com) = M_total * g
    a_com = jnp.einsum("bik,k->bi", jacs.Jv, qacc)  # bias accel is 0 at v=0
    # bias accelerations at v=0 are exactly +(-g) trick... compute directly:
    total_force = jnp.sum(jnp.asarray(model.mass)[:, None] * a_com, axis=0)
    np.testing.assert_allclose(
        np.array(total_force), model.mass.sum() * dynamics.GRAVITY, atol=1e-3
    )


def test_passive_energy_conservation():
    """A frictionless passive swing in gravity (no contact) conserves energy.

    Integrates the unconstrained dynamics with small dt and checks drift.
    """
    model = solo12_model()
    anc = model.ancestor_mask()
    q = jnp.asarray(model.default_qpos()).at[2].set(5.0)  # high: no contact
    v = jnp.zeros(model.nv)
    # zero armature for a clean Hamiltonian check
    model0 = _strip_armature(model)
    h = 1e-4

    def energy(q, v):
        kin = dynamics.fk(model0, q, v)
        jacs = dynamics.body_jacobians(model0, kin, anc)
        I_w = dynamics.world_inertias(model0, kin)
        M = dynamics.mass_matrix(model0, jacs, I_w)
        ke = 0.5 * v @ M @ v
        pe = -jnp.sum(jnp.asarray(model0.mass) * (kin.x_com @ jnp.asarray(dynamics.GRAVITY)))
        return float(ke + pe)

    @jax.jit
    def step(q, v):
        kin = dynamics.fk(model0, q, v)
        jacs = dynamics.body_jacobians(model0, kin, anc)
        I_w = dynamics.world_inertias(model0, kin)
        M = dynamics.mass_matrix(model0, jacs, I_w)
        C = dynamics.bias_forces(model0, kin, jacs, I_w, v)
        qacc = jnp.linalg.solve(M, -C)
        v2 = v + h * qacc
        from cat_tpu.sim.maths import quat_integrate, quat_rotate
        pos = q[0:3] + h * v2[0:3]
        quat = quat_integrate(q[3:7], quat_rotate(q[3:7], v2[3:6]), h)
        qj = q[7:] + h * v2[6:]
        return jnp.concatenate([pos, quat, qj]), v2

    e0 = energy(q, v)
    for _ in range(500):
        q, v = step(q, v)
    e1 = energy(q, v)
    # semi-implicit Euler at 1e-4 s for 0.05 s: expect tiny drift
    assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0)), (e0, e1)


def _strip_armature(model: RobotModel) -> RobotModel:
    import dataclasses
    return dataclasses.replace(model, armature=np.zeros_like(model.armature))
