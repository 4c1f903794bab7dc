"""Equivalence of the env-on-lanes engine (engine_lanes.py, the TPU
production layout) against the vmap reference engine (engine.py), which is
itself analytically validated (tests/test_dynamics.py).

Each stage (FK, Jacobians, M, C, Minv, contacts) and the full control step
must agree to float32 tolerance on identical inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.models.solo12 import solo12_model
from cat_tpu.sim import dynamics, dynamics_lanes as dl, engine as em
from cat_tpu.sim.engine import EngineParams
from cat_tpu.sim.terrain import plane

N = 4


def _states():
    """A batch of varied, physically plausible states."""
    model = solo12_model()
    rng = np.random.default_rng(0)
    qpos = np.tile(model.default_qpos(), (N, 1)).astype(np.float32)
    qpos[:, 0:3] += rng.uniform(-0.1, 0.1, (N, 3))
    # random small rotations
    ang = rng.uniform(-0.3, 0.3, (N, 3))
    from cat_tpu.sim.maths import quat_from_euler_zyx
    q = np.asarray(quat_from_euler_zyx(*map(jnp.asarray, ang.T)))
    qpos[:, 3:7] = q
    qpos[:, 7:] += rng.uniform(-0.3, 0.3, (N, model.nj))
    qvel = rng.uniform(-1.0, 1.0, (N, model.nv)).astype(np.float32)
    return model, jnp.asarray(qpos), jnp.asarray(qvel)


def test_dynamics_stages_match():
    model, qpos, qvel = _states()
    anc = model.ancestor_mask()

    kin_ref = jax.vmap(lambda q, v: dynamics.fk(model, q, v))(qpos, qvel)
    kinL = dl.fk_lanes(model, qpos.T, qvel.T)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(kinL.R), -1, 0), np.asarray(kin_ref.R),
        atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(kinL.x_com), -1, 0), np.asarray(kin_ref.x_com),
        atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(kinL.omega), -1, 0), np.asarray(kin_ref.omega),
        atol=1e-5)

    jacs_ref = jax.vmap(lambda k: dynamics.body_jacobians(model, k, anc))(
        kin_ref)
    jacsL = dl.body_jacobians_lanes(model, kinL, anc)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(jacsL.Jv), -1, 0), np.asarray(jacs_ref.Jv),
        atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(jacsL.Jw), -1, 0), np.asarray(jacs_ref.Jw),
        atol=1e-5)

    Iw_ref = jax.vmap(lambda k: dynamics.world_inertias(model, k))(kin_ref)
    IwL = dl.world_inertias_lanes(model, kinL)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(IwL), -1, 0), np.asarray(Iw_ref), atol=1e-7)

    M_ref = jax.vmap(lambda j, i: dynamics.mass_matrix(model, j, i))(
        jacs_ref, Iw_ref)
    ML = dl.mass_matrix_lanes(model, jacsL, IwL)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ML), -1, 0), np.asarray(M_ref),
        rtol=1e-4, atol=1e-5)

    C_ref = jax.vmap(
        lambda k, j, i, v: dynamics.bias_forces(model, k, j, i, v)
    )(kin_ref, jacs_ref, Iw_ref, qvel)
    CL = dl.bias_forces_lanes(model, kinL, jacsL, IwL, qvel.T)
    np.testing.assert_allclose(
        np.asarray(CL).T, np.asarray(C_ref), rtol=1e-4, atol=1e-4)

    Minv_ref = jax.vmap(
        lambda M: dynamics.mass_matrix_inverse(M, n_branch=model.nj // 3)
    )(M_ref)
    MinvL = dl.mass_matrix_inverse_lanes(ML, n_branch=model.nj // 3)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(MinvL), -1, 0), np.asarray(Minv_ref),
        rtol=2e-3, atol=2e-3)


def test_contacts_match_plane():
    from cat_tpu.sim import collision

    model, qpos, qvel = _states()
    anc = model.ancestor_mask()
    terr = plane()
    kin_ref = jax.vmap(lambda q, v: dynamics.fk(model, q, v))(qpos, qvel)
    con_ref = jax.vmap(
        lambda k: collision.detect_contacts(model, terr, k, anc)
    )(kin_ref)
    kinL = dl.fk_lanes(model, qpos.T, qvel.T)
    conL = dl.detect_contacts_lanes(model, terr, kinL, anc)
    np.testing.assert_allclose(
        np.asarray(conL.phi).T, np.asarray(con_ref.phi), atol=1e-5)
    E_ref = np.asarray(con_ref.J).reshape(N, 3 * model.ncand, model.nv)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(conL.E), -1, 0), E_ref, atol=1e-5)


def test_contacts_match_hfield():
    from cat_tpu.sim import collision
    from cat_tpu.sim.terrain import generate_rough

    model, qpos, qvel = _states()
    anc = model.ancestor_mask()
    terr = generate_rough(rows=2, cols=2, patch_m=4.0, seed=3)
    kin_ref = jax.vmap(lambda q, v: dynamics.fk(model, q, v))(qpos, qvel)
    con_ref = jax.vmap(
        lambda k: collision.detect_contacts(model, terr, k, anc)
    )(kin_ref)
    kinL = dl.fk_lanes(model, qpos.T, qvel.T)
    conL = dl.detect_contacts_lanes(model, terr, kinL, anc)
    np.testing.assert_allclose(
        np.asarray(conL.phi).T, np.asarray(con_ref.phi), atol=1e-5)
    E_ref = np.asarray(con_ref.J).reshape(N, 3 * model.ncand, model.nv)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(conL.E), -1, 0), E_ref, atol=2e-5)


@pytest.mark.slow
def test_full_control_step_matches():
    """10 chained control steps: lanes and vmap trajectories stay together."""
    model, qpos, qvel = _states()
    params = EngineParams()
    step_ref = jax.jit(em.make_batched_step(model, params, layout="vmap"))
    step_ln = jax.jit(em.make_batched_step(model, params, layout="lanes"))

    s0 = em.make_batched_init(model, N)
    s0 = s0._replace(qpos=qpos, qvel=qvel * 0.2)
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.uniform(0.6, 1.2, N).astype(np.float32))

    s_ref, s_ln = s0, s0
    for i in range(10):
        target = jnp.asarray(
            np.tile(model.default_qpos_joints, (N, 1)).astype(np.float32)
            + 0.1 * np.sin(0.3 * i)
        )
        s_ref = step_ref(s_ref, target, mu)
        s_ln = step_ln(s_ln, target, mu)

    np.testing.assert_allclose(
        np.asarray(s_ln.qpos), np.asarray(s_ref.qpos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(s_ln.qvel), np.asarray(s_ref.qvel), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(s_ln.forces), np.asarray(s_ref.forces),
        rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(
        np.asarray(s_ln.touchdown), np.asarray(s_ref.touchdown))


@pytest.mark.slow
def test_full_control_step_matches_with_com_offset():
    """CoM-randomization path parity between layouts."""
    model, qpos, qvel = _states()
    params = EngineParams()
    step_ref = jax.jit(em.make_batched_step(model, params, layout="vmap"))
    step_ln = jax.jit(em.make_batched_step(model, params, layout="lanes"))
    s0 = em.make_batched_init(model, N)
    s0 = s0._replace(qpos=qpos)
    rng = np.random.default_rng(2)
    mu = jnp.ones(N)
    com = jnp.asarray(
        rng.uniform(-0.01, 0.01, (N, model.nbody, 3)).astype(np.float32))
    target = jnp.asarray(
        np.tile(model.default_qpos_joints, (N, 1)).astype(np.float32))
    s_ref, s_ln = s0, s0
    for _ in range(5):
        s_ref = step_ref(s_ref, target, mu, com)
        s_ln = step_ln(s_ln, target, mu, com)
    np.testing.assert_allclose(
        np.asarray(s_ln.qpos), np.asarray(s_ref.qpos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(s_ln.qvel), np.asarray(s_ref.qvel), atol=2e-2)
