"""Physics-engine integration tests: drop/settle, statics, sensors.

These replace the trust the reference places in PhysX (SURVEY.md §4): the
robot must stand under PD control at the reference gains, contact must
support weight without penetration or sliding, and the contact sensor
state machines must behave.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.models.solo12 import SOLO12_KD, SOLO12_KP, solo12_model
from cat_tpu.sim import engine as em
from cat_tpu.sim.engine import EngineParams


@pytest.fixture(scope="module")
def settled():
    """4 envs dropped from default pose and PD-held for 1.5 s."""
    model = solo12_model()
    params = EngineParams(kp=SOLO12_KP, kd=SOLO12_KD)
    step = jax.jit(em.make_batched_step(model, params, num_envs=4))
    s = em.make_batched_init(model, 4)
    target = jnp.broadcast_to(jnp.asarray(model.default_qpos_joints), (4, 12))
    mu = jnp.full((4,), 1.0)
    for _ in range(75):  # 75 ctrl steps = 1.5 s
        s = step(s, target, mu)
    return model, s


def test_robot_stands(settled):
    model, s = settled
    z = np.array(s.qpos[:, 2])
    assert np.all(z > 0.15) and np.all(z < 0.40), f"bad stand height {z}"
    # base nearly level: quaternion close to identity-ish tilt
    quat = np.array(s.qpos[:, 3:7])
    tilt = 2 * np.sqrt(quat[:, 1] ** 2 + quat[:, 2] ** 2)
    assert np.all(tilt < 0.2), f"tilted {tilt}"
    # velocities ~ 0
    assert np.all(np.abs(np.array(s.qvel)) < 0.5)


def test_no_deep_penetration(settled):
    model, s = settled
    # feet (spheres r=0.02) should not sink below the slop depth
    from cat_tpu.sim import collision, dynamics
    anc = model.ancestor_mask()
    kin = jax.vmap(lambda q, v: dynamics.fk(model, q, v))(s.qpos, s.qvel)
    con = jax.vmap(lambda k: collision.detect_plane_contacts(model, k, anc))(kin)
    phi = np.array(con.phi)
    assert phi.min() > -0.02, f"deep penetration {phi.min()}"


def test_contact_forces_support_weight(settled):
    model, s = settled
    total_fz = np.array(
        s.forces.reshape(4, model.nreport, 3)[:, :, 2].sum(axis=1)
    )
    weight = model.mass.sum() * 9.81
    np.testing.assert_allclose(total_fz, weight, rtol=0.25)


def test_no_horizontal_sliding(settled):
    model, s = settled
    xy = np.array(s.qpos[:, 0:2])
    assert np.all(np.abs(xy) < 0.25), f"robot slid {xy}"


def test_contact_time_tracking(settled):
    model, s = settled
    # all four feet on the ground for a while
    assert np.all(np.array(s.current_contact_time) > 0.2)
    assert np.all(np.array(s.current_air_time) == 0.0)


def test_foot_forces_reported_on_feet_only(settled):
    model, s = settled
    f = np.array(s.forces.reshape(4, model.nreport, 3))
    feet = model.foot_report_ids
    # feet carry the load
    assert np.all(np.linalg.norm(f[:, feet], axis=-1).sum(axis=1) > 10.0)
    # base/upper legs see ~no force when standing
    upper = [i for i, n in enumerate(model.report_names) if "UPPER" in n]
    assert np.all(np.linalg.norm(f[:, upper], axis=-1) < 1.0)
