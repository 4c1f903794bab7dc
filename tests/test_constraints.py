"""Unit tests of constraint term functions against synthetic StepData
(SURVEY.md §4 layer 3 — each fn is a pure tensor fn of the state)."""

import jax.numpy as jnp
import numpy as np

from cat_tpu.envs import constraints as C
from cat_tpu.envs.types import StepData


def _data(**kw):
    n, nj, nr, nf = 2, 4, 3, 2
    z = jnp.zeros
    base = dict(
        joint_pos=z((n, nj)), joint_vel=z((n, nj)), joint_acc=z((n, nj)),
        applied_torque=z((n, nj)), default_joint_pos=z((nj,)),
        base_pos=z((n, 3)), base_yaw=z((n,)), base_lin_vel_b=z((n, 3)), base_ang_vel_b=z((n, 3)),
        projected_gravity=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1)),
        command=z((n, 3)), action=z((n, nj)), prev_action=z((n, nj)),
        force_hist=z((n, 3, nr, 3)), touchdown=z((n, nf), dtype=bool),
        last_air_time=z((n, nf)), step_dt=0.02,
    )
    base.update(kw)
    return StepData(**base)


def test_joint_torque():
    d = _data(applied_torque=jnp.array([[1.0, -4.0, 2.0, 0.0]] * 2))
    out = C.joint_torque(d, limit=3.0, joint_ids=np.array([0, 1]))
    np.testing.assert_allclose(np.array(out), [[-2.0, 1.0]] * 2)


def test_joint_position_when_moving_forward_gates_on_lateral_cmd():
    d = _data(
        joint_pos=jnp.array([[0.5, 0, 0, 0], [0.5, 0, 0, 0]]),
        command=jnp.array([[1.0, 0.0, 0.0], [1.0, 0.5, 0.0]]),
    )
    out = C.joint_position_when_moving_forward(
        d, limit=0.2, velocity_deadzone=0.1, joint_ids=np.array([0])
    )
    # env0: |cmd_y|=0 < 0.1 -> active: 0.5-0.2=0.3; env1 gated off
    np.testing.assert_allclose(np.array(out), [[0.3], [0.0]])


def test_upsidedown():
    d = _data(projected_gravity=jnp.array([[0, 0, -1.0], [0, 0, 0.5]]))
    out = C.upsidedown(d, limit=0.0)
    np.testing.assert_allclose(np.array(out), [0.0, 1.0])


def test_contact_uses_history_max():
    fh = jnp.zeros((2, 3, 3, 3))
    # env0: body1 had 2N force two substeps ago
    fh = fh.at[0, 0, 1, 2].set(2.0)
    d = _data(force_hist=fh)
    out = C.contact(d, body_ids=np.array([0, 1]))
    np.testing.assert_allclose(np.array(out), [1.0, 0.0])


def test_air_time():
    d = _data(
        touchdown=jnp.array([[True, False], [True, False]]),
        last_air_time=jnp.array([[0.1, 0.5], [0.4, 0.5]]),
        command=jnp.array([[0.5, 0, 0], [0.5, 0, 0]]),
    )
    out = C.air_time(d, limit=0.25, velocity_deadzone=0.1,
                     body_ids=np.array([0, 1]))
    # only touched-down feet count: env0 foot0: 0.25-0.1=0.15; env1: -0.15
    np.testing.assert_allclose(np.array(out), [[0.15, 0.0], [-0.15, 0.0]],
                               atol=1e-7)


def test_n_foot_contact():
    fh = jnp.zeros((2, 3, 3, 3))
    fh = fh.at[0, 2, 0, 2].set(5.0).at[0, 2, 1, 2].set(5.0)  # env0: 2 feet
    fh = fh.at[1, 2, 0, 2].set(5.0)                          # env1: 1 foot
    d = _data(force_hist=fh,
              command=jnp.array([[1.0, 0, 0], [1.0, 0, 0]]))
    out = C.n_foot_contact(d, number_of_desired_feet=2, min_command_value=0.5,
                           body_ids=np.array([0, 1, 2]))
    np.testing.assert_allclose(np.array(out), [0.0, 1.0])


def test_action_rate():
    d = _data(
        action=jnp.array([[1.0, 0, 0, 0]] * 2),
        prev_action=jnp.array([[0.0, 0, 0, 0]] * 2),
    )
    out = C.action_rate(d, limit=10.0, joint_ids=np.array([0]))
    np.testing.assert_allclose(np.array(out), [[40.0]] * 2)  # 1/0.02 - 10


def test_no_move_gates_on_idle():
    d = _data(
        joint_vel=jnp.array([[5.0, 0, 0, 0], [5.0, 0, 0, 0]]),
        command=jnp.array([[0.0, 0, 0], [1.0, 0, 0]]),
    )
    out = C.no_move(d, velocity_deadzone=0.1, joint_vel_limit=4.0,
                    joint_ids=np.array([0]))
    np.testing.assert_allclose(np.array(out), [[1.0], [0.0]])


def test_foot_contact_force():
    fh = jnp.zeros((1, 3, 3, 3)).at[0, 1, 2, 0].set(60.0)
    d = _data(force_hist=fh[:1])
    out = C.foot_contact_force(
        d._replace(force_hist=jnp.tile(fh[:1], (2, 1, 1, 1))),
        limit=50.0, body_ids=np.array([2]),
    )
    np.testing.assert_allclose(np.array(out), [[10.0]] * 2, rtol=1e-5)


def test_base_orientation_and_min_height():
    d = _data(
        projected_gravity=jnp.array([[0.3, 0.4, -0.87], [0, 0, -1.0]]),
        base_pos=jnp.array([[0, 0, 0.1], [0, 0, 0.5]]),
    )
    np.testing.assert_allclose(
        np.array(C.base_orientation(d, limit=0.1)), [0.4, -0.1], atol=1e-6
    )
    np.testing.assert_allclose(
        np.array(C.min_base_height(d, limit=0.2)),
        [0.1, -0.3], atol=1e-6,
    )
