"""Constraint term library: pure batched functions of StepData.

Re-implements the 15 constraint functions of the reference
(exts/cat_envs/cat_envs/tasks/utils/cat/constraints.py:23-235) as pure jnp
functions over the StepData pytree. Convention: positive value = violating
(the CaT transform maps positives to termination probabilities). Each term
returns (N,) or (N, K); joint/body index arrays are resolved at config-build
time (static numpy), mirroring Isaac Lab's SceneEntityCfg regex resolution.

Reference citations are per-function below.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import StepData


def _hist_force_norm(data: StepData, body_ids: np.ndarray) -> jnp.ndarray:
    """max-over-history contact force norms for report bodies: (N, K)."""
    f = data.force_hist[:, :, body_ids, :]          # (N, 3, K, 3)
    return jnp.max(jnp.linalg.norm(f, axis=-1), axis=1)


def _cmd_norm(data: StepData) -> jnp.ndarray:
    return jnp.linalg.norm(data.command, axis=-1)


def joint_position(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|q| - limit (reference constraints.py:23-31; used for front HFE)."""
    return jnp.abs(data.joint_pos[:, joint_ids]) - limit


def joint_position_when_moving_forward(
    data: StepData, *, limit: float, velocity_deadzone: float,
    joint_ids: np.ndarray,
):
    """|q - q_default| - limit, gated on |cmd_y| < deadzone
    (reference constraints.py:34-54 — gate is on the LATERAL command)."""
    cstr = (
        jnp.abs(data.joint_pos[:, joint_ids]
                - data.default_joint_pos[joint_ids]) - limit
    )
    gate = (jnp.abs(data.command[:, 1]) < velocity_deadzone).astype(cstr.dtype)
    return cstr * gate[:, None]


def joint_torque(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|tau_applied| - limit (reference constraints.py:57-65)."""
    return jnp.abs(data.applied_torque[:, joint_ids]) - limit


def joint_velocity(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|qd| - limit (reference constraints.py:68-75)."""
    return jnp.abs(data.joint_vel[:, joint_ids]) - limit


def joint_acceleration(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|qdd| - limit (reference constraints.py:78-85)."""
    return jnp.abs(data.joint_acc[:, joint_ids]) - limit


def upsidedown(data: StepData, *, limit: float):
    """gravity z-component in base frame > limit (constraints.py:88-94)."""
    return (data.projected_gravity[:, 2] > limit).astype(jnp.float32)


def contact(data: StepData, *, body_ids: np.ndarray):
    """any listed body sees max-history force norm > 1 N (constraints.py:97-110)."""
    return jnp.any(_hist_force_norm(data, body_ids) > 1.0, axis=1).astype(
        jnp.float32
    )


def base_orientation(data: StepData, *, limit: float):
    """|g_xy| - limit (constraints.py:113-119)."""
    return jnp.linalg.norm(data.projected_gravity[:, :2], axis=1) - limit


def air_time(
    data: StepData, *, limit: float, velocity_deadzone: float,
    body_ids: np.ndarray,
):
    """(limit - last_air_time) * touchdown, gated on |cmd| > deadzone
    (constraints.py:122-141). body_ids index the FEET slots."""
    touchdown = data.touchdown[:, body_ids].astype(jnp.float32)
    last_air = data.last_air_time[:, body_ids]
    gate = (_cmd_norm(data) > velocity_deadzone).astype(jnp.float32)
    return (limit - last_air) * touchdown * gate[:, None]


def n_foot_contact(
    data: StepData, *, number_of_desired_feet: int, min_command_value: float,
    body_ids: np.ndarray,
):
    """|#feet in contact - desired| when command is large (constraints.py:144-168)."""
    in_contact = _hist_force_norm(data, body_ids) > 1.0
    cstr = jnp.abs(
        in_contact.sum(axis=1).astype(jnp.float32) - number_of_desired_feet
    )
    gate = (_cmd_norm(data) > min_command_value).astype(jnp.float32)
    return cstr * gate


def joint_range(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|q - q_default| - limit (constraints.py:171-181)."""
    return (
        jnp.abs(data.joint_pos[:, joint_ids]
                - data.default_joint_pos[joint_ids]) - limit
    )


def action_rate(data: StepData, *, limit: float, joint_ids: np.ndarray):
    """|a - a_prev| / step_dt - limit on raw actions (constraints.py:184-198)."""
    return (
        jnp.abs(data.action[:, joint_ids] - data.prev_action[:, joint_ids])
        / data.step_dt - limit
    )


def foot_contact_force(data: StepData, *, limit: float, body_ids: np.ndarray):
    """max-history force norm - limit per foot (constraints.py:201-211)."""
    return _hist_force_norm(data, body_ids) - limit


def min_base_height(data: StepData, *, limit: float):
    """limit - base height (constraints.py:214-220)."""
    return limit - data.base_pos[:, 2]


def no_move(
    data: StepData, *, velocity_deadzone: float, joint_vel_limit: float,
    joint_ids: np.ndarray,
):
    """(|qd| - limit) when command is idle (constraints.py:223-235)."""
    gate = (_cmd_norm(data) < velocity_deadzone).astype(jnp.float32)
    return (
        (jnp.abs(data.joint_vel[:, joint_ids]) - joint_vel_limit)
        * gate[:, None]
    )
