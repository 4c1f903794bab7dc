"""Core pytree types for the CaT environment layer.

The reference's scene/manager object graph (Isaac Lab ManagerBasedRLEnv with
8 managers, SURVEY.md §1 L2-L4) becomes two pytrees: ``EnvState`` (everything
that evolves, batched over envs) and ``StepData`` (the per-step view that
observation / reward / termination / constraint term functions consume —
replacing the reference's ``env.scene[...]`` data buffers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cat_tpu.sim.engine import SimState


class StepData(NamedTuple):
    """Batched per-step view consumed by term functions (leading axis = env).

    Mirrors the Isaac Lab data buffers the reference terms read
    (constraints.py, observations.py, terminations.py in the reference).
    """
    joint_pos: jnp.ndarray          # (N, 12) task-order joint positions
    joint_vel: jnp.ndarray          # (N, 12)
    joint_acc: jnp.ndarray          # (N, 12) finite-diff at sim dt
    applied_torque: jnp.ndarray     # (N, 12) last-substep PD torque
    default_joint_pos: jnp.ndarray  # (12,)
    base_pos: jnp.ndarray           # (N, 3) world
    base_yaw: jnp.ndarray           # (N,) world yaw angle
    base_lin_vel_b: jnp.ndarray     # (N, 3) base frame
    base_ang_vel_b: jnp.ndarray     # (N, 3) base frame
    projected_gravity: jnp.ndarray  # (N, 3) unit gravity dir in base frame
    command: jnp.ndarray            # (N, 3) [vx, vy, wz]
    action: jnp.ndarray             # (N, 12) current raw policy action
    prev_action: jnp.ndarray        # (N, 12)
    force_hist: jnp.ndarray         # (N, 3, nreport, 3) contact force history
    touchdown: jnp.ndarray          # (N, nfeet) first contact this ctrl step
    last_air_time: jnp.ndarray      # (N, nfeet)
    step_dt: float                  # control dt (0.02 s)


class EnvState(NamedTuple):
    """Full batched environment state (one pytree, donated through jit)."""
    sim: SimState                    # batched physics state
    action: jnp.ndarray              # (N, 12) raw action (this step)
    prev_action: jnp.ndarray         # (N, 12)
    episode_len: jnp.ndarray         # (N,) int32 control steps this episode
    command: jnp.ndarray             # (N, 3)
    command_time_left: jnp.ndarray   # (N,) seconds until scheduled resample
    mu: jnp.ndarray                  # (N,) friction (startup randomization)
    origin: jnp.ndarray              # (N, 2) spawn origin (terrain patch)
    terrain_row: jnp.ndarray         # (N,) int32 difficulty level
    terrain_col: jnp.ndarray         # (N,) int32 terrain type column
    running_max: jnp.ndarray         # (Ktot,) CaT polyak maxes (global)
    max_p: jnp.ndarray               # (n_terms,) curriculum-scaled caps
    episode_viol: jnp.ndarray        # (N, n_terms) per-episode violation counts
    episode_prob: jnp.ndarray        # (N, n_terms) per-episode prob sums
    episode_rew: jnp.ndarray         # (N,) per-episode reward sum
    common_step: jnp.ndarray         # () int32 total control steps (global)
    seed: jnp.ndarray                # (N,) uint32; per-shard RNG seed (row 0)
    # Finished-episode metric accumulators, drained once per train iteration
    # (replaces the reference's extras["log"] dict, cat_env.py:169-197).
    acc_viol: jnp.ndarray            # (n_terms,) sum of per-episode violation %
    acc_prob: jnp.ndarray            # (n_terms,) sum of per-episode mean probs
    acc_rew: jnp.ndarray             # () sum of episode rewards
    acc_len: jnp.ndarray             # () sum of episode lengths
    acc_count: jnp.ndarray           # () number of finished episodes
    # Trailing defaulted fields: new state added after round 1 stays at the
    # END with a default so round-1 checkpoints (pickled NamedTuples) still
    # unpickle; checkpoint.restore fills None from the caller's template.
    com_offset: jnp.ndarray = None   # (N, nbody, 3) body-frame CoM shift (DR)
    acc_term: jnp.ndarray = None     # (3,) episodes ended by [illegal
                                     # contact, upside_down, timeout]
                                     # (termination-cause split; priority
                                     # contact > upside > timeout)
