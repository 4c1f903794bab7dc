"""The batched physics engine: PD actuation + articulated dynamics + contact.

TPU-native replacement for the reference's physics decimation loop
(cat_env.py:71-88: apply_action -> write_data_to_sim -> sim.step -> scene
update, x4 at dt=0.005) and for the PhysX articulation + IdealPD actuator +
contact-sensor stack it drives (SURVEY.md §2.2). One control step =
`decimation` substeps; each substep is:

  1. IdealPD torque: tau = clip(Kp (q* - q) - Kd qd, +-effort)   [odri.py:78-83]
  2. Unconstrained velocity: v_free = v + h M^-1 (tau - C)
  3. Contact detect (fixed candidate set) -> Delassus PGS impulse solve
  4. Semi-implicit Euler integrate (quaternion exponential map)
  5. Sensor updates at sim dt: per-body net contact forces with 3-deep
     history, foot air-time state machine (ContactSensorCfg history_length=3,
     track_air_time=True, update_period=sim dt — cat_flat_env_cfg.py:74-76,495)

Everything is a pure function of (state, action); the env layer vmaps and
shards over the env axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import collision, dynamics, solver
from .dynamics import f32_matmuls
from .maths import quat_integrate, quat_rotate
from .model import RobotModel
from .terrain import Terrain, plane


class EngineParams(NamedTuple):
    dt: float = 0.005            # physics dt      (cat_flat_env_cfg.py:484)
    decimation: int = 4          # substeps/ctrl   (cat_flat_env_cfg.py:479)
    kp: float = 4.0              # PD stiffness    (odri.py:81)
    kd: float = 0.2              # PD damping      (odri.py:82)
    contact_force_threshold: float = 1.0   # air-time contact threshold (N)
    solver: solver.SolverParams = solver.SolverParams()


class SimState(NamedTuple):
    """Single-env physics state (the env layer holds a batched version).

    All multi-axis sensor buffers are stored FLAT: on TPU the trailing axis
    pads to 128 lanes, so materializing e.g. (nreport, 3) state between scan
    iterations would waste 42x HBM traffic. Logical shapes are recovered by
    reshape inside the fused substep.
    """
    qpos: jnp.ndarray                 # (nq,)
    qvel: jnp.ndarray                 # (nv,)
    lam: jnp.ndarray                  # (3*ncand,) contact impulse warm start
    applied_torque: jnp.ndarray       # (nj,) last substep PD torque
    joint_acc: jnp.ndarray            # (nj,) last substep joint acceleration
    forces: jnp.ndarray               # (3*nreport,) latest net contact force
    force_hist: jnp.ndarray           # (3*nreport*3,) last 3 substeps, flat
    current_air_time: jnp.ndarray     # (nfeet,)
    last_air_time: jnp.ndarray        # (nfeet,)
    current_contact_time: jnp.ndarray # (nfeet,)
    last_contact_time: jnp.ndarray    # (nfeet,)
    touchdown: jnp.ndarray            # (nfeet,) bool: first contact this ctrl step


def init_state(model: RobotModel, qpos=None, qvel=None) -> SimState:
    nf = len(model.foot_report_ids)
    return SimState(
        qpos=jnp.asarray(qpos if qpos is not None else model.default_qpos(),
                         dtype=jnp.float32),
        qvel=jnp.asarray(qvel if qvel is not None else np.zeros(model.nv),
                         dtype=jnp.float32),
        lam=jnp.zeros(3 * model.ncand),
        applied_torque=jnp.zeros(model.nj),
        joint_acc=jnp.zeros(model.nj),
        forces=jnp.zeros(3 * model.nreport),
        force_hist=jnp.zeros(9 * model.nreport),
        current_air_time=jnp.zeros(nf),
        last_air_time=jnp.zeros(nf),
        current_contact_time=jnp.zeros(nf),
        last_contact_time=jnp.zeros(nf),
        touchdown=jnp.zeros(nf, dtype=bool),
    )


@f32_matmuls
def _substep_pre(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain,
    s: SimState, target_q: jnp.ndarray, com_offset: jnp.ndarray = None,
):
    """Actuation + dynamics + collision up to the contact problem (single env).

    com_offset: optional (nbody, 3) per-env CoM displacement (the
    randomize_body_coms startup event, reference events.py:20-56).
    Returns (tau_j, v_free, E, minvEt, b, phi, frame).
    """
    h = params.dt
    nv = model.nv
    qj = s.qpos[7:]
    qdj = s.qvel[6:]

    # 1. IdealPD actuator (armature is in M via the model)
    tau_j = jnp.clip(
        params.kp * (target_q - qj) - params.kd * qdj,
        -jnp.asarray(model.effort_limit), jnp.asarray(model.effort_limit),
    )
    tau = jnp.concatenate([jnp.zeros(6), tau_j])

    # 2. dynamics
    kin = dynamics.fk(model, s.qpos, s.qvel, com_offset)
    jacs = dynamics.body_jacobians(model, kin, anc_mask)
    I_w = dynamics.world_inertias(model, kin)
    M = dynamics.mass_matrix(model, jacs, I_w)
    C = dynamics.bias_forces(model, kin, jacs, I_w, s.qvel)
    # structured inverse (legs couple only through the base): closed-form
    # 3x3 blocks + 6x6 Schur complement — no factorization custom call.
    # Models without uniform 3-dof branches fall back to the unrolled
    # Cholesky (still custom-call-free).
    if model.uniform_3dof_branches():
        Minv = dynamics.mass_matrix_inverse(M, n_branch=model.nj // 3)
    else:
        Minv = dynamics.cholesky_solve(
            dynamics.cholesky_factor(M), jnp.eye(nv)
        )
    v_free = s.qvel + h * (Minv @ (tau - C))

    # 3. contact setup
    con = collision.detect_contacts(model, terrain, kin, anc_mask)
    E = con.J.reshape(-1, nv)                       # (3nc, nv)
    minvEt = Minv @ E.T                             # (nv, 3nc) — MXU matmul
    b = E @ v_free
    frame = (
        con.frame if con.frame is not None
        else jnp.zeros((0, 3, 3))                   # sentinel: world frame
    )
    return tau_j, v_free, E, minvEt, b, con.phi, frame


@f32_matmuls
def _substep_post(
    model: RobotModel, params: EngineParams,
    s: SimState, tau_j, v_free, minvEt, lam, frame,
) -> SimState:
    """Impulse application + integration + sensors (single env).

    frame: (ncand, 3, 3) contact frames (rows t1,t2,n), or shape (0,3,3) to
    mean world frame (plane terrain fast path).
    """
    h = params.dt
    qj = s.qpos[7:]
    v_new = v_free + minvEt @ lam.reshape(-1)

    # 4. integrate (semi-implicit Euler; quaternion exp map)
    base_pos = s.qpos[0:3] + h * v_new[0:3]
    omega_world = quat_rotate(s.qpos[3:7], v_new[3:6])
    base_quat = quat_integrate(s.qpos[3:7], omega_world, h)
    qj_new = qj + h * v_new[6:]
    # joint limit clamp (PhysX enforces URDF limits as hard constraints)
    lo = jnp.asarray(model.joint_limit_lower)
    hi = jnp.asarray(model.joint_limit_upper)
    clamped = jnp.clip(qj_new, lo, hi)
    hit = clamped != qj_new
    qdj_new = jnp.where(hit, 0.0, v_new[6:])
    v_new = v_new.at[6:].set(qdj_new)
    qpos = jnp.concatenate([base_pos, base_quat, clamped])

    # 5. sensors
    if frame.shape[0] > 0:
        # rotate contact-frame impulses back to world: f = frame^T @ lam
        lam_w = jnp.einsum("cji,cj->ci", frame, lam)
    else:
        lam_w = lam
    f_cand = lam_w / h                               # world-frame forces (N)
    if model.npair:
        # self-collision rows report +f to body A's slot and -f to body B's
        rep = np.concatenate(
            [model.cand_report, model.pair_report_a, model.pair_report_b]
        )
        f_all = jnp.concatenate([f_cand, -f_cand[model.ncand_terrain:]])
    else:
        rep, f_all = model.cand_report, f_cand
    forces = jax.ops.segment_sum(
        f_all, jnp.asarray(rep), num_segments=model.nreport
    )
    force_hist = jnp.concatenate(
        [s.force_hist[3 * model.nreport:], forces.reshape(-1)]
    )
    foot_f = jnp.linalg.norm(forces[jnp.asarray(model.foot_report_ids)], axis=-1)
    in_contact = foot_f > params.contact_force_threshold
    touchdown_now = in_contact & (s.current_air_time > 0.0)
    liftoff_now = (~in_contact) & (s.current_contact_time > 0.0)
    last_air = jnp.where(touchdown_now, s.current_air_time + h, s.last_air_time)
    cur_air = jnp.where(in_contact, 0.0, s.current_air_time + h)
    last_con = jnp.where(liftoff_now, s.current_contact_time + h,
                         s.last_contact_time)
    cur_con = jnp.where(in_contact, s.current_contact_time + h, 0.0)

    return SimState(
        qpos=qpos,
        qvel=v_new,
        lam=lam.reshape(-1),
        applied_torque=tau_j,
        joint_acc=(v_new[6:] - s.qvel[6:]) / h,
        forces=forces.reshape(-1),
        force_hist=force_hist,
        current_air_time=cur_air,
        last_air_time=last_air,
        current_contact_time=cur_con,
        last_contact_time=last_con,
        touchdown=s.touchdown | touchdown_now,
    )


def _substep(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain,
    s: SimState, target_q: jnp.ndarray, mu: jnp.ndarray,
    com_offset: jnp.ndarray = None,
) -> SimState:
    """Single-env substep with the XLA solver (CPU/test path)."""
    tau_j, v_free, E, minvEt, b, phi, frame = _substep_pre(
        model, params, anc_mask, terrain, s, target_q, com_offset
    )
    A = E @ minvEt
    lam = solver.pgs_solve(
        A, b, phi, mu, s.lam.reshape(model.ncand, 3), params.dt, params.solver
    )
    return _substep_post(model, params, s, tau_j, v_free, minvEt, lam, frame)


def _batched_substep(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain, use_pallas: bool,
    s: jnp.ndarray, target_q: jnp.ndarray, mu: jnp.ndarray,
    com_offset: jnp.ndarray = None,
) -> SimState:
    """Batched substep; contact solve via the Pallas kernel on TPU."""
    f_sub = functools.partial(_substep, model, params, anc_mask, terrain)
    f_pre = functools.partial(_substep_pre, model, params, anc_mask, terrain)
    if not use_pallas:
        if com_offset is None:
            return jax.vmap(lambda a, b, c: f_sub(a, b, c))(s, target_q, mu)
        return jax.vmap(f_sub)(s, target_q, mu, com_offset)

    from cat_tpu.ops import pgs_pallas

    sp = params.solver
    if com_offset is None:
        pre = jax.vmap(lambda a, b: f_pre(a, b))(s, target_q)
    else:
        pre = jax.vmap(f_pre)(s, target_q, com_offset)
    tau_j, v_free, E, minvEt, b, phi, frame = pre
    bias = solver.contact_bias(phi, params.dt, sp)
    active = (phi < sp.margin).astype(jnp.float32)
    lam = pgs_pallas.pgs_solve_batched(
        E, minvEt, b, bias, active, mu,
        s.lam.reshape(-1, model.ncand, 3),
        nc=model.ncand, nv=model.nv,
        iterations=sp.iterations, cfm=sp.cfm,
    )
    return jax.vmap(functools.partial(_substep_post, model, params))(
        s, tau_j, v_free, minvEt, lam, frame
    )


def control_step(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain, use_pallas: bool,
    s: SimState, target_q: jnp.ndarray, mu: jnp.ndarray,
    com_offset: jnp.ndarray = None,
) -> SimState:
    """One 50 Hz control step = `decimation` physics substeps (BATCHED).

    The decimation loop is a lax.scan so the substep body compiles once
    (compile-time matters: the substep sits inside the rollout scan of the
    fully-jitted train iteration).
    """
    s = s._replace(touchdown=jnp.zeros_like(s.touchdown))

    def body(carry, _):
        return (
            _batched_substep(
                model, params, anc_mask, terrain, use_pallas, carry,
                target_q, mu, com_offset
            ),
            None,
        )

    s, _ = jax.lax.scan(body, s, None, length=params.decimation)
    return s


def make_batched_step(model: RobotModel, params: EngineParams,
                      num_envs: int = 0, terrain: Terrain = None,
                      layout: str = "auto"):
    """Returns step(batched SimState, targets (N, nj), mu (N,)) -> SimState.

    layout:
      * "lanes" — env axis on the TPU lane dimension throughout the substep
        (engine_lanes.py), Pallas contact kernel when the env count tiles.
        The production TPU path: the vmap layout ran the dynamics at ~2% of
        VPU peak (tiny trailing dims on the 128-lane axis).
      * "vmap"  — the original env-leading layout (reference implementation,
        golden-tested on CPU).
      * "auto"  — lanes on TPU, vmap elsewhere.
    """
    anc_mask = model.ancestor_mask()
    terrain = terrain if terrain is not None else plane()
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas wrapper pads the env axis to its tile, so any env count
    # stays on the kernel path on TPU (no silent XLA-mirror fallback)
    use_pallas = on_tpu and num_envs > 0
    if layout == "auto":
        layout = "lanes" if on_tpu else "vmap"
    if layout == "lanes":
        from .engine_lanes import control_step_lanes

        return functools.partial(
            control_step_lanes, model, params, anc_mask, terrain, use_pallas
        )
    return functools.partial(
        control_step, model, params, anc_mask, terrain, use_pallas
    )


def make_batched_init(model: RobotModel, n: int) -> SimState:
    s = init_state(model)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)
