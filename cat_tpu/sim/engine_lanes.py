"""Env-on-lanes physics substep: the TPU production path of the engine.

Same math and step structure as engine.py (PD -> dynamics -> contact ->
integrate -> sensors; reference decimation loop cat_env.py:71-88), but every
per-env quantity keeps the ENV axis LAST so the whole pipeline runs as
full-width VPU lane ops and feeds the Pallas PGS kernel in its native
layout with zero transposes (see dynamics_lanes.py for the why and the
measured 94%-of-step pathology of the vmap layout).

The public entry is ``control_step_lanes``: it takes/returns the standard
(N-leading) SimState — transposition happens once per control step at the
scan boundary (a few hundred KB, negligible), not per substep.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import dynamics_lanes as dl
from . import solver
from .dynamics import f32_matmuls
from .engine import EngineParams, SimState
from .model import RobotModel
from .terrain import Terrain


def _matvec(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(r, c, N) @ (c, N) -> (r, N)."""
    return jnp.sum(M * v[None, :, :], axis=1)


@f32_matmuls
def _substep_pre_lanes(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain,
    qpos: jnp.ndarray, qvel: jnp.ndarray, target_q: jnp.ndarray,
    com_offset: Optional[jnp.ndarray],
):
    """PD + dynamics + collision up to the contact problem (lanes layout).

    qpos (nq, N), qvel (nv, N), target_q (nj, N), com_offset (nb, 3, N)|None.
    Returns (tau_j, v_free, E, W, b, phi, frame).
    """
    h = params.dt
    qj = qpos[7:]
    qdj = qvel[6:]

    lim = jnp.asarray(np.asarray(model.effort_limit, np.float32))[:, None]
    tau_j = jnp.clip(params.kp * (target_q - qj) - params.kd * qdj, -lim, lim)
    tau = jnp.concatenate([jnp.zeros((6,) + tau_j.shape[1:]), tau_j], axis=0)

    kin = dl.fk_lanes(model, qpos, qvel, com_offset)
    jacs = dl.body_jacobians_lanes(model, kin, anc_mask)
    I_w = dl.world_inertias_lanes(model, kin)
    M = dl.mass_matrix_lanes(model, jacs, I_w)
    C = dl.bias_forces_lanes(model, kin, jacs, I_w, qvel)
    if model.uniform_3dof_branches():
        Minv = dl.mass_matrix_inverse_lanes(M, n_branch=model.nj // 3)
    else:
        Minv = dl.dense_inverse_lanes(M)
    v_free = qvel + h * _matvec(Minv, tau - C)

    con = dl.detect_contacts_lanes(model, terrain, kin, anc_mask)
    E = con.E                                        # (3nc, nv, N)
    # W = Minv @ E^T: W[k, c] = sum_j Minv[k, j] E[c, j]
    nv = model.nv
    W = jnp.zeros((nv, E.shape[0]) + qpos.shape[-1:])
    for j in range(nv):
        W = W + Minv[:, j, None, :] * E[None, :, j, :]
    b = jnp.sum(E * v_free[None, :, :], axis=1)      # (3nc, N)
    return tau_j, v_free, E, W, b, con.phi, con.frame


def _pgs_lanes_xla(E_t, W_t, b_t, bias_t, active_t, mu, lam0_t,
                   *, nc: int, iterations: int, cfm: float) -> jnp.ndarray:
    """Pure-XLA mirror of the Pallas kernel (CPU tests / fallback).

    Same loop structure and arithmetic as ops/pgs_pallas.py:_pgs_kernel,
    on (..., N) arrays.
    """
    n3 = 3 * nc
    nv = E_t.shape[1]
    A = jnp.zeros((n3, n3) + E_t.shape[-1:])
    for k in range(nv):
        A = A + E_t[:, k, :][:, None, :] * W_t[k, :, :][None, :, :]

    act = [active_t[i] for i in range(nc)]
    bias = [bias_t[i] for i in range(nc)]
    brow = [b_t[r] for r in range(n3)]
    lam = [lam0_t[3 * i + c] * act[i] for i in range(nc) for c in range(3)]

    w = jnp.zeros_like(b_t)
    for r in range(n3):
        w = w + A[r] * lam[r][None, :]
    inv_d = [1.0 / (A[r, r] + cfm) for r in range(n3)]

    for _ in range(iterations):
        for i in range(nc):
            k = 3 * i
            v0 = w[k] + brow[k]
            v1 = w[k + 1] + brow[k + 1]
            v2 = w[k + 2] + brow[k + 2]
            l0, l1, l2 = lam[k], lam[k + 1], lam[k + 2]
            ln_new = jnp.maximum(l2 - (v2 + bias[i]) * inv_d[k + 2], 0.0)
            ln_new = ln_new * act[i]
            dn = ln_new - l2
            vt1 = v0 + A[k, k + 2] * dn
            vt2 = v1 + A[k + 1, k + 2] * dn
            lt1 = l0 - vt1 * inv_d[k]
            lt2 = l1 - vt2 * inv_d[k + 1]
            tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
            scale = jnp.minimum(1.0, mu * ln_new / tn) * act[i]
            n0, n1, n2 = lt1 * scale, lt2 * scale, ln_new
            d0, d1, d2 = n0 - l0, n1 - l1, n2 - l2
            w = (
                w
                + A[k] * d0[None, :]
                + A[k + 1] * d1[None, :]
                + A[k + 2] * d2[None, :]
            )
            lam[k], lam[k + 1], lam[k + 2] = n0, n1, n2
    return jnp.stack(lam, axis=0)


@f32_matmuls
def _substep_post_lanes(
    model: RobotModel, params: EngineParams,
    qpos, qvel_prev, force_hist, air, tau_j, v_free, W, lam_t, frame,
):
    """Impulse application + integration + sensors (lanes layout).

    air = (current_air, last_air, current_contact, last_contact, touchdown),
    each (nfeet, N). Returns the updated field tuple.
    """
    h = params.dt
    nr = model.nreport
    qj = qpos[7:]
    v_new = v_free + jnp.sum(W * lam_t[None, :, :], axis=1)

    base_pos = qpos[0:3] + h * v_new[0:3]
    quat = qpos[3:7]
    omega_world = dl.quat_rotate_l(quat, v_new[3:6])
    base_quat = dl.quat_integrate_l(quat, omega_world, h)
    qj_new = qj + h * v_new[6:]
    lo = jnp.asarray(np.asarray(model.joint_limit_lower, np.float32))[:, None]
    hi = jnp.asarray(np.asarray(model.joint_limit_upper, np.float32))[:, None]
    clamped = jnp.clip(qj_new, lo, hi)
    hit = clamped != qj_new
    qdj_new = jnp.where(hit, 0.0, v_new[6:])
    v_new = jnp.concatenate([v_new[:6], qdj_new], axis=0)
    qpos_new = jnp.concatenate([base_pos, base_quat, clamped], axis=0)

    lam_resh = lam_t.reshape(model.ncand, 3, -1)
    if frame is not None:
        lam_w = jnp.sum(frame * lam_resh[:, :, None, :], axis=1)
    else:
        lam_w = lam_resh
    f_cand = lam_w / h                                 # (nc, 3, N)
    if model.npair:
        # self-collision rows report +f to body A's slot and -f to body B's
        rep = np.concatenate(
            [model.cand_report, model.pair_report_a, model.pair_report_b]
        )
        f_all = jnp.concatenate([f_cand, -f_cand[model.ncand_terrain:]])
    else:
        rep, f_all = model.cand_report, f_cand
    forces = jax.ops.segment_sum(
        f_all, jnp.asarray(rep), num_segments=nr
    )                                                  # (nr, 3, N)
    forces_flat = forces.reshape(3 * nr, -1)
    hist_new = jnp.concatenate([force_hist[3 * nr:], forces_flat], axis=0)

    foot = forces[jnp.asarray(model.foot_report_ids)]  # (nf, 3, N)
    foot_f = jnp.sqrt(jnp.sum(foot * foot, axis=1))
    cur_air, last_air, cur_con, last_con, touchdown = air
    in_contact = foot_f > params.contact_force_threshold
    touchdown_now = in_contact & (cur_air > 0.0)
    liftoff_now = (~in_contact) & (cur_con > 0.0)
    last_air = jnp.where(touchdown_now, cur_air + h, last_air)
    cur_air = jnp.where(in_contact, 0.0, cur_air + h)
    last_con = jnp.where(liftoff_now, cur_con + h, last_con)
    cur_con = jnp.where(in_contact, cur_con + h, 0.0)

    return (
        qpos_new, v_new, lam_t, tau_j,
        (v_new[6:] - qvel_prev[6:]) / h,
        forces_flat, hist_new,
        (cur_air, last_air, cur_con, last_con, touchdown | touchdown_now),
    )


def _solver_structure(model, sp: solver.SolverParams):
    """Effective sweep structure for the lanes path.

    The ``CAT_TPU_PGS_STRUCT`` env var (read at trace time) overrides the
    SolverParams fields for bench A/Bs without touching configs:
    ``bj:<n_blocks>[:<omega>[:<iterations>]]`` or ``gs``.
    Returns (structure, contact_perm, blocks, omega, iterations).
    """
    import os as _os

    s = _os.environ.get("CAT_TPU_PGS_STRUCT", "")
    struct, nb, om, it = sp.structure, sp.bj_blocks, sp.omega, sp.iterations
    if s:
        parts = s.split(":")
        struct = parts[0]
        if len(parts) > 1:
            nb = int(parts[1])
        if len(parts) > 2:
            om = float(parts[2])
        if len(parts) > 3:
            it = int(parts[3])
    if struct == "bj":
        from cat_tpu.ops import pgs_pallas

        perm, blocks = pgs_pallas.plan_contact_blocks(model, nb)
        return struct, perm, blocks, om, it
    return struct, None, None, om, it


def _substep_lanes(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain, use_pallas: bool, sT, target_qT, mu,
    com_offsetT,
):
    """One physics substep on a transposed SimState (every leaf (..., N))."""
    tau_j, v_free, E, W, b, phi, frame = _substep_pre_lanes(
        model, params, anc_mask, terrain, sT.qpos, sT.qvel, target_qT,
        com_offsetT,
    )
    sp = params.solver
    bias = solver.contact_bias(phi, params.dt, sp)
    active = (phi < sp.margin).astype(jnp.float32)
    struct, cperm, blocks, omega, iters = _solver_structure(model, sp)
    if use_pallas:
        from cat_tpu.ops import pgs_pallas

        if struct == "bj":
            lam_t = pgs_pallas.pgs_solve_lanes_bj(
                E, W, b, bias, active, mu[None, :], sT.lam,
                nc=model.ncand, nv=model.nv,
                iterations=iters, cfm=sp.cfm, omega=omega,
                contact_perm=cperm, blocks=blocks,
                row_dofs=pgs_pallas.contact_row_dofs(model, anc_mask),
            )
        else:
            lam_t = pgs_pallas.pgs_solve_lanes(
                E, W, b, bias, active, mu[None, :], sT.lam,
                nc=model.ncand, nv=model.nv,
                iterations=sp.iterations, cfm=sp.cfm,
                row_dofs=pgs_pallas.contact_row_dofs(model, anc_mask),
            )
    elif struct == "bj":
        from cat_tpu.ops import pgs_pallas

        lam_t = pgs_pallas.pgs_lanes_xla_bj(
            E, W, b, bias, active, mu, sT.lam,
            nc=model.ncand, iterations=iters, cfm=sp.cfm, omega=omega,
            contact_perm=cperm, blocks=blocks,
        )
    else:
        lam_t = _pgs_lanes_xla(
            E, W, b, bias, active, mu, sT.lam,
            nc=model.ncand, iterations=sp.iterations, cfm=sp.cfm,
        )
    air = (sT.current_air_time, sT.last_air_time,
           sT.current_contact_time, sT.last_contact_time, sT.touchdown)
    (qpos, qvel, lam, tau, jacc, forces, hist, air2) = _substep_post_lanes(
        model, params, sT.qpos, sT.qvel, sT.force_hist, air,
        tau_j, v_free, W, lam_t, frame,
    )
    return SimState(
        qpos=qpos, qvel=qvel, lam=lam, applied_torque=tau, joint_acc=jacc,
        forces=forces, force_hist=hist,
        current_air_time=air2[0], last_air_time=air2[1],
        current_contact_time=air2[2], last_contact_time=air2[3],
        touchdown=air2[4],
    )


def control_step_lanes(
    model: RobotModel, params: EngineParams, anc_mask: np.ndarray,
    terrain: Terrain, use_pallas: bool,
    s: SimState, target_q: jnp.ndarray, mu: jnp.ndarray,
    com_offset: jnp.ndarray = None,
) -> SimState:
    """One 50 Hz control step = `decimation` lanes substeps.

    Takes/returns the standard N-leading SimState; transposes once at the
    boundary (cheap) so the env layer is layout-agnostic.
    """
    sT = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), s)
    sT = sT._replace(touchdown=jnp.zeros_like(sT.touchdown))
    target_qT = target_q.T
    com_offsetT = (
        None if com_offset is None else jnp.moveaxis(com_offset, 0, -1)
    )

    def body(carry, _):
        return (
            _substep_lanes(
                model, params, anc_mask, terrain, use_pallas, carry,
                target_qT, mu, com_offsetT,
            ),
            None,
        )

    sT, _ = jax.lax.scan(body, sT, None, length=params.decimation)
    return jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), sT)
