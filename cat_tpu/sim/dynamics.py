"""Batched articulated rigid-body dynamics: FK, Jacobians, mass matrix, bias.

TPU-native replacement for the PhysX articulation pipeline the reference
depends on (SURVEY.md §2.2/§2.3; reference touches it via
``self.sim.step(render=False)``, cat_env.py:78). Instead of translating
Featherstone 6D spatial algebra, we use a world-frame Jacobian formulation
that maps onto batched matmuls (MXU-friendly) and plain 3-vector ops:

  M(q)   = sum_b [ Jv_b^T m_b Jv_b + Jw_b^T I_b^w Jw_b ] + diag(armature)
  C(q,v) = sum_b [ Jv_b^T m_b a_com_b + Jw_b^T (I_b^w alpha_b + w x I_b^w w) ]

where a_com_b / alpha_b are the body accelerations with qacc = 0 and gravity
folded in via a_base = -g (so tau = M qacc + C exactly).

All functions are single-env; the engine vmaps them over the env batch. The
model is static numpy — XLA bakes it into the compiled step as constants.

Generalized velocity layout: [v_base_world(3), w_base_body(3), qd(nj)].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .maths import quat_rotate, quat_to_mat, skew
from .model import RobotModel

GRAVITY = np.array([0.0, 0.0, -9.81])


def f32_matmuls(fn):
    """Force full-f32 matmul passes inside fn.

    On TPU the default matmul precision uses bf16 MXU passes, which corrupts
    the tiny, ill-conditioned physics matrices (observed: 1e-3 relative error
    in the mass matrix). The physics matrices are small, so full precision is
    essentially free; the policy MLP keeps the fast default.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper


class Kin(NamedTuple):
    """World-frame kinematic state of all bodies (single env)."""
    R: jnp.ndarray        # (nbody, 3, 3) body rotations
    o: jnp.ndarray        # (nbody, 3) body frame origins
    omega: jnp.ndarray    # (nbody, 3) world angular velocities
    v_o: jnp.ndarray      # (nbody, 3) world linear velocity of frame origin
    x_com: jnp.ndarray    # (nbody, 3) world com positions
    a_w: jnp.ndarray      # (nj, 3) world joint axes (joint d = body d+1)
    o_j: jnp.ndarray      # (nj, 3) world joint origins


@f32_matmuls
def fk(model: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
       com_offset: jnp.ndarray = None) -> Kin:
    """Forward position + velocity kinematics (single env).

    com_offset: optional (nbody, 3) body-frame CoM displacement (the
    randomize_body_coms domain-randomization event, reference
    events.py:20-56 — PhysX set_coms shifts the CoM without touching the
    inertia tensor about the CoM, and so do we).
    """
    nb = model.nbody
    base_quat = qpos[3:7]
    R0 = quat_to_mat(base_quat)
    o0 = qpos[0:3]
    omega0 = quat_rotate(base_quat, qvel[3:6])  # body -> world ang vel
    v0 = qvel[0:3]

    Rs = [R0]
    os_ = [o0]
    omegas = [omega0]
    vs = [v0]
    a_ws = []
    o_js = []
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        q = qpos[7 + d]
        qd = qvel[6 + d]
        Rp, op = Rs[p], os_[p]
        # joint frame in world
        R_pj = jnp.asarray(model.joint_rot[b])
        o_j = op + Rp @ jnp.asarray(model.joint_pos[b])
        a_w = (Rp @ R_pj) @ jnp.asarray(model.joint_axis[b])
        # rotation about axis by q (Rodrigues)
        K = skew(a_w)
        R_axis = (
            jnp.eye(3) + jnp.sin(q) * K + (1.0 - jnp.cos(q)) * (K @ K)
        )
        Rb = R_axis @ (Rp @ R_pj)
        omega_b = omegas[p] + qd * a_w
        v_b = vs[p] + jnp.cross(omegas[p], o_j - op)
        Rs.append(Rb)
        os_.append(o_j)
        omegas.append(omega_b)
        vs.append(v_b)
        a_ws.append(a_w)
        o_js.append(o_j)

    R = jnp.stack(Rs)
    o = jnp.stack(os_)
    com = jnp.asarray(model.com)
    if com_offset is not None:
        com = com + com_offset
    x_com = o + jnp.einsum("bij,bj->bi", R, com)
    z3 = jnp.zeros((0, 3))
    return Kin(
        R=R, o=o,
        omega=jnp.stack(omegas), v_o=jnp.stack(vs),
        x_com=x_com,
        a_w=jnp.stack(a_ws) if a_ws else z3,
        o_j=jnp.stack(o_js) if o_js else z3,
    )


@f32_matmuls
def point_jacobian(
    model: RobotModel, kin: Kin, body: int, x: jnp.ndarray,
    mask_row: np.ndarray,
) -> jnp.ndarray:
    """(3, nv) Jacobian of world point x fixed to `body` (static body index).

    mask_row: (nj,) bool numpy — joints on the chain base->body.
    """
    nv = model.nv
    cols_base_lin = jnp.eye(3)
    cols_base_ang = -skew(x - kin.o[0]) @ kin.R[0]
    # joint columns: a_w x (x - o_j), masked
    m = jnp.asarray(mask_row.astype(np.float32))[:, None]
    jc = jnp.cross(kin.a_w, x[None, :] - kin.o_j) * m  # (nj, 3)
    return jnp.concatenate([cols_base_lin, cols_base_ang, jc.T], axis=1).reshape(3, nv)


class Jacs(NamedTuple):
    Jv: jnp.ndarray  # (nbody, 3, nv) com translational Jacobians
    Jw: jnp.ndarray  # (nbody, 3, nv) rotational Jacobians


@f32_matmuls
def body_jacobians(model: RobotModel, kin: Kin, anc_mask: np.ndarray) -> Jacs:
    """Stacked com/rotation Jacobians for all bodies (single env).

    anc_mask: static (nbody, nj) bool ancestor mask (model.ancestor_mask()).
    """
    nb, nj = model.nbody, model.nj
    mask = jnp.asarray(anc_mask.astype(np.float32))  # (nbody, nj)

    # rotational: base ang cols = R0 for all bodies; joint cols = a_w masked
    Jw_base_ang = jnp.broadcast_to(kin.R[0], (nb, 3, 3))
    Jw_joints = mask[:, None, :] * kin.a_w.T[None, :, :]  # (nbody, 3, nj)
    Jw = jnp.concatenate(
        [jnp.zeros((nb, 3, 3)), Jw_base_ang, Jw_joints], axis=2
    )

    # translational (com points)
    Jv_base_lin = jnp.broadcast_to(jnp.eye(3), (nb, 3, 3))
    Jv_base_ang = -skew(kin.x_com - kin.o[0]) @ kin.R[0]  # (nbody, 3, 3)
    # joint cols: a_w x (x_com_b - o_j)  -> (nbody, nj, 3)
    rel = kin.x_com[:, None, :] - kin.o_j[None, :, :]
    jc = jnp.cross(kin.a_w[None, :, :], rel) * mask[:, :, None]
    Jv = jnp.concatenate(
        [Jv_base_lin, Jv_base_ang, jnp.swapaxes(jc, 1, 2)], axis=2
    )
    return Jacs(Jv=Jv, Jw=Jw)


@f32_matmuls
def world_inertias(model: RobotModel, kin: Kin) -> jnp.ndarray:
    """(nbody, 3, 3) rotational inertias about com in world frame."""
    I_loc = jnp.asarray(model.inertia)
    return jnp.einsum("bij,bjk,blk->bil", kin.R, I_loc, kin.R)


@f32_matmuls
def mass_matrix(model: RobotModel, jacs: Jacs, I_w: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix (single env)."""
    m = jnp.asarray(model.mass)[:, None, None]
    M = jnp.einsum("bik,bil->kl", jacs.Jv * m, jacs.Jv)
    M = M + jnp.einsum("bik,bij,bjl->kl", jacs.Jw, I_w, jacs.Jw)
    arm = jnp.concatenate(
        [jnp.zeros(6), jnp.asarray(model.armature)]
    )
    M = M + jnp.diag(arm)
    return 0.5 * (M + M.T)  # exact symmetry for stable Cholesky in f32


@f32_matmuls
def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3) matrices (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h_, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h_
    co01 = c * h_ - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h_ - e * g
    co21 = b * g - a * h_
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / det
    rows = [
        jnp.stack([co00, co01, co02], axis=-1),
        jnp.stack([co10, co11, co12], axis=-1),
        jnp.stack([co20, co21, co22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


@f32_matmuls
def mass_matrix_inverse(M: jnp.ndarray, n_branch: int) -> jnp.ndarray:
    """Explicit M^-1 (nv, nv) exploiting branched-tree sparsity.

    For a floating base with `n_branch` independent 3-dof legs, the
    joint-joint block of M is block-diagonal (legs only couple through the
    base), so M^-1 follows from closed-form 3x3 inverses + a 6x6 Schur
    complement — a few dozen fused ops instead of an O(nv^3) factorization
    custom call (profiled ~100x slower than its arithmetic cost here) or a
    large unrolled substitution program (pathological remote-compile time).

      M = [[B, X], [X^T, D]],  D = blockdiag(D_1..D_k), W = X D^-1
      S = B - W X^T
      M^-1 = [[S^-1, -S^-1 W], [-W^T S^-1, D^-1 + W^T S^-1 W]]
    """
    nv = M.shape[0]
    nj = nv - 6
    assert nj == 3 * n_branch
    B = M[:6, :6]
    X = M[:6, 6:]                                    # (6, nj)
    Db = jnp.stack(
        [M[6 + 3 * i:9 + 3 * i, 6 + 3 * i:9 + 3 * i] for i in range(n_branch)]
    )                                                # (k, 3, 3)
    Dinv = inv3(Db)                                  # (k, 3, 3)
    Xb = X.reshape(6, n_branch, 3)
    Wb = jnp.einsum("ukj,kji->uki", Xb, Dinv)        # X D^-1, (6, k, 3)
    W = Wb.reshape(6, nj)
    S = B - W @ X.T                                  # (6, 6)
    Sinv = _inv_spd_small(S)
    TL = Sinv
    TR = -Sinv @ W                                   # (6, nj)
    # D^-1 (block diag) + W^T S^-1 W
    Dinv_full = jnp.zeros((nj, nj))
    for i in range(n_branch):
        Dinv_full = Dinv_full.at[3 * i:3 * i + 3, 3 * i:3 * i + 3].set(Dinv[i])
    BR = Dinv_full + W.T @ Sinv @ W
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([TR.T, BR], axis=1)
    Minv = jnp.concatenate([top, bot], axis=0)
    return 0.5 * (Minv + Minv.T)


def _inv_spd_small(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small SPD matrix via unrolled Cholesky (6x6 here)."""
    L = cholesky_factor(S)
    return cholesky_solve(L, jnp.eye(S.shape[0]))


@f32_matmuls
def cholesky_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky of a small SPD matrix, fully unrolled.

    XLA's batched `cholesky`/`triangular_solve` lower to custom calls that
    profiled ~100x slower than the arithmetic cost for tiny (18x18) batched
    matrices on this TPU; the unrolled column sweep compiles to plain fused
    vector ops over the env batch instead.
    """
    n = M.shape[0]
    L = jnp.zeros_like(M)
    idx = jnp.arange(n)
    for j in range(n):
        if j == 0:
            c = M[:, 0]
        else:
            c = M[:, j] - L[:, :j] @ L[j, :j]
        d = jax.lax.rsqrt(jnp.maximum(c[j], 1e-12))
        col = jnp.where(idx >= j, c * d, 0.0)
        L = L.at[:, j].set(col)
    return L


@f32_matmuls
def cholesky_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B by unrolled forward/back substitution.

    B: (n,) or (n, k). Static unroll over the n rows; every step is a fused
    vector op over the trailing k (and the vmapped env batch).
    """
    n = L.shape[0]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    ys = []
    for i in range(n):
        acc = B[i]
        if i > 0:
            acc = acc - L[i, :i] @ jnp.stack(ys)
        ys.append(acc / L[i, i])
    Y = jnp.stack(ys)
    xs = [None] * n
    U = L.T
    for i in reversed(range(n)):
        acc = Y[i]
        if i < n - 1:
            acc = acc - U[i, i + 1:] @ jnp.stack(xs[i + 1:])
        xs[i] = acc / U[i, i]
    X = jnp.stack(xs)
    return X[:, 0] if vec else X


@f32_matmuls
def bias_forces(
    model: RobotModel, kin: Kin, jacs: Jacs, I_w: jnp.ndarray,
    qvel: jnp.ndarray,
) -> jnp.ndarray:
    """(nv,) bias C(q, v): Coriolis + centrifugal + gravity (qacc = 0)."""
    nb = model.nbody
    alphas = [jnp.zeros(3)]
    a_os = [jnp.asarray(-GRAVITY)]  # gravity trick: a_base = -g
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        qd = qvel[6 + d]
        a_w = kin.a_w[d]
        dvec = kin.o[b] - kin.o[p]
        alpha = alphas[p] + jnp.cross(kin.omega[p], qd * a_w)
        a_o = (
            a_os[p]
            + jnp.cross(alphas[p], dvec)
            + jnp.cross(kin.omega[p], jnp.cross(kin.omega[p], dvec))
        )
        alphas.append(alpha)
        a_os.append(a_o)
    alpha = jnp.stack(alphas)
    a_o = jnp.stack(a_os)
    r = kin.x_com - kin.o
    a_com = (
        a_o + jnp.cross(alpha, r)
        + jnp.cross(kin.omega, jnp.cross(kin.omega, r))
    )
    F = jnp.asarray(model.mass)[:, None] * a_com  # (nbody, 3)
    Iw_w = jnp.einsum("bij,bj->bi", I_w, kin.omega)
    N = jnp.einsum("bij,bj->bi", I_w, alpha) + jnp.cross(kin.omega, Iw_w)
    C = jnp.einsum("bik,bi->k", jacs.Jv, F) + jnp.einsum("bik,bi->k", jacs.Jw, N)
    return C
