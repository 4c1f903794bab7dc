"""Env-on-LANES batched dynamics: the TPU production layout.

The vmap layout (env axis leading, geometry on trailing axes) puts 3-vectors
and 18-dof rows on the TPU's 128-lane axis — 2-15% lane utilization, and
every tiny contraction lowers to a batched micro-matmul. Measured on chip:
the dynamics pipeline ran at ~42 GFLOP/s (~2% of VPU peak) and was 94% of
the whole training step.

This module computes the identical math with the ENV axis LAST (on lanes)
and every small contraction unrolled into elementwise FMAs over (..., N)
arrays: each scalar of the per-env computation becomes one (N,)-lane vector
op, so the VPU runs at full width. It feeds the Pallas PGS kernel in its
native layout (constraint rows on sublanes, envs on lanes) with no
transposes.

Shapes (N = env count, always LAST):
  qpos (nq, N), qvel (nv, N)
  KinL: R (nb,3,3,N), o/omega/v_o/x_com (nb,3,N), a_w/o_j (nj,3,N)
  Jacobians (nb, 3, nv, N); M/Minv (nv, nv, N); E (3nc, nv, N)

Replaces the same PhysX capability as dynamics.py (SURVEY.md §2.3);
dynamics.py remains the reference implementation for CPU tests and is the
golden model for tests/test_lanes.py equivalence checks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import terrain as terrain_mod
from .dynamics import GRAVITY, f32_matmuls
from .model import RobotModel
from .terrain import Terrain

# ---------------------------------------------------------------------------
# lane-layout math helpers: component axes leading, env axis last
# ---------------------------------------------------------------------------


def cross_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over axis -2 of (..., 3, N) arrays."""
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
    )


def matvec3_l(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3, N) @ (..., 3, N) -> (..., 3, N)."""
    return jnp.sum(A * v[..., None, :, :], axis=-2)


def matmat3_l(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3, N) @ (..., 3, 3, N) -> (..., 3, 3, N)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)


def transpose3_l(A: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(A, -3, -2)


def skew_l(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, N) -> (..., 3, 3, N) cross-product matrix."""
    x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-2),
            jnp.stack([z, zero, -x], axis=-2),
            jnp.stack([-y, x, zero], axis=-2),
        ],
        axis=-3,
    )


def quat_to_mat_l(q: jnp.ndarray) -> jnp.ndarray:
    """(4, N) -> (3, 3, N)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    return jnp.stack([jnp.stack(row, axis=0) for row in r], axis=0)


def quat_rotate_l(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (3, N) vectors by (4, N) quaternions (local -> world)."""
    qw = q[0:1]
    qv = q[1:4]
    t = 2.0 * cross_l(qv, v)
    return v + qw * t + cross_l(qv, t)


def quat_mul_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=0,
    )


def quat_integrate_l(q: jnp.ndarray, omega_w: jnp.ndarray, dt) -> jnp.ndarray:
    """Exponential-map orientation update; q (4, N), omega_w (3, N)."""
    angle = jnp.sqrt(jnp.sum(omega_w * omega_w, axis=0))
    axis = omega_w / jnp.maximum(angle, 1e-12)[None]
    half = 0.5 * angle * dt
    dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]],
                         axis=0)
    out = quat_mul_l(dq, q)
    return out / jnp.sqrt(jnp.sum(out * out, axis=0))[None]


# ---------------------------------------------------------------------------
# kinematics / dynamics
# ---------------------------------------------------------------------------


class KinL(NamedTuple):
    R: jnp.ndarray        # (nb, 3, 3, N)
    o: jnp.ndarray        # (nb, 3, N)
    omega: jnp.ndarray    # (nb, 3, N)
    v_o: jnp.ndarray      # (nb, 3, N)
    x_com: jnp.ndarray    # (nb, 3, N)
    a_w: jnp.ndarray      # (nj, 3, N)
    o_j: jnp.ndarray      # (nj, 3, N)


@f32_matmuls
def fk_lanes(model: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
             com_offset: Optional[jnp.ndarray] = None) -> KinL:
    """Forward kinematics; qpos (nq, N), qvel (nv, N).

    com_offset: optional (nbody, 3, N) body-frame CoM displacement.
    Mirrors dynamics.fk exactly (cited there: PhysX articulation replacement).
    """
    nb = model.nbody
    N = qpos.shape[-1]
    base_quat = qpos[3:7]
    R0 = quat_to_mat_l(base_quat)
    o0 = qpos[0:3]
    omega0 = quat_rotate_l(base_quat, qvel[3:6])
    v0 = qvel[0:3]

    Rs = [R0]
    os_ = [o0]
    omegas = [omega0]
    vs = [v0]
    a_ws = []
    o_js = []
    eye = jnp.broadcast_to(jnp.eye(3)[..., None], (3, 3, N))
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        q = qpos[7 + d]          # (N,)
        qd = qvel[6 + d]
        Rp, op = Rs[p], os_[p]
        jp = np.asarray(model.joint_pos[b], dtype=np.float32)
        R_pj = np.asarray(model.joint_rot[b], dtype=np.float32)
        ax = np.asarray(model.joint_axis[b], dtype=np.float32)
        # o_j = op + Rp @ joint_pos (constant vector -> 3 FMAs per row)
        o_j = op + jnp.sum(Rp * jp[None, :, None], axis=1)
        # world frame of the joint: Rp @ R_pj (constant matrix)
        R_pw = jnp.sum(Rp[:, :, None, :] * R_pj[None, :, :, None], axis=1)
        a_w = jnp.sum(R_pw * ax[None, :, None], axis=1)     # (3, N)
        K = skew_l(a_w)
        KK = matmat3_l(K, K)
        sq = jnp.sin(q)[None, None]
        cq = jnp.cos(q)[None, None]
        R_axis = eye + sq * K + (1.0 - cq) * KK
        Rb = matmat3_l(R_axis, R_pw)
        omega_b = omegas[p] + qd[None] * a_w
        v_b = vs[p] + cross_l(omegas[p], o_j - op)
        Rs.append(Rb)
        os_.append(o_j)
        omegas.append(omega_b)
        vs.append(v_b)
        a_ws.append(a_w)
        o_js.append(o_j)

    R = jnp.stack(Rs)
    o = jnp.stack(os_)
    com = jnp.asarray(model.com, dtype=jnp.float32)[:, :, None]  # (nb, 3, 1)
    if com_offset is not None:
        com = com + com_offset
    x_com = o + matvec3_l(R, jnp.broadcast_to(com, (nb, 3, N)))
    z3 = jnp.zeros((0, 3, N))
    return KinL(
        R=R, o=o, omega=jnp.stack(omegas), v_o=jnp.stack(vs), x_com=x_com,
        a_w=jnp.stack(a_ws) if a_ws else z3,
        o_j=jnp.stack(o_js) if o_js else z3,
    )


class JacsL(NamedTuple):
    Jv: jnp.ndarray  # (nb, 3, nv, N)
    Jw: jnp.ndarray  # (nb, 3, nv, N)


@f32_matmuls
def body_jacobians_lanes(model: RobotModel, kin: KinL,
                         anc_mask: np.ndarray) -> JacsL:
    nb, nj = model.nbody, model.nj
    N = kin.o.shape[-1]
    mask = jnp.asarray(anc_mask.astype(np.float32))          # (nb, nj)

    # rotational
    Jw_base_ang = jnp.broadcast_to(kin.R[0][None], (nb, 3, 3, N))
    a_w_t = jnp.swapaxes(kin.a_w, 0, 1)                      # (3, nj, N)
    Jw_joints = mask[:, None, :, None] * a_w_t[None]         # (nb, 3, nj, N)
    Jw = jnp.concatenate(
        [jnp.zeros((nb, 3, 3, N)), Jw_base_ang, Jw_joints], axis=2
    )

    # translational (com points)
    Jv_base_lin = jnp.broadcast_to(jnp.eye(3)[None, :, :, None],
                                   (nb, 3, 3, N))
    Jv_base_ang = -matmat3_l(skew_l(kin.x_com - kin.o[0][None]),
                             jnp.broadcast_to(kin.R[0][None], (nb, 3, 3, N)))
    rel = kin.x_com[:, None] - kin.o_j[None]                 # (nb, nj, 3, N)
    jc = cross_l(jnp.broadcast_to(kin.a_w[None], rel.shape), rel)
    jc = jc * mask[:, :, None, None]
    Jv = jnp.concatenate(
        [Jv_base_lin, Jv_base_ang, jnp.swapaxes(jc, 1, 2)], axis=2
    )
    return JacsL(Jv=Jv, Jw=Jw)


@f32_matmuls
def world_inertias_lanes(model: RobotModel, kin: KinL) -> jnp.ndarray:
    I_loc = jnp.asarray(model.inertia, dtype=jnp.float32)[:, :, :, None]
    RI = matmat3_l(kin.R, jnp.broadcast_to(I_loc, kin.R.shape))
    return matmat3_l(RI, transpose3_l(kin.R))


@f32_matmuls
def mass_matrix_lanes(model: RobotModel, jacs: JacsL,
                      I_w: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv, N) joint-space inertia matrix."""
    nv = model.nv
    N = jacs.Jv.shape[-1]
    M = jnp.zeros((nv, nv, N))
    for b in range(model.nbody):
        m_b = float(model.mass[b])
        Jv = jacs.Jv[b]                                       # (3, nv, N)
        Jw = jacs.Jw[b]
        M = M + m_b * jnp.sum(
            Jv[:, :, None, :] * Jv[:, None, :, :], axis=0
        )
        # X = I_w[b] @ Jw : (3, nv, N)
        X = jnp.sum(I_w[b][:, :, None, :] * Jw[None, :, :, :], axis=1)
        M = M + jnp.sum(Jw[:, :, None, :] * X[:, None, :, :], axis=0)
    arm = np.concatenate([np.zeros(6), np.asarray(model.armature)]).astype(
        np.float32
    )
    M = M + jnp.asarray(np.diag(arm))[:, :, None]
    return 0.5 * (M + jnp.swapaxes(M, 0, 1))


@f32_matmuls
def bias_forces_lanes(model: RobotModel, kin: KinL, jacs: JacsL,
                      I_w: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """(nv, N) Coriolis + centrifugal + gravity bias."""
    nb = model.nbody
    N = qvel.shape[-1]
    alphas = [jnp.zeros((3, N))]
    g = np.asarray(-GRAVITY, dtype=np.float32)
    a_os = [jnp.broadcast_to(jnp.asarray(g)[:, None], (3, N))]
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        qd = qvel[6 + d]
        a_w = kin.a_w[d]
        dvec = kin.o[b] - kin.o[p]
        alpha = alphas[p] + cross_l(kin.omega[p], qd[None] * a_w)
        a_o = (
            a_os[p]
            + cross_l(alphas[p], dvec)
            + cross_l(kin.omega[p], cross_l(kin.omega[p], dvec))
        )
        alphas.append(alpha)
        a_os.append(a_o)
    alpha = jnp.stack(alphas)                                 # (nb, 3, N)
    a_o = jnp.stack(a_os)
    r = kin.x_com - kin.o
    a_com = a_o + cross_l(alpha, r) + cross_l(kin.omega, cross_l(kin.omega, r))
    m = jnp.asarray(np.asarray(model.mass, dtype=np.float32))[:, None, None]
    F = m * a_com                                             # (nb, 3, N)
    Iw_w = matvec3_l(I_w, kin.omega)
    Nt = matvec3_l(I_w, alpha) + cross_l(kin.omega, Iw_w)
    C = jnp.sum(jacs.Jv * F[:, :, None, :], axis=(0, 1))
    C = C + jnp.sum(jacs.Jw * Nt[:, :, None, :], axis=(0, 1))
    return C


def inv3_lanes(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 3, 3, N) matrices."""
    a, b, c = A[..., 0, 0, :], A[..., 0, 1, :], A[..., 0, 2, :]
    d, e, f = A[..., 1, 0, :], A[..., 1, 1, :], A[..., 1, 2, :]
    g, h_, i = A[..., 2, 0, :], A[..., 2, 1, :], A[..., 2, 2, :]
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
        jnp.stack([co00, co01, co02], axis=-2),
        jnp.stack([co10, co11, co12], axis=-2),
        jnp.stack([co20, co21, co22], axis=-2),
    ]
    return jnp.stack(rows, axis=-3) * inv_det[..., None, None, :]


def cholesky_factor_lanes(M: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky of (n, n, N) SPD matrices."""
    n = M.shape[0]
    cols = []
    for j in range(n):
        c = M[:, j, :]
        for k in range(j):
            c = c - cols[k] * cols[k][j][None]
        d = jax.lax.rsqrt(jnp.maximum(c[j], 1e-12))
        mask = (jnp.arange(n) >= j).astype(M.dtype)[:, None]
        cols.append(c * d[None] * mask)
    return jnp.stack(cols, axis=1)                            # (n, n, N)


def cholesky_inverse_lanes(L: jnp.ndarray) -> jnp.ndarray:
    """(L L^T)^-1 for (n, n, N) lower-triangular L (unrolled substitution)."""
    n = L.shape[0]
    cols = []
    eye = np.eye(n, dtype=np.float32)
    for rhs in range(n):
        ys = []
        for i in range(n):
            acc = jnp.full(L.shape[-1], eye[i, rhs])
            for k in range(i):
                acc = acc - L[i, k] * ys[k]
            ys.append(acc / L[i, i])
        xs = [None] * n
        for i in reversed(range(n)):
            acc = ys[i]
            for k in range(i + 1, n):
                acc = acc - L[k, i] * xs[k]
            xs[i] = acc / L[i, i]
        cols.append(jnp.stack(xs, axis=0))
    return jnp.stack(cols, axis=1)                            # (n, n, N)


@f32_matmuls
def mass_matrix_inverse_lanes(M: jnp.ndarray, n_branch: int) -> jnp.ndarray:
    """Structured M^-1 (nv, nv, N): 3x3 leg blocks + 6x6 base Schur
    (same derivation as dynamics.mass_matrix_inverse)."""
    nv = M.shape[0]
    nj = nv - 6
    assert nj == 3 * n_branch
    B = M[:6, :6]                                            # (6, 6, N)
    X = M[:6, 6:]                                            # (6, nj, N)
    Db = jnp.stack(
        [M[6 + 3 * i:9 + 3 * i, 6 + 3 * i:9 + 3 * i] for i in range(n_branch)]
    )                                                        # (k, 3, 3, N)
    Dinv = inv3_lanes(Db)
    # W = X @ blockdiag(Dinv): per-branch (6, 3, N) @ (3, 3, N)
    Wb = []
    for i in range(n_branch):
        Xi = X[:, 3 * i:3 * i + 3, :]                        # (6, 3, N)
        Wb.append(jnp.sum(Xi[:, :, None, :] * Dinv[i][None], axis=1))
    W = jnp.concatenate(Wb, axis=1)                          # (6, nj, N)
    S = B - jnp.sum(W[:, None, :, :] * X[None, :, :, :], axis=2)
    L = cholesky_factor_lanes(S)
    Sinv = cholesky_inverse_lanes(L)                         # (6, 6, N)
    TR = -jnp.sum(Sinv[:, :, None, :] * W[None], axis=1)     # (6, nj, N)
    # BR = blockdiag(Dinv) + W^T Sinv W
    SW = jnp.sum(Sinv[:, :, None, :] * W[None], axis=1)      # (6, nj, N)
    BR = jnp.sum(W[:, :, None, :] * SW[:, None, :, :], axis=0)  # (nj, nj, N)
    N_ = M.shape[-1]
    Dfull = jnp.zeros((nj, nj, N_))
    for i in range(n_branch):
        Dfull = Dfull.at[3 * i:3 * i + 3, 3 * i:3 * i + 3, :].set(Dinv[i])
    BR = BR + Dfull
    top = jnp.concatenate([Sinv, TR], axis=1)
    bot = jnp.concatenate([jnp.swapaxes(TR, 0, 1), BR], axis=1)
    Minv = jnp.concatenate([top, bot], axis=0)
    return 0.5 * (Minv + jnp.swapaxes(Minv, 0, 1))


@f32_matmuls
def dense_inverse_lanes(M: jnp.ndarray) -> jnp.ndarray:
    """Fallback M^-1 via unrolled Cholesky (models without 3-dof branches)."""
    L = cholesky_factor_lanes(M)
    return cholesky_inverse_lanes(L)


# ---------------------------------------------------------------------------
# collision (fixed candidate set, lanes layout)
# ---------------------------------------------------------------------------


class ContactsL(NamedTuple):
    phi: jnp.ndarray              # (nc, N)
    E: jnp.ndarray                # (3nc, nv, N) Jacobian rows, contact frame
    frame: Optional[jnp.ndarray]  # (nc, 3, 3, N) rows (t1,t2,n); None = world


def _point_jacobians_lanes(model: RobotModel, kin: KinL, mask: np.ndarray,
                           x: jnp.ndarray) -> jnp.ndarray:
    """World-frame point Jacobians, lanes layout.

    x (k, 3, N) world points; mask (k, nj) ancestor mask of the owning
    bodies. Returns (k, 3, nv, N).
    """
    k, N = x.shape[0], x.shape[-1]
    Jlin = jnp.broadcast_to(jnp.eye(3)[None, :, :, None], (k, 3, 3, N))
    R0 = jnp.broadcast_to(kin.R[0][None], (k, 3, 3, N))
    Jang = -matmat3_l(skew_l(x - kin.o[0][None]), R0)
    rel = x[:, None] - kin.o_j[None]                          # (k, nj, 3, N)
    jc = cross_l(jnp.broadcast_to(kin.a_w[None], rel.shape), rel)
    jc = jc * jnp.asarray(mask.astype(np.float32))[:, :, None, None]
    return jnp.concatenate([Jlin, Jang, jnp.swapaxes(jc, 1, 2)], axis=2)


def detect_pair_contacts_lanes(model: RobotModel, kin: KinL,
                               anc_mask: np.ndarray):
    """Self-collision capsule-capsule contacts, lanes layout.

    Mirror of collision.detect_pair_contacts on (..., N) arrays. Returns
    (phi (np, N), Jc (np, 3, nv, N), frame (np, 3, 3, N)).
    """
    ba, bb = model.pair_body_a, model.pair_body_b
    npair, N = len(ba), kin.o.shape[-1]
    eps = 1e-12

    def endpoints(bodies, p0, p1):
        R, o = kin.R[bodies], kin.o[bodies]
        p0 = jnp.asarray(np.asarray(p0, np.float32))[:, :, None]
        p1 = jnp.asarray(np.asarray(p1, np.float32))[:, :, None]
        return (
            o + matvec3_l(R, jnp.broadcast_to(p0, (npair, 3, N))),
            o + matvec3_l(R, jnp.broadcast_to(p1, (npair, 3, N))),
        )

    p0a, p1a = endpoints(ba, model.pair_p0_a, model.pair_p1_a)
    p0b, p1b = endpoints(bb, model.pair_p0_b, model.pair_p1_b)
    d1, d2, r = p1a - p0a, p1b - p0b, p0a - p0b

    def dot(u, v):
        return jnp.sum(u * v, axis=1)                         # (np, N)

    a, e, b = dot(d1, d1), dot(d2, d2), dot(d1, d2)
    c, f = dot(d1, r), dot(d2, r)
    denom = a * e - b * b
    s = jnp.clip((b * f - c * e) / (denom + eps), 0.0, 1.0)
    t = jnp.clip((b * s + f) / (e + eps), 0.0, 1.0)
    s = jnp.clip((b * t - c) / (a + eps), 0.0, 1.0)
    ca = p0a + s[:, None, :] * d1
    cb = p0b + t[:, None, :] * d2
    delta = ca - cb
    dist = jnp.sqrt(dot(delta, delta) + eps)                  # (np, N)
    # Robust normal (mirror of collision.detect_pair_contacts): fall back
    # to +-cross(d1, d2) when the axes (nearly) intersect, ez if parallel.
    cr = cross_l(d1, d2)
    crn = jnp.sqrt(dot(cr, cr))[:, None, :]                   # (np, 1, N)
    # midpoint-difference sign tie-break (see collision.detect_pair_contacts)
    ref = 0.5 * (p0a + p1a) - 0.5 * (p0b + p1b)
    sgn = jnp.where(dot(cr, ref)[:, None, :] >= 0.0, 1.0, -1.0)
    ez_fb = jnp.zeros((npair, 3, N)).at[:, 2, :].set(1.0)
    n_fb = jnp.where(crn > 1e-6, sgn * cr / (crn + eps), ez_fb)
    n = jnp.where((dist > 1e-3)[:, None, :], delta / dist[:, None, :], n_fb)
    rsum = np.asarray(model.pair_radius_a + model.pair_radius_b, np.float32)
    phi = dist - jnp.asarray(rsum)[:, None]

    near_z = jnp.abs(n[:, 2, :]) > 0.9                        # (np, N)
    ex = jnp.zeros((npair, 3, N)).at[:, 0, :].set(1.0)
    ez = jnp.zeros((npair, 3, N)).at[:, 2, :].set(1.0)
    u = jnp.where(near_z[:, None, :], ex, ez)
    t1 = cross_l(n, u)
    t1 = t1 / jnp.sqrt(dot(t1, t1))[:, None, :]
    t2 = cross_l(n, t1)
    frame = jnp.stack([t1, t2, n], axis=1)                    # (np, 3, 3, N)

    Jrel = _point_jacobians_lanes(model, kin, anc_mask[ba], ca) \
        - _point_jacobians_lanes(model, kin, anc_mask[bb], cb)
    Jc = jnp.sum(frame[:, :, :, None, :] * Jrel[:, None, :, :, :], axis=2)
    return phi, Jc, frame


@f32_matmuls
def detect_contacts_lanes(model: RobotModel, terrain: Terrain, kin: KinL,
                          anc_mask: np.ndarray) -> ContactsL:
    body = model.cand_body
    nc = model.ncand_terrain
    nj, nv = model.nj, model.nv
    N = kin.o.shape[-1]
    off = jnp.asarray(np.asarray(model.cand_offset, np.float32))[:, :, None]
    rad = jnp.asarray(np.asarray(model.cand_radius, np.float32))

    Rb = kin.R[body]                                          # (nc, 3, 3, N)
    ob = kin.o[body]                                          # (nc, 3, N)
    x = ob + matvec3_l(Rb, jnp.broadcast_to(off, (nc, 3, N)))

    mask = anc_mask[body]                                     # (nc, nj)
    J = _point_jacobians_lanes(model, kin, mask, x)

    if terrain.kind == "plane":
        phi = x[:, 2, :] - rad[:, None]
        frame = None
        Jc = J
    else:
        p = jnp.moveaxis(x, 1, -1)                             # (nc, N, 3)
        # deepest-of-5-columns tangent-plane gap (terrain.surface_gap)
        d, n = terrain_mod.surface_gap(terrain, p, rad[:, None])
        n = jnp.moveaxis(n, -1, 1)                             # (nc, 3, N)
        phi = d - rad[:, None]
        ex = jnp.zeros((nc, 3, N)).at[:, 0, :].set(1.0)
        t1 = ex - n * n[:, 0:1, :]
        t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=1))[:, None, :]
        t2 = cross_l(n, t1)
        frame = jnp.stack([t1, t2, n], axis=1)                 # (nc, 3, 3, N)
        Jc = jnp.sum(frame[:, :, :, None, :] * J[:, None, :, :, :], axis=2)

    if model.npair:
        phi_p, Jp, frame_p = detect_pair_contacts_lanes(model, kin, anc_mask)
        if frame is None:
            frame = jnp.broadcast_to(
                jnp.eye(3)[None, :, :, None], (nc, 3, 3, N)
            )
        phi = jnp.concatenate([phi, phi_p])
        Jc = jnp.concatenate([Jc, Jp])
        frame = jnp.concatenate([frame, frame_p])

    nct = model.ncand
    return ContactsL(phi=phi, E=Jc.reshape(3 * nct, nv, N), frame=frame)
