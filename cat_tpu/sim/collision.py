"""Collision detection: fixed candidate contact set vs terrain.

TPU-native replacement for PhysX broadphase/narrowphase (SURVEY.md §2.3).
Instead of dynamic contact generation, the model compiles a FIXED set of
candidate contact points (foot spheres, leg-capsule endpoints, base-box
corners — see urdf.py), and each step evaluates signed distance for ALL
candidates with masking. Static shapes: no recompiles, no host sync, XLA
fuses the whole thing into the step program.

Terrain: flat plane at z=0 (reference terrain_type="plane",
cat_flat_env_cfg.py:52-68) or a heightfield (BASELINE.json config #3). For
the plane, the contact frame is the world frame (fast path). For
heightfields, each candidate gets a contact frame (t1, t2, n) from the
terrain normal and the Jacobian rows are rotated into it; the solver is
frame-agnostic (component 2 = normal).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from . import terrain as terrain_mod
from .dynamics import Kin
from .maths import skew
from .model import RobotModel
from .terrain import Terrain


class Contacts(NamedTuple):
    """Per-candidate contact data (single env; fixed size ncand)."""
    pos: jnp.ndarray      # (ncand, 3) world contact point (on body surface)
    phi: jnp.ndarray      # (ncand,) signed distance (<0 penetrating)
    vel: jnp.ndarray      # (ncand, 3) world velocity of the body point
    J: jnp.ndarray        # (ncand, 3, nv) point Jacobians IN CONTACT FRAME
    frame: Optional[jnp.ndarray]  # (ncand, 3, 3) rows=(t1,t2,n); None = world


def _point_jacobians(kin: Kin, mask: jnp.ndarray, x: jnp.ndarray):
    """World-frame point Jacobians for body-fixed points.

    x (k, 3) world points; mask (k, nj) float ancestor mask of the owning
    bodies. Returns (k, 3, nv).
    """
    k = x.shape[0]
    Jlin = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
    Jang = -skew(x - kin.o[0]) @ kin.R[0]
    rel = x[:, None, :] - kin.o_j[None, :, :]
    jc = jnp.cross(kin.a_w[None, :, :], rel) * mask[:, :, None]
    return jnp.concatenate([Jlin, Jang, jnp.swapaxes(jc, 1, 2)], axis=2)


def _segment_closest(p0a, d1, p0b, d2):
    """Closest-point parameters (s, t) between segments p0a+s d1, p0b+t d2.

    Branchless clamped form (robust for degenerate segments: spheres have
    d == 0). Shapes (k, 3) -> (k,), (k,).
    """
    eps = 1e-12
    r = p0a - p0b
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    denom = a * e - b * b
    s = jnp.clip((b * f - c * e) / (denom + eps), 0.0, 1.0)
    t = jnp.clip((b * s + f) / (e + eps), 0.0, 1.0)
    s = jnp.clip((b * t - c) / (a + eps), 0.0, 1.0)
    return s, t


def detect_pair_contacts(model: RobotModel, kin: Kin, anc_mask: np.ndarray):
    """Self-collision capsule-capsule contacts (single env).

    Replaces PhysX self-collisions (reference odri.py:35
    enabled_self_collisions=True). Returns (phi (np,), Jc (np, 3, nv) rows
    in the contact frame, frame (np, 3, 3) rows (t1, t2, n) with n pointing
    from body B toward body A, so +normal impulse separates the pair).
    """
    ba, bb = model.pair_body_a, model.pair_body_b
    Ra, oa = kin.R[ba], kin.o[ba]
    Rb_, ob_ = kin.R[bb], kin.o[bb]
    p0a = oa + jnp.einsum("cij,cj->ci", Ra, jnp.asarray(model.pair_p0_a))
    p1a = oa + jnp.einsum("cij,cj->ci", Ra, jnp.asarray(model.pair_p1_a))
    p0b = ob_ + jnp.einsum("cij,cj->ci", Rb_, jnp.asarray(model.pair_p0_b))
    p1b = ob_ + jnp.einsum("cij,cj->ci", Rb_, jnp.asarray(model.pair_p1_b))
    d1, d2 = p1a - p0a, p1b - p0b
    s, t = _segment_closest(p0a, d1, p0b, d2)
    ca = p0a + s[:, None] * d1
    cb = p0b + t[:, None] * d2
    delta = ca - cb
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
    # Robust normal: when the axes (nearly) intersect, delta/dist is
    # numerically arbitrary — its direction has ~zero inverse effective
    # mass and the Baumgarte term then demands a divergent impulse. The
    # limit direction for interior closest points is +-cross(d1, d2);
    # use it below 1 mm separation, sign-aligned with delta (ez fallback
    # when the axes are also near-parallel).
    cr = jnp.cross(d1, d2)
    crn = jnp.linalg.norm(cr, axis=-1, keepdims=True)
    # sign tie-break from the segment MIDPOINT difference, not delta: delta
    # is near-zero exactly where the fallback applies, so its sign is noise
    # and can flip the normal between substeps; midpoints of two distinct
    # capsules are well separated, giving a stable per-pair direction.
    ref = 0.5 * (p0a + p1a) - 0.5 * (p0b + p1b)
    sign = jnp.where(jnp.sum(cr * ref, axis=-1, keepdims=True) >= 0.0,
                     1.0, -1.0)
    n_fb = jnp.where(crn > 1e-6, sign * cr / (crn + 1e-12),
                     jnp.array([0.0, 0.0, 1.0]))
    n = jnp.where((dist > 1e-3)[:, None], delta / dist[:, None], n_fb)
    phi = dist - jnp.asarray(model.pair_radius_a + model.pair_radius_b)

    # tangent basis: reference axis ez unless n is near-vertical, then ex
    near_z = jnp.abs(n[:, 2]) > 0.9
    u = jnp.where(near_z[:, None], jnp.array([1.0, 0.0, 0.0]),
                  jnp.array([0.0, 0.0, 1.0]))
    t1 = jnp.cross(n, u)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([t1, t2, n], axis=1)

    mask_a = jnp.asarray(anc_mask[ba].astype(np.float32))
    mask_b = jnp.asarray(anc_mask[bb].astype(np.float32))
    Jrel = _point_jacobians(kin, mask_a, ca) - _point_jacobians(kin, mask_b, cb)
    Jc = jnp.einsum("cij,cjk->cik", frame, Jrel)
    return phi, Jc, frame


def _append_pairs(model, kin, anc_mask, phi, J, frame, surf, vel):
    """Concatenate self-collision rows after the terrain candidates."""
    phi_p, Jp, frame_p = detect_pair_contacts(model, kin, anc_mask)
    nt = model.ncand_terrain
    if frame is None:
        # plane terrain rows are in the world frame == identity contact frame
        frame = jnp.broadcast_to(jnp.eye(3), (nt, 3, 3))
    return Contacts(
        pos=jnp.concatenate([surf, jnp.zeros((model.npair, 3))]),
        phi=jnp.concatenate([phi, phi_p]),
        vel=jnp.concatenate([vel, jnp.zeros((model.npair, 3))]),
        J=jnp.concatenate([J, Jp]),
        frame=jnp.concatenate([frame, frame_p]),
    )


def detect_contacts(
    model: RobotModel, terrain: Terrain, kin: Kin, anc_mask: np.ndarray
) -> Contacts:
    """Evaluate all candidate points against the terrain (single env)."""
    body = model.cand_body  # static numpy (ncand_terrain,)
    off = jnp.asarray(model.cand_offset)
    rad = jnp.asarray(model.cand_radius)

    Rb = kin.R[body]            # (nct, 3, 3) — static gather
    ob = kin.o[body]
    x = ob + jnp.einsum("cij,cj->ci", Rb, off)      # candidate centers
    # velocity of the body-fixed point
    vel = kin.v_o[body] + jnp.cross(kin.omega[body], x - ob)

    # world-frame Jacobians: base cols + masked joint cols
    mask = jnp.asarray(anc_mask[body].astype(np.float32))  # (nct, nj)
    J = _point_jacobians(kin, mask, x)

    if terrain.kind == "plane":
        phi = x[:, 2] - rad
        surf = x.at[:, 2].add(-rad)
        if model.npair:
            return _append_pairs(model, kin, anc_mask, phi, J, None, surf, vel)
        return Contacts(pos=surf, phi=phi, vel=vel, J=J, frame=None)

    # heightfield: deepest-of-5-columns tangent-plane gap (robust near steep
    # faces/step edges — terrain.surface_gap; replaces the vertical-gap
    # approximation that missed walls)
    d, n = terrain_mod.surface_gap(terrain, x, rad)
    phi = d - rad
    # contact frame rows (t1, t2, n): t1 = ex projected off n
    ex = jnp.array([1.0, 0.0, 0.0])
    t1 = ex[None, :] - n * n[:, 0:1]
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([t1, t2, n], axis=1)          # (nct, 3, 3)
    Jc = jnp.einsum("cij,cjk->cik", frame, J)
    surf = x - n * rad[:, None]
    if model.npair:
        return _append_pairs(model, kin, anc_mask, phi, Jc, frame, surf, vel)
    return Contacts(pos=surf, phi=phi, vel=vel, J=Jc, frame=frame)


def detect_plane_contacts(
    model: RobotModel, kin: Kin, anc_mask: np.ndarray
) -> Contacts:
    """Back-compat wrapper: plane terrain."""
    return detect_contacts(model, terrain_mod.plane(), kin, anc_mask)
