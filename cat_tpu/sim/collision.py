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


def detect_contacts(
    model: RobotModel, terrain: Terrain, kin: Kin, anc_mask: np.ndarray
) -> Contacts:
    """Evaluate all candidate points against the terrain (single env)."""
    body = model.cand_body  # static numpy (ncand,)
    off = jnp.asarray(model.cand_offset)
    rad = jnp.asarray(model.cand_radius)

    Rb = kin.R[body]            # (ncand, 3, 3) — static gather
    ob = kin.o[body]
    x = ob + jnp.einsum("cij,cj->ci", Rb, off)      # candidate centers
    # velocity of the body-fixed point
    vel = kin.v_o[body] + jnp.cross(kin.omega[body], x - ob)

    # world-frame Jacobians: base cols + masked joint cols
    ncand = model.ncand
    mask = jnp.asarray(anc_mask[body].astype(np.float32))  # (ncand, nj)
    Jlin = jnp.broadcast_to(jnp.eye(3), (ncand, 3, 3))
    Jang = -skew(x - kin.o[0]) @ kin.R[0]
    rel = x[:, None, :] - kin.o_j[None, :, :]
    jc = jnp.cross(kin.a_w[None, :, :], rel) * mask[:, :, None]
    J = jnp.concatenate([Jlin, Jang, jnp.swapaxes(jc, 1, 2)], axis=2)

    if terrain.kind == "plane":
        phi = x[:, 2] - rad
        surf = x.at[:, 2].add(-rad)
        return Contacts(pos=surf, phi=phi, vel=vel, J=J, frame=None)

    # heightfield: vertical gap scaled by normal z (approx signed distance)
    h = terrain_mod.height_at(terrain, x[:, :2])
    n = terrain_mod.normal_at(terrain, x[:, :2])    # (ncand, 3)
    phi = (x[:, 2] - h) * n[:, 2] - rad
    # contact frame rows (t1, t2, n): t1 = ex projected off n
    ex = jnp.array([1.0, 0.0, 0.0])
    t1 = ex[None, :] - n * n[:, 0:1]
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([t1, t2, n], axis=1)          # (ncand, 3, 3)
    Jc = jnp.einsum("cij,cjk->cik", frame, J)
    surf = x - n * rad[:, None]
    return Contacts(pos=surf, phi=phi, vel=vel, J=Jc, frame=frame)


def detect_plane_contacts(
    model: RobotModel, kin: Kin, anc_mask: np.ndarray
) -> Contacts:
    """Back-compat wrapper: plane terrain."""
    return detect_contacts(model, terrain_mod.plane(), kin, anc_mask)
