"""Collision detection: fixed candidate contact set vs ground.

TPU-native replacement for PhysX broadphase/narrowphase (SURVEY.md §2.3).
Instead of dynamic contact generation, the model compiles a FIXED set of
candidate contact points (foot spheres, leg-capsule endpoints, base-box
corners — see urdf.py), and each step evaluates signed distance for ALL
candidates with masking. Static shapes: no recompiles, no host sync, XLA
fuses the whole thing into the step program.

Terrain: flat plane at z=0 for now (reference terrain_type="plane",
cat_flat_env_cfg.py:52-68); heightfield hook reserved for the rough-terrain
task (BASELINE.json config #3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .dynamics import Kin
from .maths import skew
from .model import RobotModel


class Contacts(NamedTuple):
    """Per-candidate contact data (single env; fixed size ncand)."""
    pos: jnp.ndarray      # (ncand, 3) world contact point (on body surface)
    phi: jnp.ndarray      # (ncand,) signed distance (<0 penetrating)
    normal: jnp.ndarray   # (ncand, 3) world contact normal (points up/out)
    vel: jnp.ndarray      # (ncand, 3) world velocity of the body point
    J: jnp.ndarray        # (ncand, 3, nv) point Jacobians


def detect_plane_contacts(
    model: RobotModel, kin: Kin, anc_mask: np.ndarray
) -> Contacts:
    """Evaluate all candidate points against the z=0 plane (single env)."""
    body = model.cand_body  # static numpy (ncand,)
    off = jnp.asarray(model.cand_offset)
    rad = jnp.asarray(model.cand_radius)

    Rb = kin.R[body]            # (ncand, 3, 3) — static gather
    ob = kin.o[body]
    x = ob + jnp.einsum("cij,cj->ci", Rb, off)      # candidate centers
    phi = x[:, 2] - rad                              # distance to plane
    surf = x.at[:, 2].add(-rad)                      # surface point
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), surf.shape)

    # velocity of the body-fixed point
    vel = kin.v_o[body] + jnp.cross(kin.omega[body], x - ob)

    # Jacobians: base cols + masked joint cols
    ncand = model.ncand
    mask = jnp.asarray(anc_mask[body].astype(np.float32))  # (ncand, nj)
    Jlin = jnp.broadcast_to(jnp.eye(3), (ncand, 3, 3))
    Jang = -skew(x - kin.o[0]) @ kin.R[0]
    rel = x[:, None, :] - kin.o_j[None, :, :]
    jc = jnp.cross(kin.a_w[None, :, :], rel) * mask[:, :, None]
    J = jnp.concatenate([Jlin, Jang, jnp.swapaxes(jc, 1, 2)], axis=2)
    return Contacts(pos=surf, phi=phi, normal=normal, vel=vel, J=J)
