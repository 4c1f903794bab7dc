"""Heightfield edge/ridge contact: bodies dropped onto pyramid apexes and
ridge lines must settle without tunneling (VERDICT r2 next-step #9).

The rough-terrain generator (terrain.generate_rough) produces pyramid
patches whose apexes and diagonal ridge lines are exactly the places where
the vertical-gap signed-distance approximation
phi = (z - h) * n_z - r (collision.py) is least accurate: the central-
difference normal is averaged across the crease. These tests pin that the
approximation stays conservative there — the body comes to rest ON the
surface, not inside or below it.

Reference analog: PhysX heightfield narrowphase under the rough variant
(BASELINE config #3).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.sim import engine as em
from cat_tpu.sim.engine import EngineParams
from cat_tpu.sim.terrain import Terrain, _pyramid, height_at
from tests.test_slope import _box_model


def _pyramid_terrain(slope: float = 0.4) -> Terrain:
    n, cell = 128, 0.1
    grid = _pyramid(n, cell, slope, pad=0)  # pad=0: sharp apex, no platform
    return Terrain(kind="hfield", height=np.ascontiguousarray(grid),
                   cell=cell, rows=1, cols=1, patch_m=n * cell)


def _settle(terr, xy, steps=100):
    """Drop the 4-corner box flat above (x, y); return final (qpos, qvel)."""
    model = _box_model()
    params = EngineParams()
    step = em.make_batched_step(model, params, num_envs=1, terrain=terr)
    s = em.make_batched_init(model, 1)
    h0 = float(height_at(terr, jnp.asarray(xy)))
    qpos = jnp.array([[xy[0], xy[1], h0 + 0.08, 1.0, 0.0, 0.0, 0.0]])
    s = s._replace(qpos=qpos.astype(jnp.float32))
    target = jnp.zeros((1, 0))
    mu = jnp.ones(1)

    @functools.partial(jax.jit, static_argnums=1)
    def run(s, length):
        def body(s, _):
            return step(s, target, mu), None
        s, _ = jax.lax.scan(body, s, None, length=length)
        return s

    s = run(s, steps)
    return np.asarray(s.qpos[0]), np.asarray(s.qvel[0]), model


def _corner_gaps(terr, qpos, model):
    from cat_tpu.sim.maths import quat_to_mat
    R = np.asarray(quat_to_mat(jnp.asarray(qpos[3:7])))
    pts = qpos[:3] + np.asarray(model.cand_offset) @ R.T
    h = np.asarray(height_at(terr, jnp.asarray(pts[:, :2])))
    return pts[:, 2] - h - float(model.cand_radius[0])


@pytest.mark.slow
@pytest.mark.parametrize(
    "spot",
    [
        pytest.param((0.0, 0.0), id="apex"),
        pytest.param((2.0, 2.0), id="diagonal-ridge"),
        pytest.param((2.0, 1.96), id="near-ridge"),
    ],
)
def test_box_settles_on_pyramid_features(spot):
    terr = _pyramid_terrain()
    qpos, qvel, model = _settle(terr, np.asarray(spot, np.float64))
    assert np.isfinite(qpos).all() and np.isfinite(qvel).all()
    # came to (near) rest — no tumbling off the crease
    assert np.linalg.norm(qvel[:3]) < 0.05, qvel[:6]
    gaps = _corner_gaps(terr, qpos, model)
    # no tunneling: every corner at or above the surface within 1 cm
    assert gaps.min() > -0.01, (spot, gaps)
    # in contact (not bounced away or hovering)
    assert gaps.min() < 0.01, (spot, gaps)
    # stayed near the drop point (didn't fly off the feature)
    assert np.linalg.norm(qpos[:2] - np.asarray(spot)) < 0.3, qpos[:3]


def test_surface_gap_detects_wall():
    """A sphere pressed horizontally into a steep step face must read a
    small/negative gap with the face's normal — the failure mode of the old
    single-column vertical-gap formula (VERDICT r3 weak #2), which saw only
    the low ground under the center and returned a large positive phi."""
    from cat_tpu.sim.terrain import surface_gap

    n, cell = 64, 0.1
    grid = np.zeros((n, n), dtype=np.float32)
    grid[:, n // 2:] = 0.3          # step up at y = 0
    terr = Terrain(kind="hfield", height=grid, cell=cell, rows=1, cols=1,
                   patch_m=n * cell)
    r = 0.05
    # center on the LOW side, 2 cm from the face, below the step top
    p = jnp.asarray([[0.0, -0.02, 0.15]])
    d, nrm = surface_gap(terr, p, jnp.asarray([r]))
    phi = float(d[0]) - r
    # old formula: (0.15 - 0) * 1 - 0.05 = +0.10 (no contact!)
    old_phi = 0.15 - r
    assert phi < 0.04, (phi, "wall not seen")
    assert phi < old_phi - 0.05
    # winning normal leans away from the face (points toward -y)
    assert float(nrm[0, 1]) < -0.3, np.asarray(nrm)
    # far from any face, the probe agrees with the flat-ground answer
    p2 = jnp.asarray([[-1.5, -1.5, 0.2]])
    d2, n2 = surface_gap(terr, p2, jnp.asarray([r]))
    np.testing.assert_allclose(float(d2[0]), 0.2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n2[0]), [0, 0, 1], atol=1e-5)


@pytest.mark.slow
def test_solo12_stands_on_obstacle_patch():
    """VERDICT r3 #7 DONE criterion: the robot PD-holds its default pose on
    a generated steps/obstacle patch (terrain type col 3) without falling,
    tunneling, or drifting off."""
    from cat_tpu.models.solo12 import SOLO12_KD, SOLO12_KP, solo12_model
    from cat_tpu.sim.terrain import generate_rough, height_at

    model = solo12_model()
    terr = generate_rough(rows=2, cols=4, patch_m=4.0, cell=0.1, seed=0)
    params = EngineParams(kp=SOLO12_KP, kd=SOLO12_KD)
    step = jax.jit(em.make_batched_step(model, params, num_envs=2,
                                        terrain=terr))
    s = em.make_batched_init(model, 2)
    # spawn on the hardest steps patch (row 1, col 3) and a noise patch
    spots = np.stack([terr.patch_origin(1, 3), terr.patch_origin(1, 0)])
    h0 = np.asarray(height_at(terr, jnp.asarray(spots)))
    qpos = np.array(s.qpos)
    qpos[:, 0:2] = spots
    qpos[:, 2] = h0 + 0.30
    s = s._replace(qpos=jnp.asarray(qpos))
    target = jnp.broadcast_to(jnp.asarray(model.default_qpos_joints), (2, 12))
    mu = jnp.ones(2)

    @functools.partial(jax.jit, static_argnums=1)
    def run(s, length):
        def body(s, _):
            return step(s, target, mu), None
        return jax.lax.scan(body, s, None, length=length)[0]

    s = run(s, 100)  # 2 s
    q = np.asarray(s.qpos)
    assert np.isfinite(q).all()
    h = np.asarray(height_at(terr, jnp.asarray(q[:, 0:2])))
    rel_z = q[:, 2] - h
    assert np.all(rel_z > 0.12) and np.all(rel_z < 0.40), rel_z
    # stayed on the pad
    assert np.all(np.linalg.norm(q[:, 0:2] - spots, axis=1) < 0.5)
