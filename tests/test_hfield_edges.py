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
    grid = _pyramid(n, cell, slope)
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
