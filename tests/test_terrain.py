"""Terrain heightfield + rough env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.sim import terrain as T


def test_plane_height_and_normal():
    t = T.plane()
    xy = jnp.array([[0.0, 0.0], [3.0, -2.0]])
    np.testing.assert_allclose(T.height_at(t, xy), [0.0, 0.0])
    n = T.normal_at(t, xy)
    np.testing.assert_allclose(n, [[0, 0, 1], [0, 0, 1]])


def test_hfield_bilinear_interp():
    h = np.zeros((4, 4), dtype=np.float32)
    h[2, 2] = 1.0
    t = T.Terrain(kind="hfield", height=h, cell=1.0)
    # grid centered: cell (2,2) center at world (0.5, 0.5)
    v = float(T.height_at(t, jnp.array([0.5, 0.5])))
    np.testing.assert_allclose(v, 1.0, atol=1e-6)
    # halfway toward a zero neighbor -> 0.5
    v2 = float(T.height_at(t, jnp.array([0.0, 0.5])))
    np.testing.assert_allclose(v2, 0.5, atol=1e-6)


def test_hfield_normal_slopes_uphill():
    # height increasing with x -> normal tilts toward -x
    h = np.tile(np.arange(8, dtype=np.float32)[:, None] * 0.1, (1, 8))
    t = T.Terrain(kind="hfield", height=h, cell=0.1)
    n = np.array(T.normal_at(t, jnp.array([0.0, 0.0])))
    assert n[0] < -0.1 and n[2] > 0.5
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)


def test_generate_rough_spawn_pads_flat():
    """Spawn pads are FLAT (at the patch's platform height — borders sit at
    0 in the Isaac-Lab convention, so pyramid pads are elevated) and patch
    borders join continuously at ~0."""
    t = T.generate_rough(rows=2, cols=4, patch_m=4.0, cell=0.1, seed=0)
    assert t.height.shape == (80, 160)
    for r in range(2):
        for c in range(4):
            xy = t.patch_origin(r, c)
            probes = xy[None, :] + np.array(
                [[0.0, 0.0], [0.15, 0.0], [0.0, 0.15], [-0.15, -0.15]]
            )
            v = np.array(T.height_at(t, jnp.asarray(probes)))
            np.testing.assert_allclose(v, v[0], atol=1e-5)  # flat pad
    # pyramid patches (cols 1 and 2 of the 4-type cycle) have raised/sunk
    # platforms; borders between patches stay near 0 (no inter-patch cliffs)
    assert abs(float(T.height_at(t, jnp.asarray(t.patch_origin(1, 1))))) > 0.05
    border = np.array([[0.0, -4.0], [0.0, 0.0], [-4.0, 0.0], [4.0, 4.0]])
    hb = np.array(T.height_at(t, jnp.asarray(border)))
    assert np.all(np.abs(hb) < 0.06), hb


@pytest.mark.slow
def test_rough_env_smoke():
    from cat_tpu.tasks.solo12_rough import make_env

    env = make_env(num_envs=4, rows=2, cols=2)
    assert env.num_obs == 45 + 187
    state = env.init(jax.random.PRNGKey(0), 4)
    step = jax.jit(lambda s, a: env.step(s, a))
    for i in range(5):
        state, obs, reward, dones, time_outs = step(state, jnp.zeros((4, 12)))
    assert obs.shape == (4, 45 + 187)
    assert np.all(np.isfinite(np.array(obs)))
    assert np.all(np.isfinite(np.array(reward)))
    # spawn origins are patch centers
    assert np.array(state.origin).shape == (4, 2)
