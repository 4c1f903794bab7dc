"""Structured mass-matrix inverse vs dense reference."""

import jax.numpy as jnp
import numpy as np

from cat_tpu.models.solo12 import solo12_model
from cat_tpu.sim import dynamics


def test_solo12_is_uniform_3dof():
    model = solo12_model()
    assert model.uniform_3dof_branches()
    assert len(model.branches()) == 4


def test_structured_inverse_matches_dense():
    rng = np.random.default_rng(0)
    model = solo12_model()
    anc = model.ancestor_mask()
    q = model.default_qpos()
    q[7:] += rng.uniform(-0.5, 0.5, size=model.nj)
    quat = rng.normal(size=4); q[3:7] = quat / np.linalg.norm(quat)
    v = rng.normal(size=model.nv)
    kin = dynamics.fk(model, jnp.asarray(q), jnp.asarray(v))
    jacs = dynamics.body_jacobians(model, kin, anc)
    I_w = dynamics.world_inertias(model, kin)
    M = dynamics.mass_matrix(model, jacs, I_w)

    # the joint-joint block must really be leg-block-diagonal
    Mnp = np.array(M, dtype=np.float64)
    Mll = Mnp[6:, 6:]
    for i in range(4):
        for j in range(4):
            if i != j:
                blk = Mll[3 * i:3 * i + 3, 3 * j:3 * j + 3]
                assert np.abs(blk).max() < 1e-5, (i, j, blk)

    Minv = np.array(dynamics.mass_matrix_inverse(M, n_branch=4))
    np.testing.assert_allclose(Minv @ Mnp, np.eye(18), atol=5e-3)
    np.testing.assert_allclose(
        Minv, np.linalg.inv(Mnp), rtol=2e-2, atol=1e-3
    )
