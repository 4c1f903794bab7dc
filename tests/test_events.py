"""Domain-randomization event parity tests (reference EventCfg,
cat_flat_env_cfg.py:182-239 + mdp/events.py): friction buckets, CoM
randomization, and reset-state distributions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.envs.env import CatEnv, EnvCfg, EventsCfg
from cat_tpu.models.solo12 import SOLO12_ACTUATED_JOINT_ORDER, solo12_model
from cat_tpu.tasks.solo12_flat import solo12_constraint_terms


def _env(events: EventsCfg, n=64):
    model = solo12_model()
    cfg = EnvCfg(num_envs=n, events=events)
    return CatEnv(model, cfg, solo12_constraint_terms(model),
                  SOLO12_ACTUATED_JOINT_ORDER)


def test_friction_buckets():
    """randomize_rigid_body_material num_buckets=100: per-env friction is
    drawn from at most 100 distinct values (cat_flat_env_cfg.py:186-196)."""
    env = _env(EventsCfg(friction_num_buckets=16), n=512)
    es = env.init(jax.random.PRNGKey(0), 512)
    mus = np.unique(np.asarray(es.mu))
    assert len(mus) <= 16
    assert mus.min() >= 0.5 and mus.max() <= 1.25
    # continuous mode: essentially all distinct
    env2 = _env(EventsCfg(friction_num_buckets=0), n=512)
    es2 = env2.init(jax.random.PRNGKey(0), 512)
    assert len(np.unique(np.asarray(es2.mu))) > 500


def test_com_randomization_changes_dynamics():
    """randomize_body_coms (events.py:20-56): per-env CoM offsets are
    sampled in range and actually alter the physics trajectory."""
    ev = EventsCfg(com_displacement=0.05, com_bodies=("base_link",),
                   push_enabled=False)
    env = _env(ev, n=8)
    es = env.init(jax.random.PRNGKey(0), 8)
    off = np.asarray(es.com_offset)
    assert off.shape == (8, env.model.nbody, 3)
    assert np.abs(off).max() <= 0.05
    # only base_link row is nonzero
    base_idx = env.model.body_names.index("base_link")
    nonzero_rows = np.unique(np.nonzero(np.abs(off).sum(-1))[1])
    np.testing.assert_array_equal(nonzero_rows, [base_idx])
    # offsets differ across envs
    assert not np.allclose(off[0, base_idx], off[1, base_idx])

    # the trajectory diverges from the unrandomized env under equal actions
    env0 = _env(dataclasses.replace(ev, com_displacement=0.0), n=8)
    es0 = env0.init(jax.random.PRNGKey(0), 8)
    a = jnp.zeros((8, env.num_actions))
    step = jax.jit(env.step)
    step0 = jax.jit(env0.step)
    s1, s0 = es, es0
    for _ in range(5):
        s1, *_ = step(s1, a)
        s0, *_ = step0(s0, a)
    dq = np.abs(np.asarray(s1.sim.qpos) - np.asarray(s0.sim.qpos)).max()
    assert dq > 1e-5, "CoM offsets had no effect on dynamics"


def test_reset_state_distribution():
    """reset events parity (cat_flat_env_cfg.py:198-225): pose xy U(+-0.05),
    yaw U(+-1.57), q = default * U(0.95, 1.05), qd = 0 (velocity SCALE of a
    zero default velocity — see env._reset_sim docstring)."""
    env = _env(EventsCfg(), n=2048)
    key = jax.random.PRNGKey(3)
    sim = env._reset_sim(key, 2048, jnp.zeros((2048, 2)))
    qpos = np.asarray(sim.qpos)
    qvel = np.asarray(sim.qvel)
    # xy within +-0.05 and roughly uniform
    assert np.abs(qpos[:, 0:2]).max() <= 0.05 + 1e-6
    assert np.abs(qpos[:, 0:2]).mean() > 0.015
    # z exactly default
    np.testing.assert_allclose(qpos[:, 2], 0.3, atol=1e-6)
    # joint scale in [0.95, 1.05] of defaults
    dflt = np.asarray(env.model.default_qpos_joints)
    ratio = qpos[:, 7:] / dflt[None, :]
    assert ratio.min() >= 0.95 - 1e-5 and ratio.max() <= 1.05 + 1e-5
    # joint velocities exactly zero (scale of zero default)
    np.testing.assert_array_equal(qvel, 0.0)
