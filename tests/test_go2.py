"""Second robot family (Go2-class quadruped): the asset pipeline, engine,
env, and learner must all work on a different model with no code changes —
only config (SURVEY.md §7.1 item 3's config-only robot story)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.models.go2 import GO2_KD, GO2_KP, go2_model
from cat_tpu.sim import engine as em
from cat_tpu.sim.engine import EngineParams
from cat_tpu.tasks.go2_flat import make_env


def test_model_sanity():
    m = go2_model()
    assert m.nj == 12 and m.nv == 18
    assert abs(float(m.mass.sum()) - 15.1) < 0.1
    assert m.uniform_3dof_branches()
    assert len(m.foot_report_ids) == 4
    # feet report under their own link names (fixed joints merged for
    # dynamics but kept as contact-report frames)
    feet = [m.report_names[i] for i in m.foot_report_ids]
    assert sorted(feet) == ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]


@pytest.fixture(scope="module")
def settled():
    """4 envs dropped from default pose and PD-held for 1.5 s."""
    model = go2_model()
    params = EngineParams(kp=GO2_KP, kd=GO2_KD)
    step = jax.jit(em.make_batched_step(model, params, num_envs=4))
    s = em.make_batched_init(model, 4)
    target = jnp.broadcast_to(jnp.asarray(model.default_qpos_joints), (4, 12))
    mu = jnp.full((4,), 1.0)
    for _ in range(75):
        s = step(s, target, mu)
    return model, s


def test_go2_stands(settled):
    model, s = settled
    z = np.array(s.qpos[:, 2])
    assert np.all(z > 0.2) and np.all(z < 0.45), f"bad stand height {z}"
    quat = np.array(s.qpos[:, 3:7])
    tilt = 2 * np.sqrt(quat[:, 1] ** 2 + quat[:, 2] ** 2)
    assert np.all(tilt < 0.25), f"tilted {tilt}"
    assert np.all(np.abs(np.array(s.qvel)) < 0.6)


def test_go2_weight_supported(settled):
    model, s = settled
    total_fz = np.array(
        s.forces.reshape(4, model.nreport, 3)[:, :, 2].sum(axis=1)
    )
    weight = float(model.mass.sum()) * 9.81
    np.testing.assert_allclose(total_fz, weight, rtol=0.25)


def test_go2_env_step_and_learn():
    env = make_env(num_envs=8)
    assert env.num_obs == 45 and env.num_actions == 12
    es = env.init(jax.random.PRNGKey(0), 8)
    step = jax.jit(env.step)
    for _ in range(3):
        es, obs, rew, dones, time_out = step(es, jnp.zeros((8, 12)))
    assert np.all(np.isfinite(np.array(obs)))
    assert np.all(np.array(rew) >= 0.0)
    assert np.all((np.array(dones) >= 0) & (np.array(dones) <= 1))

    from cat_tpu.rl.ppo import PPO, PpoCfg
    cfg = PpoCfg(num_steps=4, num_iterations=2, minibatch_size=16)
    ppo = PPO(env, cfg)
    obs0 = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs0)
    tf = jax.jit(ppo.train_iteration)
    ts, es, metrics = tf(ts, es)
    assert np.isfinite(float(metrics["Loss/mean_surrogate_loss"]))
