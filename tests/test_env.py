"""End-to-end env smoke tests (SURVEY.md §4 layer 4, small-N CPU-runnable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.tasks.solo12_flat import make_env, solo12_constraint_terms
from cat_tpu.envs.env import CatEnv, EnvCfg
from cat_tpu.models.solo12 import SOLO12_ACTUATED_JOINT_ORDER, solo12_model


@pytest.fixture(scope="module")
def env8():
    return make_env(num_envs=8)


@pytest.fixture(scope="module")
def stepped(env8):
    env = env8
    key = jax.random.PRNGKey(0)
    state = env.init(key, 8)
    step = jax.jit(lambda s, a: env.step(s, a))
    obs = None
    for i in range(10):
        a = 0.1 * jax.random.normal(jax.random.PRNGKey(i), (8, 12))
        state, obs, reward, dones, time_outs = step(state, a)
    return env, state, obs, reward, dones, time_outs


def test_shapes_and_finiteness(stepped):
    env, state, obs, reward, dones, time_outs = stepped
    assert obs.shape == (8, 45)
    assert reward.shape == (8,)
    assert dones.shape == (8,)
    assert np.all(np.isfinite(np.array(obs)))
    assert np.all(np.isfinite(np.array(reward)))
    assert np.all(np.array(reward) >= 0.0)  # clipped at 0 (cat_env.py:102-106)
    d = np.array(dones)
    assert np.all((d >= 0.0) & (d <= 1.0))


def test_running_max_updates(stepped):
    env, state, *_ = stepped
    rm = np.array(state.running_max)
    assert rm.shape == (env.cset.total_cols,)
    assert np.all(rm >= 1e-6)
    # after steps with random actions, some constraints have seen violations
    assert rm.max() > 1e-3


def test_episode_counters(stepped):
    env, state, *_ = stepped
    assert int(state.common_step) == 10
    assert np.all(np.array(state.episode_len) <= 10)


def test_standing_reward_positive(env8):
    """Holding default pose with zero command should collect reward."""
    env = env8
    state = env.init(jax.random.PRNGKey(1), 8)
    state = state._replace(command=jnp.zeros((8, 3)))
    step = jax.jit(lambda s, a: env.step(s, a))
    total = 0.0
    for _ in range(25):
        state, obs, reward, dones, _ = step(state, jnp.zeros((8, 12)))
        total += float(reward.mean())
    # max possible is 1.5 * 0.02 * 25 = 0.75; standing still tracks zero cmd
    assert total > 0.3, f"standing reward too low: {total}"
    # and the robot should not be dying constantly
    assert float(dones.mean()) < 0.5


def test_timeout_resets():
    """With a short episode the env must time out, reset, and log stats."""
    model = solo12_model()
    cfg = EnvCfg(num_envs=4, episode_length_s=0.2)  # 10 control steps
    env = CatEnv(model, cfg, solo12_constraint_terms(model),
                 SOLO12_ACTUATED_JOINT_ORDER)
    state = env.init(jax.random.PRNGKey(2), 4)
    step = jax.jit(lambda s, a: env.step(s, a))
    saw_timeout = False
    for _ in range(12):
        state, obs, reward, dones, time_outs = step(state, jnp.zeros((4, 12)))
        saw_timeout |= bool(np.array(time_outs).any())
    assert saw_timeout
    assert float(state.acc_count) > 0  # episodes were logged
    state, metrics = env.drain_metrics(state)
    assert "Episode_Constraint_violation/cstr_joint_torque" in metrics
    assert float(state.acc_count) == 0.0  # drained


def test_obs_layout_against_state(env8):
    """Obs vector layout: [ang_vel*0.25, cmd*(2,2,.25), g*0.1, q, qd*0.05, a]
    (cat_flat_env_cfg.py:140-176). Check the command block exactly (no noise
    on commands)."""
    env = env8
    state = env.init(jax.random.PRNGKey(3), 8)
    step = jax.jit(lambda s, a: env.step(s, a))
    state, obs, *_ = step(state, jnp.zeros((8, 12)))
    cmd_block = np.array(obs[:, 3:6])
    expected = np.array(state.command) * np.array([2.0, 2.0, 0.25])
    np.testing.assert_allclose(cmd_block, expected, atol=1e-6)
    act_block = np.array(obs[:, 33:45])
    np.testing.assert_allclose(act_block, 0.0, atol=1e-6)
