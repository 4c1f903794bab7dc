"""Config-extensible event terms (EventTerm): all three firing modes.

The reference's EventManager accepts arbitrary user terms with
mode="startup"/"reset"/"interval" (cat_flat_env_cfg.py:182-239); our
built-ins (friction, reset randomization, pushes) are first-class cfg
fields, and EventsCfg.extra_terms carries user terms through the same
three slots. These tests add one term of each mode to a small env and pin
that each fires at the right time with the right data.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.envs.env import EventTerm
from cat_tpu.tasks.solo12_flat import make_env


def _env_with(terms, n=8, **cfg_over):
    from cat_tpu.models.solo12 import (
        SOLO12_ACTUATED_JOINT_ORDER, solo12_model)
    from cat_tpu.envs.env import CatEnv
    from cat_tpu.tasks.solo12_flat import solo12_constraint_terms

    base = make_env(num_envs=n)
    events = dataclasses.replace(base.cfg.events, extra_terms=tuple(terms),
                                 push_enabled=False)
    cfg = dataclasses.replace(base.cfg, events=events, **cfg_over)
    model = solo12_model()
    return CatEnv(
        model=model, cfg=cfg,
        constraint_terms=solo12_constraint_terms(model),
        actuated_joint_order=SOLO12_ACTUATED_JOINT_ORDER,
    )


def _startup_mu(key, n, model, value):
    return {"mu": jnp.full((n,), value)}


def _reset_lift(key, sim, rmask, model, dz):
    qpos = sim.qpos.at[:, 2].add(jnp.where(rmask, dz, 0.0))
    return sim._replace(qpos=qpos)


def _interval_spin(key, sim, state, cfg, wz):
    return sim._replace(qvel=sim.qvel.at[:, 5].set(wz))


def test_startup_term_sets_env_state_fields():
    env = _env_with([EventTerm("fix_mu", "startup", _startup_mu,
                               dict(value=0.123))])
    es = env.init(jax.random.PRNGKey(0), 8)
    np.testing.assert_allclose(np.asarray(es.mu), 0.123, atol=1e-6)


def test_reset_term_fires_only_on_reset_envs():
    n = 8
    env = _env_with([EventTerm("lift", "reset", _reset_lift,
                               dict(dz=3.0))], n=n,
                    episode_length_s=0.3)     # time_out at 15 control steps
    es = env.init(jax.random.PRNGKey(0), n)
    step = jax.jit(env.step)
    act = jnp.zeros((n, env.num_actions))
    hit = False
    for k in range(20):
        es, obs, rew, dones, tout = step(es, act)
        z = np.asarray(es.sim.qpos[:, 2])
        reset_now = np.asarray(es.episode_len) == 0
        if reset_now.any():
            hit = True
            # lifted 3 m by the reset event (spawn z is ~0.3)
            assert (z[reset_now] > 2.0).all(), z[reset_now]
            if (~reset_now).any():
                assert (z[~reset_now] < 2.0).all(), z[~reset_now]
            break
        assert (z < 2.0).all(), "lift fired without a reset"
    assert hit, "no env reset within 20 steps at 0.3 s episodes"


def test_interval_term_fires_every_step():
    n = 4
    env = _env_with([EventTerm("spin", "interval", _interval_spin,
                               dict(wz=2.5))], n=n)
    es = env.init(jax.random.PRNGKey(0), n)
    es, *_ = jax.jit(env.step)(es, jnp.zeros((n, env.num_actions)))
    np.testing.assert_allclose(np.asarray(es.sim.qvel[:, 5]), 2.5, atol=1e-6)
