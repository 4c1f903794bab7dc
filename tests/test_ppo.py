"""PPO learner tests: GAE math, single-host training smoke, and the
multi-chip shard_map path on the virtual 8-device CPU mesh
(SURVEY.md §4 layers 4-5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.envs.env import CatEnv, EnvCfg
from cat_tpu.models.solo12 import SOLO12_ACTUATED_JOINT_ORDER, solo12_model
from cat_tpu.rl.normalize import rms_init, rms_normalize, rms_update
from cat_tpu.rl.ppo import PPO, PpoCfg
from cat_tpu.tasks.solo12_flat import solo12_constraint_terms


def _small_env(n):
    model = solo12_model()
    cfg = EnvCfg(num_envs=n, episode_length_s=2.0)
    return CatEnv(model, cfg, solo12_constraint_terms(model),
                  SOLO12_ACTUATED_JOINT_ORDER)


def _small_cfg(n, steps=4):
    return PpoCfg(num_steps=steps, num_iterations=4,
                  minibatch_size=n * steps // 2)


def test_rms_welford_matches_numpy():
    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(32, 5)) * 3 + 1 for _ in range(4)]
    st = rms_init((5,))
    for x in xs:
        st = rms_update(st, jnp.asarray(x))
    allx = np.concatenate(xs)
    # count starts at 1 with unit variance (reference RunningMeanStd init),
    # so compare loosely after many samples
    np.testing.assert_allclose(np.array(st.mean), allx.mean(0), atol=0.1)
    np.testing.assert_allclose(np.array(st.var), allx.var(0), rtol=0.15)
    z = rms_normalize(st, jnp.asarray(allx))
    assert abs(float(z.mean())) < 0.1


def test_gae_dual_done_reference_impl():
    """The scanned GAE must match a direct numpy port of the reference
    recurrence (cleanrl/ppo.py:250-277)."""
    T, N = 6, 3
    rng = np.random.default_rng(1)
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = rng.uniform(0, 1, size=(T, N)).astype(np.float32)
    tdones = (rng.uniform(size=(T, N)) < 0.2).astype(np.float32)
    next_value = rng.normal(size=N).astype(np.float32)
    next_done = rng.uniform(0, 1, size=N).astype(np.float32)
    next_tdone = (rng.uniform(size=N) < 0.2).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_ref = np.zeros_like(rewards)
    lastgaelam = 0
    for t in reversed(range(T)):
        if t == T - 1:
            nnt = (1.0 - next_done) * (1.0 - next_tdone)
            nv = next_value
        else:
            nnt = (1.0 - dones[t + 1]) * (1.0 - tdones[t + 1])
            nv = values[t + 1]
        delta = rewards[t] + gamma * nv * nnt - values[t]
        adv_ref[t] = lastgaelam = delta + gamma * lam * nnt * lastgaelam

    # scanned version (mirrors rl/ppo.py)
    def gae_step(carry, inp):
        lastgaelam, nextvalue, nextnonterm = carry
        reward, value, done, tdone = inp
        delta = reward + gamma * nextvalue * nextnonterm - value
        lastgaelam = delta + gamma * lam * nextnonterm * lastgaelam
        return (lastgaelam, value, (1.0 - done) * (1.0 - tdone)), lastgaelam

    nn_last = (1.0 - next_done) * (1.0 - next_tdone)
    _, adv = jax.lax.scan(
        gae_step,
        (jnp.zeros(N), jnp.asarray(next_value), jnp.asarray(nn_last)),
        tuple(map(jnp.asarray, (rewards, values, dones, tdones))),
        reverse=True,
    )
    np.testing.assert_allclose(np.array(adv), adv_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_iteration_smoke():
    n = 8
    env = _small_env(n)
    cfg = _small_cfg(n)
    ppo = PPO(env, cfg)
    es = env.init(jax.random.PRNGKey(0), n)
    obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs)
    fn = jax.jit(ppo.train_iteration)
    p0 = jax.tree_util.tree_leaves(ts.params)[0].copy()
    for _ in range(2):
        ts, es, metrics = fn(ts, es)
    assert np.isfinite(float(metrics["Loss/mean_surrogate_loss"]))
    assert np.isfinite(float(metrics["Train/mean_reward_per_step"]))
    assert int(ts.iteration) == 2
    p1 = jax.tree_util.tree_leaves(ts.params)[0]
    assert not np.allclose(np.array(p0), np.array(p1))  # params updated


@pytest.mark.slow
def test_multichip_shard_map():
    """Full train step over a 4-device mesh: runs, params stay replicated."""
    from cat_tpu.parallel import mesh as pmesh

    ndev = 4
    devices = jax.devices()[:ndev]
    assert len(devices) == ndev, "conftest should provide 8 CPU devices"
    mesh = pmesh.make_mesh(devices)
    n = 8 * ndev
    env = _small_env(n)
    cfg = _small_cfg(n)
    ppo, build = pmesh.make_train_fn(env, cfg, mesh)
    es = env.init(jax.random.PRNGKey(0), n)
    obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs)
    ts = pmesh.shard_states(mesh, ts, n)
    es = pmesh.shard_states(mesh, es, n)
    fn = build(ts, es)
    ts, es, metrics = fn(ts, es)
    assert np.isfinite(float(metrics["Loss/mean_surrogate_loss"]))
    # params replicated: every shard copy identical
    leaf = jax.tree_util.tree_leaves(ts.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # env state sharded over devices
    q = es.sim.qpos
    assert len(q.addressable_shards) == ndev


def test_backend_agent_cfgs():
    """Backend presets mirror the reference yaml recipes (rl_games_cat_solo.
    yaml, skrl_ppo_cfg.yaml)."""
    from cat_tpu.rl import agent_cfgs

    rg = agent_cfgs.get("rl_games")
    assert rg.resolved_lr_mode == "adaptive_kl"
    assert rg.kl_target == 0.008 and rg.value_bootstrap and not rg.shared_model
    sk = agent_cfgs.get("skrl", num_envs=4096)
    assert sk.shared_model and sk.kl_target == 0.01
    assert sk.minibatch_size == 4096 * 24 // 4
    assert sk.learning_rate == 1e-3 and sk.ent_coef == 0.005
    cl = agent_cfgs.get("clean_rl")
    assert cl.resolved_lr_mode == "linear" and cl.minibatch_size == 16384


@pytest.mark.slow
def test_train_iteration_backend_variants():
    """One iteration each under the rl_games-style (adaptive-KL LR + value
    bootstrap) and skrl-style (shared trunk) variants: finite losses, lr
    stays within AdaptiveScheduler bounds, params update."""
    n = 8
    env = _small_env(n)
    base = _small_cfg(n)
    for variant in (
        dataclasses.replace(base, lr_mode="adaptive_kl", kl_target=0.008,
                            value_bootstrap=True),
        dataclasses.replace(base, shared_model=True,
                            lr_mode="adaptive_kl", kl_target=0.01),
    ):
        ppo = PPO(env, variant)
        es = env.init(jax.random.PRNGKey(0), n)
        obs = jax.jit(env.observe)(es)
        ts = ppo.init(jax.random.PRNGKey(1), es, obs)
        fn = jax.jit(ppo.train_iteration)
        p0 = jax.tree_util.tree_leaves(ts.params)[0].copy()
        ts, es, metrics = fn(ts, es)
        assert np.isfinite(float(metrics["Loss/mean_surrogate_loss"]))
        lr = float(ts.lr)
        assert variant.lr_min <= lr <= variant.lr_max
        p1 = jax.tree_util.tree_leaves(ts.params)[0]
        assert not np.allclose(np.array(p0), np.array(p1))


def test_adaptive_kl_lr_pinned_trajectory():
    """Pin the adaptive-KL LR update against a hand-computed rl_games
    AdaptiveScheduler sequence (schedulers.AdaptiveScheduler semantics,
    configured by rl_games_cat_solo.yaml:43-45: kl_threshold 0.008,
    min 1e-6, max 1e-2, factor 1.5)."""
    from cat_tpu.rl.ppo import adaptive_kl_lr

    tgt, lo, hi = 0.008, 1e-6, 1e-2
    kls = [0.02, 0.02, 0.001, 0.005, 0.03, 0.0001]
    # hand-computed: /1.5 when kl > 0.016, *1.5 when kl < 0.004, else hold
    expect = [
        3e-4 / 1.5,                # 0.02  > 2*tgt
        3e-4 / 1.5 / 1.5,          # 0.02
        3e-4 / 1.5 / 1.5 * 1.5,    # 0.001 < tgt/2
        3e-4 / 1.5,                # 0.005 in band -> hold
        3e-4 / 1.5 / 1.5,          # 0.03
        3e-4 / 1.5,                # 0.0001
    ]
    lr = jnp.float32(3e-4)
    for kl, want in zip(kls, expect):
        lr = adaptive_kl_lr(lr, jnp.float32(kl), tgt, lo, hi)
        np.testing.assert_allclose(float(lr), want, rtol=1e-6)
    # bounds: growth capped at max_lr, shrink floored at min_lr
    assert float(adaptive_kl_lr(jnp.float32(8e-3), 0.0001, tgt, lo, hi)) == (
        np.float32(hi)
    )
    assert float(adaptive_kl_lr(jnp.float32(1.2e-6), 0.5, tgt, lo, hi)) == (
        np.float32(lo)
    )


@pytest.mark.slow
def test_skrl_epoch_lr_vs_rl_games_minibatch_lr():
    """Pin the adaptation CADENCE: skrl's KLAdaptiveLR steps once per EPOCH
    on the epoch-mean KL (skrl/ppo.py:476,558-567), rl_games' Adaptive-
    Scheduler steps once per MINIBATCH. With kl_target huge every step is a
    *1.5 growth (uncapped), so after one iteration the lr must be exactly
    lr0 * 1.5^epochs (skrl rule) vs lr0 * 1.5^(epochs*minibatches)
    (rl_games rule) — the step-count IS the semantic difference."""
    n = 8
    env = _small_env(n)
    base = dataclasses.replace(
        _small_cfg(n), updates_epochs=2, kl_target=1e3, lr_max=1e6,
    )
    n_minibatches = (n * base.num_steps) // base.minibatch_size
    assert n_minibatches == 2
    lrs = {}
    for mode in ("adaptive_kl", "adaptive_kl_epoch"):
        cfg = dataclasses.replace(base, lr_mode=mode)
        ppo = PPO(env, cfg)
        es = env.init(jax.random.PRNGKey(0), n)
        obs = jax.jit(env.observe)(es)
        ts = ppo.init(jax.random.PRNGKey(1), es, obs)
        ts, es, _ = jax.jit(ppo.train_iteration)(ts, es)
        lrs[mode] = float(ts.lr)
    lr0 = base.learning_rate
    np.testing.assert_allclose(
        lrs["adaptive_kl"], lr0 * 1.5 ** (2 * 2), rtol=1e-5
    )
    np.testing.assert_allclose(
        lrs["adaptive_kl_epoch"], lr0 * 1.5 ** 2, rtol=1e-5
    )
