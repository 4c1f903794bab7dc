"""Learning-improvement smoke (BASELINE.json config[0], SURVEY.md §4 item 4).

The reference's only quality signal is the training curve (reference
README.md:50-68 smoke procedure; cleanrl/ppo.py:126-372 recipe). This test is
the CPU-runnable distillation: 64 envs, 50 iterations of the full CaT PPO
recipe must show

  * mean tracking reward strictly improving,
  * a soft-constraint violation percentage falling (base_orientation — the
    strongest falling signal at smoke scale, 26% -> 14% measured over 100
    iterations at 64 envs; `cstr_contact` is ~0 from iteration 1 because
    early deaths are upside_down, so it carries no learning signal), and
  * episode length growing,

which is exactly what a collapsed CaT run (cstr_prob saturates -> reward
pinned at 0) would fail. Runs on the CPU backend via conftest.py.
"""

import jax
import numpy as np
import pytest

from cat_tpu.envs.env import CatEnv, EnvCfg
from cat_tpu.models.solo12 import SOLO12_ACTUATED_JOINT_ORDER, solo12_model
from cat_tpu.rl.ppo import PPO, PpoCfg
from cat_tpu.tasks.solo12_flat import solo12_constraint_terms

REWARD_KEY = "Train/mean_reward_per_step"
VIOL_KEY = "Episode_Constraint_violation/cstr_base_orientation"
EPLEN_KEY = "Episode/length"


@pytest.mark.slow
def test_reward_improves_and_constraint_violation_falls():
    n, iters = 64, 100
    model = solo12_model()
    env = CatEnv(model, EnvCfg(num_envs=n),
                 solo12_constraint_terms(model), SOLO12_ACTUATED_JOINT_ORDER)
    cfg = PpoCfg(num_steps=24, num_iterations=iters,
                 minibatch_size=n * 24 // 4)
    ppo = PPO(env, cfg)
    es = env.init(jax.random.PRNGKey(0), n)
    obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs)
    fn = jax.jit(ppo.train_iteration)

    rewards, viol, ep_len = [], [], []
    for _ in range(iters):
        ts, es, m = fn(ts, es)
        rewards.append(float(m[REWARD_KEY]))
        viol.append(float(m[VIOL_KEY]))
        ep_len.append(float(m.get(EPLEN_KEY, 0.0)))

    head = slice(0, 10)
    tail = slice(iters - 10, iters)
    r_head, r_tail = np.mean(rewards[head]), np.mean(rewards[tail])
    c_head, c_tail = np.mean(viol[head]), np.mean(viol[tail])
    l_head, l_tail = np.mean(ep_len[head]), np.mean(ep_len[tail])

    assert np.all(np.isfinite(rewards)), "reward went non-finite"
    # Reward must clearly rise (TPU reference run: 0.008 -> 0.021 by iter
    # 100 at 4096 envs; the 64-env CPU curve measured 0.0076 -> 0.0114,
    # a 1.5x improvement, so demand >25%).
    assert r_tail > r_head * 1.25, (
        f"reward did not improve: head {r_head:.4f} vs tail {r_tail:.4f}")
    # Soft-constraint violation percentage must fall as the policy learns
    # to hold the base level (64-env CPU curve: 26% -> 14%).
    assert c_tail < c_head, (
        f"cstr_base_orientation violation did not fall: "
        f"{c_head:.3f} -> {c_tail:.3f}")
    # Episodes must survive longer (early training dies in a handful of
    # steps; learned policies approach the 500-step timeout).
    assert l_tail > l_head, (
        f"episode length did not grow: {l_head:.1f} -> {l_tail:.1f}")
