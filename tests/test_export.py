"""Policy export tests: the numpy bundle and TorchScript artifact must
reproduce the JAX actor's deterministic (mean) action exactly
(reference clean_rl/play.py:118-138 exports ONNX + TorchScript with the
obs normalizer folded into the forward pass)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.rl.export import export_policy
from cat_tpu.rl.ppo import PPO, PpoCfg
from cat_tpu.tasks.solo12_flat import make_env


def _trained_bits(shared_model=False):
    env = make_env(num_envs=4)
    cfg = PpoCfg(num_steps=4, num_iterations=1, minibatch_size=8,
                 shared_model=shared_model)
    ppo = PPO(env, cfg)
    es = env.init(jax.random.PRNGKey(0), 4)
    obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, obs)
    return ppo, ts, np.asarray(obs)


def _numpy_actor(bundle, obs):
    x = (obs - bundle["obs_mean"]) / np.sqrt(bundle["obs_var"] + 1e-8)
    i = 0
    while f"actor_w{i}" in bundle:
        x = x @ bundle[f"actor_w{i}"] + bundle[f"actor_b{i}"]
        if f"actor_w{i + 1}" in bundle:
            x = np.where(x > 0, x, np.expm1(x))  # ELU
        i += 1
    return x


@pytest.mark.parametrize("shared", [False, True])
def test_npz_bundle_matches_jax_actor(tmp_path, shared):
    ppo, ts, obs = _trained_bits(shared_model=shared)
    out = str(tmp_path / "export")
    export_policy(ppo, ts, out)
    bundle = dict(np.load(os.path.join(out, "policy_params.npz")))

    act_np = _numpy_actor(bundle, obs)
    mean_jax, _, _ = ppo.net.apply(
        ts.params, jnp.asarray(
            (obs - bundle["obs_mean"]) / np.sqrt(bundle["obs_var"] + 1e-8)
        )
    )
    np.testing.assert_allclose(act_np, np.asarray(mean_jax),
                               rtol=1e-4, atol=1e-5)


def test_torch_artifacts_match_numpy(tmp_path):
    torch = pytest.importorskip("torch")
    import warnings

    ppo, ts, obs = _trained_bits()
    out = str(tmp_path / "export")
    export_policy(ppo, ts, out)
    bundle = dict(np.load(os.path.join(out, "policy_params.npz")))
    act_np = _numpy_actor(bundle, obs)
    obs_t = torch.tensor(obs, dtype=torch.float32)

    # torch.export program (the supported path, no deprecation warnings)
    pt2 = os.path.join(out, "policy.pt2")
    assert os.path.exists(pt2), "torch.export artifact missing"
    ep = torch.export.load(pt2)
    act_ep = ep.module()(obs_t).detach().numpy()
    np.testing.assert_allclose(act_ep, act_np, rtol=1e-4, atol=1e-5)

    # legacy-compat TorchScript artifact (reference .pt format parity)
    pt = os.path.join(out, "policy.pt")
    assert os.path.exists(pt), "TorchScript artifact missing"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        mod = torch.jit.load(pt)
    act_ts = mod(obs_t).detach().numpy()
    np.testing.assert_allclose(act_ts, act_np, rtol=1e-4, atol=1e-5)
