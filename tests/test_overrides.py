"""Tests for the dotted-path override system (the hydra-CLI equivalent,
SURVEY.md §5.6) and checkpoint restore validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cat_tpu.envs.env import EnvCfg
from cat_tpu.rl.ppo import PpoCfg
from cat_tpu.utils.overrides import apply_overrides, set_path


def test_override_scalar_and_nested():
    cfg = EnvCfg()
    cfg = apply_overrides(cfg, [
        "episode_length_s=5.0",
        "events.push_enabled=False",
        "commands.lin_vel_x=(-0.5, 1.0)",
        "noise.joint_vel=0.3",
    ])
    assert cfg.episode_length_s == 5.0
    assert cfg.events.push_enabled is False
    assert cfg.commands.lin_vel_x == (-0.5, 1.0)
    assert cfg.noise.joint_vel == 0.3
    # untouched siblings preserved
    assert cfg.events.friction_range == (0.5, 1.25)


def test_override_type_coercion_and_errors():
    cfg = PpoCfg()
    cfg = apply_overrides(cfg, ["learning_rate=1e-4", "num_steps=12"])
    assert cfg.learning_rate == 1e-4 and cfg.num_steps == 12
    with pytest.raises(KeyError, match="no field 'nope'"):
        set_path(EnvCfg(), "nope", 1)
    with pytest.raises(KeyError, match="valid fields"):
        set_path(EnvCfg(), "events.nope", 1)
    with pytest.raises(ValueError, match="expected a bool"):
        set_path(EnvCfg(), "events.push_enabled", 3)
    with pytest.raises(ValueError, match="not of the form"):
        apply_overrides(EnvCfg(), ["just_a_key"])


def test_make_env_overrides_reach_env_cfg():
    from cat_tpu.tasks import registry

    spec = registry.get("Solo12-CaT-Flat-v0")
    env = spec.make_env(num_envs=4,
                        overrides=("events.friction_num_buckets=0",
                                   "episode_length_s=4.0"))
    assert env.cfg.events.friction_num_buckets == 0
    assert env.cfg.episode_length_s == 4.0


def test_checkpoint_restore_validates(tmp_path):
    from cat_tpu.rl import checkpoint as ckpt

    class TS(tuple):
        pass

    ts = {"p": np.zeros((3, 2)), "it": np.zeros(())}
    es = {"q": np.ones((8, 5))}
    path = ckpt.save(str(tmp_path / "c1"), ts, es)

    # matching templates: round-trips
    ts2, es2 = ckpt.restore(path, ts, es)
    np.testing.assert_array_equal(ts2["p"], ts["p"])

    # strict: wrong shape raises with the leaf path named
    bad_es = {"q": np.ones((4, 5))}
    with pytest.raises(ValueError, match=r"\['q'\].*\(8, 5\)"):
        ckpt.restore(path, ts, bad_es)

    # non-strict: mismatched leaf keeps the template value
    ts3, es3 = ckpt.restore(path, ts, bad_es, strict=False)
    assert es3["q"].shape == (4, 5)
    np.testing.assert_array_equal(ts3["p"], ts["p"])

    # structure mismatch raises even non-strict
    with pytest.raises(ValueError, match="tree structure"):
        ckpt.restore(path, ts, {"q": np.ones((8, 5)), "extra": np.zeros(1)})


def test_constraint_table():
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.tasks.solo12_flat import solo12_constraint_terms
    from cat_tpu.envs.cat import ConstraintSet
    from tests.test_ppo import _small_env

    env = _small_env(2)
    s = env.cset.table()
    assert "joint_torque" in s and "upsidedown" in s
    assert "max_p" in s and "Curriculum" in s
    # one row per term + header/separators
    assert len(s.splitlines()) == len(env.cset.terms) + 5


def test_wandb_writer_option(tmp_path, monkeypatch):
    """MetricLogger writer="wandb" (reference cleanrl/ppo.py:127-138 W&B
    branch): drives a fake wandb module (no network in this image) and
    degrades to JSONL-only when the package is missing."""
    import json
    import sys
    import types

    from cat_tpu.utils.logging import MetricLogger

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda d, step=None: calls["log"].append((d, step))

    def _fin():
        calls["finish"] += 1

    fake.finish = _fin
    monkeypatch.setitem(sys.modules, "wandb", fake)

    lg = MetricLogger(str(tmp_path / "r1"), writer="wandb",
                      wandb_init_kwargs={"project": "cat"})
    lg.log({"Episode/reward": 1.5}, step=3)
    lg.close()
    assert calls["init"][0]["project"] == "cat"
    assert calls["log"] == [({"Episode/reward": 1.5}, 3)]
    assert calls["finish"] == 1
    with open(tmp_path / "r1" / "metrics.jsonl") as f:
        rec = json.loads(f.readline())
    assert rec == {"step": 3, "Episode/reward": 1.5}

    # missing package: no crash, JSONL still written
    monkeypatch.delitem(sys.modules, "wandb")
    monkeypatch.setattr("builtins.__import__", _blocked_import("wandb"))
    lg2 = MetricLogger(str(tmp_path / "r2"), writer="wandb")
    lg2.log({"a": 1.0}, step=1)
    lg2.close()
    with open(tmp_path / "r2" / "metrics.jsonl") as f:
        assert json.loads(f.readline())["a"] == 1.0


def _blocked_import(name):
    real = __import__

    def imp(mod, *a, **k):
        if mod == name:
            raise ImportError(f"{name} blocked for test")
        return real(mod, *a, **k)

    return imp
