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
