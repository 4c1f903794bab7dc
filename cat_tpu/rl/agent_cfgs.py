"""Per-backend agent-config presets.

The reference ships the same Solo12 recipe through three RL stacks, each a
cfg entry point on the task registration (solo12/__init__.py:20-25):

  * CleanRL  — clean_rl_ppo_cfg.py:10-34 (the canonical recipe)
  * rl_games — rl_games_cat_solo.yaml (adaptive-KL LR kl .008, value
    bootstrap on timeouts, separate actor/critic)
  * skrl     — skrl_ppo_cfg.yaml (shared-trunk model, KLAdaptiveLR kl .01,
    lr 1e-3, ent 5e-3, vf 1.0 w/ value clip .2, 4 mini-batches)

All three map onto the single jitted PPO via PpoCfg's backend-variant knobs
(ppo.py: lr_mode / kl_target / value_bootstrap / shared_model).
"""

from __future__ import annotations

from .ppo import PpoCfg


def clean_rl() -> PpoCfg:
    """clean_rl_ppo_cfg.py:10-34 — PpoCfg defaults ARE this recipe."""
    return PpoCfg()


def rl_games() -> PpoCfg:
    """rl_games_cat_solo.yaml:39-76.

    max_epochs 2000, horizon 24, minibatch 16384, 5 mini-epochs, gamma .99,
    tau .95, e_clip .2, entropy 1e-3, critic_coef 2, grad_norm 1, lr 3e-4
    under the adaptive scheduler (kl_threshold .008), value_bootstrap on,
    clip_value on, separate actor/critic [512,256,128] elu.
    """
    return PpoCfg(
        lr_mode="adaptive_kl",
        kl_target=0.008,
        value_bootstrap=True,
        shared_model=False,
    )


def skrl(num_envs: int = 4096) -> PpoCfg:
    """skrl_ppo_cfg.yaml.

    rollouts 24, 5 learning epochs, 4 mini-batches (so minibatch =
    num_envs*24/4), lr 1e-3 under KLAdaptiveLR (kl_threshold .01), ratio/
    value clip .2, entropy 5e-3, value_loss_scale 1.0, grad clip 1.0,
    shared [512,256,128] elu trunk, trainer timesteps 48000 (= 2000 iters
    of 24). KLAdaptiveLR steps once per EPOCH on the epoch-mean KL
    (skrl/ppo.py:476,558-567) — lr_mode="adaptive_kl_epoch", unlike
    rl_games' per-minibatch AdaptiveScheduler.
    """
    return PpoCfg(
        learning_rate=1.0e-3,
        lr_mode="adaptive_kl_epoch",
        kl_target=0.01,
        minibatch_size=num_envs * 24 // 4,
        ent_coef=0.005,
        vf_coef=1.0,
        shared_model=True,
        value_bootstrap=False,
    )


_BACKENDS = {"clean_rl": clean_rl, "rl_games": rl_games, "skrl": skrl}


def get(backend: str, **kwargs) -> PpoCfg:
    if backend not in _BACKENDS:
        raise KeyError(
            f"unknown RL backend {backend!r}; available: {sorted(_BACKENDS)}"
        )
    return _BACKENDS[backend](**kwargs)
