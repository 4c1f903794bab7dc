"""Actor-critic networks for CaT PPO.

Parity with the reference Agent (cleanrl/ppo.py:71-123): separate actor/critic
MLPs 512-256-128 with ELU, orthogonal init (sqrt(2) hidden, 1.0 value head,
0.01 action head), state-independent log-std initialized to 0. All matmuls
land on the MXU via XLA; the model is tiny (~0.4M params) so it is replicated
across chips (SURVEY.md §2.4: TP not needed).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    out_std: float

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.Dense(
                h,
                kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                bias_init=nn.initializers.zeros,
            )(x)
            x = nn.elu(x)
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.orthogonal(self.out_std),
            bias_init=nn.initializers.zeros,
        )(x)


class ActorCritic(nn.Module):
    num_actions: int
    hidden: Sequence[int] = (512, 256, 128)

    @nn.compact
    def __call__(self, obs):
        mean = MLP(self.hidden, self.num_actions, 0.01, name="actor")(obs)
        value = MLP(self.hidden, 1, 1.0, name="critic")(obs)
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.num_actions,)
        )
        return mean, log_std, value[..., 0]


class SharedActorCritic(nn.Module):
    """Shared-trunk actor-critic (the skrl agent-cfg shape: one [512,256,128]
    ELU net with a GaussianMixin policy head and a DeterministicMixin value
    head over the same features — reference skrl_ppo_cfg.yaml:3-26,
    runner.py:192-317 'shared model' path).
    """
    num_actions: int
    hidden: Sequence[int] = (512, 256, 128)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for i, h in enumerate(self.hidden):
            x = nn.Dense(
                h,
                kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                bias_init=nn.initializers.zeros,
                name=f"trunk_{i}",
            )(x)
            x = nn.elu(x)
        mean = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros, name="policy_head",
        )(x)
        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0),
            bias_init=nn.initializers.zeros, name="value_head",
        )(x)
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.num_actions,)
        )
        return mean, log_std, value[..., 0]


def sample_action(
    mean: jnp.ndarray, log_std: jnp.ndarray, key: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample from the diagonal Gaussian; returns (action, log_prob)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    action = mean + std * eps
    return action, gaussian_logp(mean, log_std, action)


def gaussian_logp(mean, log_std, action) -> jnp.ndarray:
    std = jnp.exp(log_std)
    logp = (
        -0.5 * jnp.square((action - mean) / std)
        - log_std - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(logp, axis=-1)


def gaussian_entropy(log_std, like: jnp.ndarray) -> jnp.ndarray:
    ent = jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
    return jnp.broadcast_to(ent, like.shape[:-1])
