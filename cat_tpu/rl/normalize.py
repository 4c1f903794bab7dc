"""Running mean/std normalizers as pytree state (psum-able across chips).

Parity with the reference RunningMeanStd + Welford moment merge
(cleanrl/ppo.py:12-62). Under a sharded env axis, batch moments are combined
across chips with psum BEFORE the Welford merge (SURVEY.md §2.4: "cross-chip
Welford merge or psum of (mean, M2, count)"), so every chip holds identical
normalizer state — the multi-chip run matches the single-chip math.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RmsState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray


def rms_init(shape=()) -> RmsState:
    return RmsState(
        mean=jnp.zeros(shape), var=jnp.ones(shape), count=jnp.ones(())
    )


def rms_update(
    state: RmsState, x: jnp.ndarray, axis_name: Optional[str] = None
) -> RmsState:
    """Welford merge of the batch (leading axis) into the running moments."""
    n_local = jnp.asarray(x.shape[0], dtype=x.dtype)
    s1 = jnp.sum(x, axis=0)
    s2 = jnp.sum(jnp.square(x), axis=0)
    n = n_local
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n = jax.lax.psum(n_local, axis_name)
    batch_mean = s1 / n
    batch_var = s2 / n - jnp.square(batch_mean)

    delta = batch_mean - state.mean
    tot = state.count + n
    new_mean = state.mean + delta * n / tot
    m_a = state.var * state.count
    m_b = batch_var * n
    m2 = m_a + m_b + jnp.square(delta) * state.count * n / tot
    return RmsState(mean=new_mean, var=m2 / tot, count=tot)


def rms_normalize(state: RmsState, x: jnp.ndarray, eps: float = 1e-8):
    return (x - state.mean) / jnp.sqrt(state.var + eps)
