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


def rms_merge_moments(
    state: RmsState, s1: jnp.ndarray, s2: jnp.ndarray, n: jnp.ndarray
) -> RmsState:
    """Welford merge of a batch given its raw moments (sum x, sum x^2, n).

    The merge is exact moment pooling, so the final state depends only on
    the TOTAL accumulated moments — merge order and grouping are free
    (associative): per-step merges, one per-iteration merge of the summed
    deltas, and cross-shard psum-then-merge all land on the same state.
    """
    batch_mean = s1 / n
    batch_var = s2 / n - jnp.square(batch_mean)

    delta = batch_mean - state.mean
    tot = state.count + n
    new_mean = state.mean + delta * n / tot
    m_a = state.var * state.count
    m_b = batch_var * n
    m2 = m_a + m_b + jnp.square(delta) * state.count * n / tot
    return RmsState(mean=new_mean, var=m2 / tot, count=tot)


def rms_moments(x: jnp.ndarray):
    """Local batch moments (sum, sum of squares, count) over the leading
    axis."""
    n = jnp.asarray(x.shape[0], dtype=x.dtype)
    return jnp.sum(x, axis=0), jnp.sum(jnp.square(x), axis=0), n


def rms_update(
    state: RmsState, x: jnp.ndarray, axis_name: Optional[str] = None
) -> RmsState:
    """Welford merge of the batch (leading axis) into the running moments.

    axis_name: cross-shard moment reduction as ONE fused psum (the three
    moment tensors cross the wire concatenated — collective discipline,
    runs/scaling/PROJECTION.md).
    """
    s1, s2, n = rms_moments(x)
    if axis_name is not None:
        fused = jnp.concatenate(
            [jnp.ravel(s1), jnp.ravel(s2), jnp.reshape(n, (1,))]
        )
        fused = jax.lax.psum(fused, axis_name)
        k = s1.size
        s1 = fused[:k].reshape(jnp.shape(s1))
        s2 = fused[k:2 * k].reshape(jnp.shape(s2))
        n = fused[2 * k]
    return rms_merge_moments(state, s1, s2, n)


def rms_stats(state: RmsState):
    """Raw accumulated moments (sum x, sum x^2, count) of a state —
    the inverse of rms_merge_moments' pooling, used to form cross-shard
    moment DELTAS at the iteration boundary."""
    s1 = state.mean * state.count
    s2 = (state.var + jnp.square(state.mean)) * state.count
    return s1, s2, state.count


def rms_normalize(state: RmsState, x: jnp.ndarray, eps: float = 1e-8):
    return (x - state.mean) / jnp.sqrt(state.var + eps)
