"""The CaT transform: constraint violations -> termination probabilities.

Re-implements the math of the reference's ``CaT`` class + ConstraintManager
(constraint_manager.py:22-116, 213-229) as a pure function over a stacked
constraint tensor:

  per column k:  m_k     = max_over_envs(c_k) clamped >= 1e-6      (line 55)
                 rmax_k <- tau * rmax_k + (1-tau) * m_k,  tau=0.95 (59)
                 p_k     = where(c_k > 0,
                                 min_p + clip(c_k/rmax_k, 0, 1)*(max_p-min_p),
                                 0)                                 (64-72)
  cstr_prob    = max over all columns of p                          (78-82)

The cross-env max becomes a cross-CHIP ``lax.pmax`` when the env axis is
sharded (SURVEY.md §2.4 "batched-constraint reduction") — running_max is
global state shared by every env, exactly like the reference's singleton
dict of running maxes.

Terms are static metadata: (name, fn, params, init_max_p, column slice). The
per-term ``max_p`` lives in EnvState so the curriculum (curriculums.py:21-41)
can anneal it inside jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .types import StepData

TAU = 0.95     # polyak factor (constraint_manager.py:25)
MIN_P = 0.0    # minimum termination probability (constraint_manager.py:25)


class ConstraintTerm(NamedTuple):
    """Static config of one constraint term (ConstraintTermCfg equivalent,
    manager_constraint_cfg.py:23-27)."""
    name: str
    func: Callable[..., jnp.ndarray]
    params: Dict[str, Any]
    max_p: float
    curriculum: bool  # whether modify_constraint_p anneals this term


class ConstraintSet:
    """Build-time resolved constraint manager (ConstraintManager equivalent).

    Resolution (regex -> index arrays) happens in the task config; here we
    only precompute column layout. All compute is pure/jit-safe.
    """

    def __init__(self, terms: Sequence[ConstraintTerm], num_envs_probe: StepData):
        self.terms = tuple(terms)
        # probe column counts by tracing each term once via eval_shape
        self.slices: list[Tuple[int, int]] = []
        start = 0
        for t in self.terms:
            shape = jax.eval_shape(
                lambda d, tt=t: _as_2d(tt.func(d, **tt.params)), num_envs_probe
            ).shape
            self.slices.append((start, start + shape[1]))
            start += shape[1]
        self.total_cols = start

    @property
    def n_terms(self) -> int:
        return len(self.terms)

    def table(self) -> str:
        """Startup dump of the resolved constraint terms (the reference's
        PrettyTable __str__, constraint_manager.py:153-184)."""
        rows = [("Index", "Name", "max_p", "Curriculum", "Columns")]
        for i, (t, (a, b)) in enumerate(zip(self.terms, self.slices)):
            rows.append((str(i), t.name, f"{t.max_p:g}",
                         "yes" if t.curriculum else "no", str(b - a)))
        widths = [max(len(r[c]) for r in rows) for c in range(5)]
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        out = [f"Active Constraint Terms (shown in order of calculation):",
               sep]
        for j, r in enumerate(rows):
            out.append(
                "| " + " | ".join(v.ljust(w) for v, w in zip(r, widths)) + " |"
            )
            if j == 0:
                out.append(sep)
        out.append(sep)
        return "\n".join(out)

    def init_max_p(self) -> jnp.ndarray:
        return jnp.array([t.max_p for t in self.terms], dtype=jnp.float32)

    def init_running_max(self) -> jnp.ndarray:
        # -1 is a sentinel: any column still negative gets seeded with the
        # first observed cross-env max instead of polyak-blending from
        # scratch (constraint_manager.py:58-61 initializes running_maxes on
        # first sight). Keying the seed on the state itself (not on
        # common_step) keeps re-seeding correct for any fresh EnvState,
        # e.g. an eval env created mid-training.
        return jnp.full((self.total_cols,), -1.0, dtype=jnp.float32)

    def compute(
        self,
        data: StepData,
        running_max: jnp.ndarray,      # (Ktot,)
        max_p: jnp.ndarray,            # (n_terms,)
        axis_name: Optional[str] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (cstr_prob (N,), new_running_max, term_max_probs (N, n_terms),
        raw_violating (N, n_terms) bool)."""
        raw = jnp.concatenate(
            [_as_2d(t.func(data, **t.params)) for t in self.terms], axis=1
        )  # (N, Ktot)
        cmax = jnp.max(raw, axis=0)                       # cross-env max
        if axis_name is not None:
            cmax = jax.lax.pmax(cmax, axis_name)          # cross-chip
        cmax = jnp.maximum(cmax, 1e-6)
        # seed unseeded columns (sentinel < 0) with the first observed max,
        # polyak-blend otherwise (constraint_manager.py:58-61)
        new_rmax = jnp.where(
            running_max < 0.0, cmax, TAU * running_max + (1.0 - TAU) * cmax
        )

        # per-column max_p broadcast from per-term values
        col_max_p = jnp.concatenate(
            [
                jnp.broadcast_to(max_p[i], (sl[1] - sl[0],))
                for i, sl in enumerate(self.slices)
            ]
        )
        probs = jnp.where(
            raw > 0.0,
            MIN_P + jnp.clip(raw / new_rmax[None, :], 0.0, 1.0)
            * (col_max_p[None, :] - MIN_P),
            0.0,
        )
        cstr_prob = jnp.max(probs, axis=1)

        term_max_probs = jnp.stack(
            [jnp.max(probs[:, a:b], axis=1) for a, b in self.slices], axis=1
        )
        return cstr_prob, new_rmax, term_max_probs, term_max_probs > 0.0


def _as_2d(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, None] if x.ndim == 1 else x


def curriculum_max_p(
    terms: Sequence[ConstraintTerm],
    common_step: jnp.ndarray,
    num_steps: int,
) -> jnp.ndarray:
    """Anneal of soft-term max_p (reference curriculums.py:21-41).

    max_p(t) = 1 / (T_start + progress*(T_end - T_start)), T_start=20,
    T_end = 1/init_max_p; non-curriculum terms keep their configured max_p.
    """
    progress = jnp.minimum(common_step.astype(jnp.float32) / num_steps, 1.0)
    init = jnp.array([t.max_p for t in terms], dtype=jnp.float32)
    is_cur = jnp.array([t.curriculum for t in terms])
    t_start, t_end = 20.0, 1.0 / jnp.maximum(init, 1e-6)
    annealed = 1.0 / (t_start + progress * (t_end - t_start))
    return jnp.where(is_cur, annealed, init)
