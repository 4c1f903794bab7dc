"""Render a learning-curve PNG from a run's metrics.jsonl.

Usage: python tools/plot_learning_curve.py <run_dir> [out.png]

Three small-multiple panels (never a dual axis): tracking reward per step,
episode length, and soft-constraint violation percentages. This is the
committed training evidence for the reference's smoke procedure
(reference README.md:50-68: train, then inspect the curves).
"""

from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# dataviz reference palette (light mode): categorical slots 1-3 validated
# all-pairs; surface/text tokens.
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e8e7e4"
S1, S2, S3 = "#2a78d6", "#eb6834", "#1baf7a"

VIOL_SERIES = [
    ("cstr_action_rate", "action rate", S1),
    ("cstr_joint_acceleration", "joint acceleration", S2),
    ("cstr_air_time", "air time", S3),
]


def _smooth(x, w=25):
    if len(x) < w:
        return np.asarray(x)
    k = np.ones(w) / w
    return np.convolve(x, k, mode="valid")


def _style(ax, title, ylabel):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=TEXT, fontsize=11, loc="left")
    ax.set_ylabel(ylabel, color=TEXT2, fontsize=9)
    ax.set_xlabel("iteration", color=TEXT2, fontsize=9)
    ax.tick_params(colors=TEXT2, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.8)
    for s in ax.spines.values():
        s.set_visible(False)


def main(run_dir: str, out: str | None = None):
    rows = [json.loads(line) for line in
            open(os.path.join(run_dir, "metrics.jsonl"))]
    it = np.arange(1, len(rows) + 1)
    out = out or os.path.join(run_dir, "learning_curve.png")

    n_panels = 4 if "Curriculum/terrain_levels" in rows[0] else 3
    fig, axes = plt.subplots(1, n_panels, figsize=(4.33 * n_panels, 3.6),
                             dpi=140)
    fig.patch.set_facecolor(SURFACE)

    rew = [r["Train/mean_reward_per_step"] for r in rows]
    ax = axes[0]
    sm = _smooth(rew)
    ax.plot(it[len(it) - len(sm):], sm, color=S1, lw=2,
            solid_joinstyle="round")
    ax.axhline(0.03, color=GRID, lw=1)
    ax.annotate("reward ceiling 1.5 x dt", (it[-1], 0.03), color=TEXT2,
                fontsize=8, ha="right", va="bottom")
    ax.annotate(f"{sm[-1]:.4f}", (it[-1], sm[-1]), color=TEXT,
                fontsize=9, ha="right", va="bottom")
    _style(ax, "Tracking reward per step", "reward")
    ax.set_ylim(0, 0.032)

    ln = [r.get("Episode/length", np.nan) for r in rows]
    ax = axes[1]
    sm = _smooth(ln)
    ax.plot(it[len(it) - len(sm):], sm, color=S1, lw=2,
            solid_joinstyle="round")
    ax.axhline(500, color=GRID, lw=1)
    ax.annotate("timeout (500)", (it[-1], 500), color=TEXT2, fontsize=8,
                ha="right", va="bottom")
    _style(ax, "Episode length", "control steps")
    ax.set_ylim(0, 520)

    ax = axes[2]
    for key, label, color in VIOL_SERIES:
        v = [r[f"Episode_Constraint_violation/{key}"] for r in rows]
        sm = _smooth(v)
        ax.plot(it[len(it) - len(sm):], sm, color=color, lw=2, label=label,
                solid_joinstyle="round")
    ax.legend(frameon=False, fontsize=8, labelcolor=TEXT2)
    _style(ax, "Constraint violation (% of steps)", "%")
    ax.set_ylim(0, 100)

    # rough-terrain runs: terrain-level curriculum panel
    if "Curriculum/terrain_levels" in rows[0] and len(axes) > 3:
        ax = axes[3]
        lv = [r["Curriculum/terrain_levels"] for r in rows]
        sm = _smooth(lv)
        ax.plot(it[len(it) - len(sm):], sm, color=S2, lw=2,
                solid_joinstyle="round")
        ax.annotate(f"{sm[-1]:.2f}", (it[-1], sm[-1]), color=TEXT,
                    fontsize=9, ha="right", va="bottom")
        _style(ax, "Mean terrain level (0-9)", "difficulty row")

    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
