"""Summarize a rough-terrain run: trajectory table + per-env level distribution.

Produces the same table schema as runs/solo12_rough_r5/ANALYSIS.md (terrain
level / ep_len / reward / two_foot max_p / upside-down falls) from a run's
metrics.jsonl[.gz] plus per-env terrain-row histograms from its checkpoints.
Usage: python tools/rough_run_table.py <run_dir> [iters...]
"""
import gzip
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_metrics(run_dir):
    for name in ("metrics.jsonl.gz", "metrics.jsonl"):
        p = os.path.join(run_dir, name)
        if os.path.exists(p):
            op = gzip.open if name.endswith(".gz") else open
            with op(p, "rt") as f:
                return [json.loads(l) for l in f]
    raise SystemExit(f"no metrics in {run_dir}")


def window(rows, it, w=50):
    sel = [r for r in rows if abs(r["step"] - it) <= w]
    return sel or [min(rows, key=lambda r: abs(r["step"] - it))]


def main():
    run_dir = sys.argv[1]
    rows = load_metrics(run_dir)
    last = rows[-1]["step"]
    iters = [int(a) for a in sys.argv[2:]] or sorted(
        {min(last, i) for i in range(200, last + 1, 200)} | {last})
    print("| iter | terrain level | ep_len | reward/step | two_foot max_p"
          " | falls (upside) |")
    print("|---|---|---|---|---|---|")
    for it in iters:
        sel = window(rows, it)
        def m(k):
            return float(np.mean([r[k] for r in sel if k in r]))
        print(f"| {it} | {m('Curriculum/terrain_levels'):.2f}"
              f" | {m('Episode/length'):.0f}"
              f" | {m('Train/mean_reward_per_step'):.4f}"
              f" | {m('Curriculum/two_foot_contact_max_p'):.3f}"
              f" | {100*m('Episode/terminated_upside_down_frac'):.0f}% |")
    # checkpoint level distributions
    for name in sorted(os.listdir(run_dir)):
        if not name.startswith("ckpt"):
            continue
        try:
            with open(os.path.join(run_dir, name), "rb") as f:
                _, es = pickle.load(f)
        except Exception as e:  # partial write mid-run
            print(f"{name}: unreadable ({e})")
            continue
        r = np.asarray(es.terrain_row)
        print(f"{name}: mean {r.mean():.2f} median {np.median(r):.0f}"
              f" rows8-9 {int((r >= 8).sum())} ({100*(r >= 8).mean():.1f}%)"
              f" hist {np.bincount(r.astype(int), minlength=10).tolist()}")


if __name__ == "__main__":
    main()
