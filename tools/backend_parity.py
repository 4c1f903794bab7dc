"""Cross-backend parity run (VERDICT r1 #4 / r2 next-step #6).

The reference ships the same Solo12 CaT recipe through three RL stacks
(CleanRL, rl_games, skrl — solo12/__init__.py:20-25) precisely so users can
check the recipes agree; our backend presets (rl/agent_cfgs.py) map them
onto the one jitted PPO via lr_mode / kl_target / value_bootstrap /
shared_model knobs. This tool actually RUNS all three on the same seed and
env count and asserts the learning outcomes agree within tolerance:

  * reward/step rises from its start in every backend,
  * final-window mean reward within REL_TOL of the cross-backend median,
  * hard-constraint violation rates all driven low (< HARD_VIOL_PCT).

v2 curve-level gates (VERDICT r4 next-step #5 — full-length runs must
agree on the PATH, not just the endpoint):
  * episode-length final window within EP_LEN_REL_TOL of the median,
  * each hard-violation CURVE (smoothed over SMOOTH iters): mean absolute
    deviation from the cross-backend median curve over the last 75% of
    training < CURVE_MAD_PP percentage points, pointwise max <
    CURVE_MAX_PP.

Writes runs/parity/backend_parity.json (+ overlay plot if matplotlib).

Usage: python tools/backend_parity.py [num_envs=256] [iters=200] [seed=7]
                                      [rel_tol=0.35]

Round 4 ran this at RECIPE scale (4096 envs, 1000 iters, rel_tol 0.10);
round 5 extends to the full 2000-iter reference recipe
(clean_rl_ppo_cfg.py:16-17) with the curve gates on.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BACKENDS = ("clean_rl", "rl_games", "skrl")
REL_TOL = 0.35          # final reward within 35% of the cross-backend median
# Hard-constraint gate for this SHORT horizon: 200 iters at 256 envs is
# early training — foot_contact_force still fires a few % of steps while
# the gait forms (the full 2000-iter 4096-env flagship run ends at 0.5%,
# runs/solo12_flat_r3). The parity claim here is that all three backends
# are in the same regime, not that they are converged.
HARD_VIOL_PCT = 10.0
WINDOW = 30             # final averaging window (iterations)

# v2 curve gates (active when iters >= 1000, i.e. recipe-scale runs).
# Calibration: the r4 1000-iter run ended ep_len 446/430/375 (skrl 12.8%
# off the median — the known largest spread, recorded in VERDICT r4);
# 20% bounds that with margin while still failing a backend that
# collapses. Hard-violation curves sit at 0-3% after the gait forms, so
# a 1.5 pp mean / 6 pp pointwise band on 51-iter-smoothed curves is a
# real constraint, not decoration.
EP_LEN_REL_TOL = 0.20
# Absolute floor for the ep_len band: the relative band alone assumed the
# iter-1000 scale (median ~430); the full 2000-iter recipe's post-anneal
# decline compresses ep_len to ~230-340, where the SAME +-60-step
# absolute spread reads as >20% relative. A backend is out of family only
# if it misses the median by both >20% AND >75 steps.
EP_LEN_ABS_TOL = 75.0
SMOOTH = 51             # centered moving-average window (iterations)
CURVE_MAD_PP = 1.5      # mean |dev from median curve|, last 75% of run
CURVE_MAX_PP = 6.0      # pointwise max deviation, last 75% of run

# hard constraints (max_p=1.0, no curriculum — cat_flat_env_cfg.py:289-312)
HARD = ("cstr_contact", "cstr_foot_contact_force", "cstr_front_hfe_position",
        "cstr_upsidedown")


def run_backend(backend: str, num_envs: int, iters: int, seed: int) -> str:
    # scale-qualified name: MetricLogger appends to metrics.jsonl, so
    # reusing a bare name across scales mixes curves from different runs
    run_name = f"parity_{backend}_{num_envs}x{iters}"
    cmd = [
        sys.executable, "scripts/train.py",
        "--task", "Solo12-CaT-Flat-v0",
        "--agent", backend,
        "--num_envs", str(num_envs),
        "--seed", str(seed),
        "--max_iterations", str(iters),
        "--run_name", run_name,
    ]
    if backend != "skrl":
        # preserve the reference's minibatch COUNT at reduced env counts:
        # clean_rl/rl_games use batch/6 (98304/16384 — clean_rl_ppo_cfg.py:
        # 19-20); the skrl preset already derives batch/4 from num_envs.
        cmd += ["--override", f"minibatch_size={num_envs * 24 // 6}"]
    path = os.path.join("logs", backend, "Solo12-CaT-Flat-v0", run_name)
    if os.environ.get("PARITY_REUSE") and os.path.exists(
            os.path.join(path, "metrics.jsonl")):
        print(f"==> reusing existing run {path}", flush=True)
        return path
    print("==>", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    return path


def load_metrics(run_path: str):
    rows = []
    with open(os.path.join(run_path, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def main():
    global REL_TOL
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    if len(sys.argv) > 4:
        REL_TOL = float(sys.argv[4])

    curves = {}
    for b in BACKENDS:
        path = run_backend(b, num_envs, iters, seed)
        rows = load_metrics(path)
        curves[b] = {
            "reward": [r["Train/mean_reward_per_step"] for r in rows],
            "ep_len": [r.get("Episode/length", 0.0) for r in rows],
            "hard_viol": {
                h: [r.get(f"Episode_Constraint_violation/{h}", 0.0)
                    for r in rows]
                for h in HARD
            },
        }

    import numpy as np

    summary, failures = {}, []
    finals = {}
    for b in BACKENDS:
        rw = np.asarray(curves[b]["reward"])
        start = float(rw[:WINDOW].mean())
        final = float(rw[-WINDOW:].mean())
        finals[b] = final
        hard_end = {
            h: float(np.asarray(v[-WINDOW:]).mean())
            for h, v in curves[b]["hard_viol"].items()
        }
        summary[b] = {
            "reward_start": start, "reward_final": final,
            "ep_len_final": float(
                np.asarray(curves[b]["ep_len"][-WINDOW:]).mean()),
            "hard_violation_pct_final": hard_end,
        }
        if final <= start:
            failures.append(f"{b}: reward did not rise ({start}->{final})")
        for h, v in hard_end.items():
            if v > HARD_VIOL_PCT:
                failures.append(f"{b}: {h} violation {v:.2f}% > "
                                f"{HARD_VIOL_PCT}%")

    med = float(np.median(list(finals.values())))
    for b, f_ in finals.items():
        rel = abs(f_ - med) / max(med, 1e-9)
        summary[b]["rel_to_median"] = rel
        if rel > REL_TOL:
            failures.append(
                f"{b}: final reward {f_:.4f} deviates {rel:.0%} from "
                f"median {med:.4f} (> {REL_TOL:.0%})")

    # ---- v2 curve-level gates (recipe-scale runs only) ----
    curve_gates_on = iters >= 1000
    if curve_gates_on:
        ep_med = float(np.median(
            [summary[b]["ep_len_final"] for b in BACKENDS]))
        for b in BACKENDS:
            dev = abs(summary[b]["ep_len_final"] - ep_med)
            rel = dev / max(ep_med, 1e-9)
            summary[b]["ep_len_rel_to_median"] = rel
            if rel > EP_LEN_REL_TOL and dev > EP_LEN_ABS_TOL:
                failures.append(
                    f"{b}: final ep_len {summary[b]['ep_len_final']:.0f} "
                    f"deviates {rel:.0%}/{dev:.0f} steps from median "
                    f"{ep_med:.0f} (> {EP_LEN_REL_TOL:.0%} and "
                    f"> {EP_LEN_ABS_TOL:.0f})")

        def smooth(x):
            k = np.ones(SMOOTH) / SMOOTH
            return np.convolve(np.asarray(x, dtype=np.float64), k,
                               mode="valid")

        tail = slice((iters - SMOOTH + 1) // 4, None)  # last 75% of run
        for h in HARD:
            sm = {b: smooth(curves[b]["hard_viol"][h]) for b in BACKENDS}
            n = min(len(v) for v in sm.values())
            stack = np.stack([sm[b][:n] for b in BACKENDS])
            med_curve = np.median(stack, axis=0)
            for bi, b in enumerate(BACKENDS):
                dev = np.abs(stack[bi] - med_curve)[tail]
                mad, mx = float(dev.mean()), float(dev.max())
                summary[b].setdefault("hard_curve_dev", {})[h] = {
                    "mean_pp": mad, "max_pp": mx}
                if mad > CURVE_MAD_PP:
                    failures.append(
                        f"{b}: {h} curve mean deviation {mad:.2f} pp > "
                        f"{CURVE_MAD_PP} pp")
                if mx > CURVE_MAX_PP:
                    failures.append(
                        f"{b}: {h} curve max deviation {mx:.2f} pp > "
                        f"{CURVE_MAX_PP} pp")

    out = {
        "num_envs": num_envs, "iterations": iters, "seed": seed,
        "window": WINDOW, "rel_tol": REL_TOL,
        "curve_gates": {
            "active": curve_gates_on, "ep_len_rel_tol": EP_LEN_REL_TOL,
            "ep_len_abs_tol": EP_LEN_ABS_TOL,
            "smooth_iters": SMOOTH, "curve_mad_pp": CURVE_MAD_PP,
            "curve_max_pp": CURVE_MAX_PP,
        },
        "hard_violation_pct_limit": HARD_VIOL_PCT,
        "summary": summary,
        "median_final_reward": med,
        "failures": failures,
        "pass": not failures,
    }
    os.makedirs("runs/parity", exist_ok=True)
    with open("runs/parity/backend_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(15, 7.5))
        axes = axes.ravel()
        for b in BACKENDS:
            axes[0].plot(curves[b]["reward"], label=b, alpha=0.85)
            axes[1].plot(curves[b]["ep_len"], label=b, alpha=0.85)
            for j, h in enumerate(HARD):
                axes[2 + j].plot(curves[b]["hard_viol"][h], label=b,
                                 alpha=0.85)
        axes[0].set_title(f"reward/step ({num_envs} envs, seed {seed})")
        axes[1].set_title("episode length")
        for j, h in enumerate(HARD):
            axes[2 + j].set_title(f"{h} violation %")
        for ax in axes:
            ax.set_xlabel("iteration")
            ax.legend()
            ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig("runs/parity/backend_parity.png", dpi=110)
        print("wrote runs/parity/backend_parity.png")
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e}")

    assert not failures, failures
    print("PASS: three RL backends agree within tolerance")


if __name__ == "__main__":
    main()
