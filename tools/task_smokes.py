"""Training smokes for the non-flagship tasks (VERDICT r2 next-step #8).

The rough-terrain Solo12 and Go2 tasks exist as registry entries
(tasks/solo12_rough.py, tasks/go2_flat.py) but had never been TRAINED.
This runs each for a short learning smoke (reward up, episode length up
vs the start) and writes runs/smokes/task_smokes.json as evidence that
they are working tasks, not config listings. Reference analog: BASELINE
config #3 (rough) and the multi-robot claim of the framework.

Usage: python tools/task_smokes.py [num_envs=64] [iters=100]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TASKS = ("Solo12-CaT-Rough-v0", "Go2-CaT-Flat-v0")
WINDOW = 15


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import numpy as np

    out, failures = {}, []
    for task in TASKS:
        run_name = f"smoke_{task.lower().replace('-', '_')}"
        cmd = [
            sys.executable, "scripts/train.py",
            "--task", task, "--num_envs", str(num_envs),
            "--seed", "5", "--max_iterations", str(iters),
            "--run_name", run_name,
            "--override", f"minibatch_size={num_envs * 24 // 6}",
        ]
        path = os.path.join("logs", "clean_rl", task, run_name)
        # fresh dir: MetricLogger appends, so a stale same-named run would
        # mix curves into the smoke stats
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        print("==>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        rows = [json.loads(l)
                for l in open(os.path.join(path, "metrics.jsonl"))]
        rew = np.asarray([r["Train/mean_reward_per_step"] for r in rows])
        eplen = np.asarray([r.get("Episode/length", 0.0) for r in rows])
        start_r, final_r = float(rew[:WINDOW].mean()), float(rew[-WINDOW:].mean())
        start_l, final_l = float(eplen[:WINDOW].mean()), float(eplen[-WINDOW:].mean())
        out[task] = {
            "reward_start": start_r, "reward_final": final_r,
            "ep_len_start": start_l, "ep_len_final": final_l,
        }
        if final_r <= start_r:
            failures.append(f"{task}: reward did not rise "
                            f"({start_r:.4f} -> {final_r:.4f})")
        if final_l <= start_l:
            failures.append(f"{task}: episode length did not rise "
                            f"({start_l:.0f} -> {final_l:.0f})")

    result = {"num_envs": num_envs, "iterations": iters,
              "tasks": out, "failures": failures, "pass": not failures}
    os.makedirs("runs/smokes", exist_ok=True)
    with open("runs/smokes/task_smokes.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    assert not failures, failures
    print("PASS: rough-terrain and Go2 tasks learn")


if __name__ == "__main__":
    main()
