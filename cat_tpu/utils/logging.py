"""Metric logging: JSONL always; TensorBoard or Weights & Biases on top.

Metric names mirror the reference (SURVEY.md §5.5) so curves are directly
comparable: Loss/*, Episode_Constraint_violation/cstr_*,
Episode_Constraint_probability/cstr_*, plus Perf/* gauges the reference
lacks. The writer choice mirrors the reference's TB-or-W&B switch
(cleanrl/ppo.py:127-138): ``writer="tensorboard"`` (default) or
``writer="wandb"`` — the latter requires the ``wandb`` package and degrades
to JSONL-only with a warning when it is unavailable (this image has no
network egress, so W&B is exercised via a fake module in tests).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, run_path: str, writer: str = "tensorboard",
                 wandb_init_kwargs: Optional[dict] = None):
        self.run_path = run_path
        os.makedirs(run_path, exist_ok=True)
        self._jsonl = open(os.path.join(run_path, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if writer == "wandb":
            try:
                import wandb

                wandb.init(
                    dir=run_path,
                    **(wandb_init_kwargs or {}),
                )
                self._wandb = wandb
            except Exception as e:  # no package / no network: JSONL still on
                print(f"wandb writer unavailable ({e}); logging JSONL only")
        elif writer == "tensorboard":
            try:  # torch is CPU-only in this image; TB writer is host-side
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=run_path)
            except Exception:
                pass
        elif writer != "none":
            raise ValueError(f"unknown writer {writer!r}")

    def log(self, metrics: Dict[str, float], step: int):
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in rec.items() if k != "step"}, step=step
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
