"""Metric logging: JSONL always; TensorBoard when torch is available.

Metric names mirror the reference (SURVEY.md §5.5) so curves are directly
comparable: Loss/*, Episode_Constraint_violation/cstr_*,
Episode_Constraint_probability/cstr_*, plus Perf/* gauges the reference
lacks.
"""

from __future__ import annotations

import json
import os
from typing import Dict


class MetricLogger:
    def __init__(self, run_path: str):
        self.run_path = run_path
        os.makedirs(run_path, exist_ok=True)
        self._jsonl = open(os.path.join(run_path, "metrics.jsonl"), "a")
        self._tb = None
        try:  # torch is CPU-only in this image; TB writer is host-side anyway
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=run_path)
        except Exception:
            pass

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

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
