"""Training metrics / observability (SURVEY.md §5.5).

The reference prints per-epoch ELBO to recipe logs; this writer keeps
that behavior (stdout) and adds structured JSONL + optional tensorboard
(via flax metric_writers when available) with the BASELINE counters:
ELBO/frame and frames/sec/chip.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None, stdout: bool = True):
        self.stdout = stdout
        self.jsonl = None
        self.tb = None
        if logdir:
            logdir = Path(logdir)
            logdir.mkdir(parents=True, exist_ok=True)
            self.jsonl = open(logdir / "metrics.jsonl", "a")
            try:
                from flax.metrics import tensorboard

                self.tb = tensorboard.SummaryWriter(str(logdir))
            except Exception:
                self.tb = None
        self._t0 = time.time()

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, "time": time.time() - self._t0, **scalars}
        if self.stdout:
            parts = " ".join(f"{k}={v:.6g}" for k, v in scalars.items())
            print(f"[step {step}] {parts}")
        if self.jsonl:
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        if self.tb:
            for key, value in scalars.items():
                self.tb.scalar(key, value, step)

    def close(self) -> None:
        if self.jsonl:
            self.jsonl.close()
        if self.tb:
            self.tb.flush()
