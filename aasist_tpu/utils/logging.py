"""Run metrics logging: JSONL always, TensorBoard when available.

Equivalent of the reference's observability (SURVEY.md §2 C16):
SummaryWriter scalars per epoch + ``metric_log.txt`` text log
(`main.py:79,131-132,172-174,209-210,233-236`).  JSONL is the primary
sink (machine-readable, no torch dependency); a TensorBoard event writer
is attached opportunistically.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, run_dir, use_tensorboard: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / "metrics.jsonl", "a")
        self._text = open(self.run_dir / "metric_log.txt", "a")
        self._text.write("=" * 5 + "\n")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(self.run_dir))
            except Exception:
                self._tb = None

    def scalar(self, name: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"t": time.time(), "name": name, "value": float(value),
             "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def text(self, line: str) -> None:
        self._text.write(line + "\n")
        self._text.flush()

    def close(self) -> None:
        self._jsonl.close()
        self._text.close()
        if self._tb is not None:
            self._tb.close()
