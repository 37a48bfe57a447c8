"""Run-directory logger (reference utils/logging.py:7-59): creates
run_dir/{ckpts/, logs/}, writes training.log / messages.log with the same
line format, and adds step-timing / samples-per-sec meters (new — the
reference had no throughput observability, SURVEY.md §5).
"""
from __future__ import annotations

import collections
import json
import os
import time
from typing import Optional


class Logger:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.ckpt_dir = os.path.join(run_dir, "ckpts/")
        self.log_dir = os.path.join(run_dir, "logs/")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self.training_log = os.path.join(self.log_dir, "training.log")
        self._training_log_f = open(self.training_log, "a")
        self.messages_log = os.path.join(self.log_dir, "messages.log")
        self._messages_log_f = open(self.messages_log, "a")
        self.metrics_log = os.path.join(self.log_dir, "metrics.jsonl")
        self._metrics_log_f = open(self.metrics_log, "a")

    def close(self):
        self._training_log_f.close()
        self._messages_log_f.close()
        self._metrics_log_f.close()

    def log(self, loss, step, train, valid):
        """Same format string as reference utils/logging.py:46-47."""
        self._training_log_f.write(
            "{0} @ step: {1} | Training: {2:.4f} | Validation {3:.4f} \n".format(
                loss, step, train, valid))
        self._training_log_f.flush()

    def message(self, msg: str):
        self._messages_log_f.write(msg + "\n")
        self._messages_log_f.flush()

    def metrics(self, step: int, **kv):
        self._metrics_log_f.write(json.dumps({"step": step, **kv}) + "\n")
        self._metrics_log_f.flush()


class MovingAverageMeter:
    """Windowed moving average (torchnet MovingAverageValueMeter analogue,
    reference pretrain_tnt.py:178)."""

    def __init__(self, window: int = 5):
        self.values = collections.deque(maxlen=window)

    def add(self, v: float):
        self.values.append(float(v))

    @property
    def value(self) -> float:
        return sum(self.values) / len(self.values) if self.values else float("nan")


class Throughput:
    """samples/sec meter over a sliding window of steps."""

    def __init__(self, window: int = 20):
        self.times = collections.deque(maxlen=window)
        self.counts = collections.deque(maxlen=window)

    def tick(self, num_samples: int):
        self.times.append(time.perf_counter())
        self.counts.append(num_samples)

    @property
    def samples_per_sec(self) -> Optional[float]:
        if len(self.times) < 2:
            return None
        dt = self.times[-1] - self.times[0]
        n = sum(list(self.counts)[1:])
        return n / dt if dt > 0 else None
