"""Metrics/observability: step timing + scalar logging (the reference's
accelerate/TensorBoard logging, `train_stage1.py:263-264`, `train_stage2.py:
504-509`, replaced by a dependency-light scalar logger with optional
TensorBoard export) and jax.profiler trace hooks (the tracing subsystem the
reference lacks — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

logger = logging.getLogger("rcdms_tpu")


def setup_logging(level: int = logging.INFO) -> None:
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S", level=level)


@dataclass
class MetricLogger:
    """Appends JSONL scalars ({step, wall_time, **scalars}); optionally
    mirrors to TensorBoard when tensorboardX/tf is importable."""

    log_dir: str
    _file: object = field(default=None, repr=False)
    _tb: object = field(default=None, repr=False)

    def __post_init__(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._file = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        try:  # optional TB export
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            self._tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "wall_time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Per-step wall-clock + data-time breakdown (the reference's
    perf_counter bookkeeping, `train_stage2.py:417-419`)."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0

    def data_loaded(self):
        self.data_time = time.perf_counter() - self._t0

    def step_done(self):
        now = time.perf_counter()
        self.step_time = now - self._t0
        self._t0 = now
        return self.step_time, self.data_time


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace region; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
