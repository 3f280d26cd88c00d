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
    mirrors to TensorBoard / Weights & Biases / Comet (the reference's
    `--report_to tensorboard|wandb|comet_ml` flag,
    `configs/stage1_config.py:132-141`). Backends are best-effort: a
    requested tracker whose package is not installed logs a warning and is
    skipped (JSONL is always written).

    `report_to`: iterable of {"tensorboard", "wandb", "comet_ml"}.
    `run_config`: hyperparameters forwarded to the tracker run (the
    reference's `init_trackers("text2image", config=vars(args))`,
    `train_stage1.py:263-264`)."""

    log_dir: str
    report_to: tuple = ("tensorboard",)
    run_config: Optional[Dict] = None
    project: str = "text2image"
    _file: object = field(default=None, repr=False)
    _tb: object = field(default=None, repr=False)
    _wandb: object = field(default=None, repr=False)
    _comet: object = field(default=None, repr=False)

    def __post_init__(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._file = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        if "tensorboard" in self.report_to:
            try:
                from torch.utils.tensorboard import (  # type: ignore
                    SummaryWriter,
                )

                self._tb = SummaryWriter(self.log_dir)
            except Exception:
                self._tb = None
        if "wandb" in self.report_to:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=self.project,
                                         dir=self.log_dir,
                                         config=self.run_config or {})
            except Exception as e:  # package missing / no credentials
                logger.warning("wandb requested but unavailable: %s", e)
                self._wandb = None
        if "comet_ml" in self.report_to:
            try:
                import comet_ml  # type: ignore

                self._comet = comet_ml.Experiment(project_name=self.project)
                if self.run_config:
                    self._comet.log_parameters(self.run_config)
            except Exception as e:
                logger.warning("comet_ml requested but unavailable: %s", e)
                self._comet = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "wall_time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in scalars.items()},
                            step=step)
        if self._comet is not None:
            self._comet.log_metrics(
                {k: float(v) for k, v in scalars.items()}, step=step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()


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


class ProfileWindow:
    """Start/stop a jax.profiler trace over a step window, robust to the
    loop ending early (max_train_steps or preemption inside the window):
    `close()` finalizes an active trace so the file is always written."""

    def __init__(self, trace_dir, start_step: int, num_steps: int):
        self.dir = trace_dir
        self.start = start_step
        self.end = start_step + num_steps
        self.active = False

    def tick(self, step: int) -> None:
        if self.dir is None:
            return
        import jax.profiler as prof

        if step == self.start and not self.active:
            prof.start_trace(self.dir)
            self.active = True
        elif step >= self.end and self.active:
            prof.stop_trace()
            self.active = False

    def close(self) -> None:
        if self.active:
            import jax.profiler as prof

            prof.stop_trace()
            self.active = False
