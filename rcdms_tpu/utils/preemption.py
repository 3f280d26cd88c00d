"""Preemption-safe training: catch SIGTERM (the TPU-VM/GKE eviction
signal), finish the in-flight step, save a checkpoint, and exit cleanly.

The reference has no failure-recovery story beyond manual
`--resume_from_checkpoint` restarts (SURVEY.md §5); on preemptible TPU
pools an eviction between checkpoint cadences loses up to
`checkpointing_steps` of work. The handler here just flips a flag — the
training loop checks it at the step boundary (signal-async-safe, no work
is torn mid-step) and performs one final save with the normal checkpoint
path before exiting."""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Installs SIGTERM (+ optionally SIGINT) handlers that set a flag.

    Usage in a training loop:

        guard = PreemptionGuard.install()
        for step in ...:
            state, loss = step_fn(...)
            if guard.should_stop:
                save_checkpoint(...)
                break
    """

    def __init__(self):
        self._event = threading.Event()
        self._prev = {}

    @property
    def should_stop(self) -> bool:
        return self._event.is_set()

    def trigger(self, signum=None, frame=None) -> None:
        self._event.set()

    def should_stop_global(self) -> bool:
        """Multi-host-agreed stop flag. On >1-process runs this is a
        COLLECTIVE (a tiny scalar all-gather): every process must call it
        at the same point each step. Without agreement, hosts that observe
        SIGTERM at different step boundaries would enter the collective
        checkpoint save at different steps (or while peers still run the
        train step's all-reduce) and deadlock instead of saving. Any
        process's flag stops all of them."""
        import jax

        local = self._event.is_set()
        if jax.process_count() == 1:
            return local
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(local, np.int32))
        agreed = bool(np.max(np.asarray(flags)))
        if agreed:
            self._event.set()
        return agreed

    @classmethod
    def install(cls, signals=(signal.SIGTERM,)) -> "PreemptionGuard":
        guard = cls()
        for sig in signals:
            try:
                guard._prev[sig] = signal.signal(sig, guard.trigger)
            except (ValueError, OSError):
                pass  # non-main thread / unsupported platform: flag-only
        return guard

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()
