"""Background batch prefetching: overlap host-side decode/pack with device
compute.

The reference gets this from torch DataLoader worker processes
(`train_stage1.py:190-206`, num_workers=8); here a single daemon thread
drains the dataset iterator into a bounded queue while the device runs the
previous step. Works with both the numpy protocol and the native C++
feeder — `depth` must stay below the feeder's ring depth
(`StoryH5Dataset.feeder_buffer_depth`) so a queued batch is never
overwritten before the consumer takes it (the feeder returns read-only
views; see data/native_feeder.py)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchIterator:
    """Wrap a batch iterator with a depth-bounded background thread.

    Usage:
        batches = PrefetchIterator(dataset.batches(...), depth=1)
        for _ in range(steps):
            batch = next(batches)
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator, depth: int = 1):
        assert depth >= 1
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()

        def run():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    self._q.put(item)
            except BaseException as e:  # surfaced on next()
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="rcdms-prefetch")
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the producer unblocks and exits
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
