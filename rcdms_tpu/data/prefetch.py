"""Background batch prefetching: overlap host-side decode/pack with device
compute.

The reference gets this from torch DataLoader worker processes
(`train_stage1.py:190-206`, num_workers=8); here a single daemon thread
drains the dataset iterator into a bounded queue while the device runs the
previous step.

Native-feeder interaction: the C++ feeder returns read-only views into a
ring of `feeder_buffer_depth` buffers (data/native_feeder.py) that are
REUSED after that many `pack_batch` calls. With prefetching, up to
`depth + 2` batches are alive at once (one held by the consumer, `depth`
queued, one being packed), so callers must size the ring at least that
deep — `required_feeder_depth(depth)`; the train CLIs do this
automatically."""

from __future__ import annotations

import queue
import threading
from typing import Iterator


def required_feeder_depth(prefetch_depth: int) -> int:
    """Minimum native-feeder ring depth so no queued/held batch is
    overwritten while the producer packs ahead: consumer-held (1) +
    queued (depth) + in-flight pack (1)."""
    return prefetch_depth + 2


class PrefetchIterator:
    """Wrap a batch iterator with a depth-bounded background thread.

    Usage:
        batches = PrefetchIterator(dataset.batches(...), depth=1)
        for _ in range(steps):
            batch = next(batches)
        batches.close()
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
                    # bounded put that re-checks the stop flag, so close()
                    # can always unblock the producer
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                self._err = e
            finally:
                # the sentinel MUST reach the consumer on normal exhaustion
                # (or error) — bounded put that gives up only once close()
                # has stopped consumption
                while not self._stop.is_set():
                    try:
                        self._q.put(self._SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="rcdms-prefetch")
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            # after close() the producer may have exited without a
            # sentinel; a blocking get() would deadlock
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self, join_timeout: float = 5.0):
        """Stop the producer thread and release its resources. Safe to call
        multiple times; the underlying iterator's handles (h5/feeder) stop
        being driven once the thread exits."""
        self._stop.set()
        # wake any consumer blocked in get()
        try:
            self._q.put_nowait(self._SENTINEL)
        except queue.Full:
            pass
        # drain so a blocked put() observes the flag and the thread exits
        while self._thread.is_alive():
            try:
                self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
            if not self._thread.is_alive():
                break
            if join_timeout <= 0:
                break
            join_timeout -= 0.05
