"""ctypes bindings for the native story feeder (native/story_feeder.cpp):
multithreaded C++ batch packing so host pixel work overlaps device compute.

Falls back transparently to the numpy protocol when the .so is not built
(`make -C native`). API mirrors data/protocol.build_story_example for the
pixel tensors; tokenization stays in Python."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libstory_feeder.so")
_lib = None


def load_library(path: Optional[str] = None):
    """Load (and memoize) the native library; returns None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = path or os.environ.get("RCDMS_FEEDER_LIB", _LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.feeder_create.restype = ctypes.c_void_p
    lib.feeder_create.argtypes = [ctypes.c_int]
    lib.feeder_submit_story.restype = None
    lib.feeder_submit_story.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, f32p, f32p, f32p]
    lib.feeder_wait.restype = None
    lib.feeder_wait.argtypes = [ctypes.c_void_p]
    lib.feeder_destroy.restype = None
    lib.feeder_destroy.argtypes = [ctypes.c_void_p]
    lib.pack_story.restype = None
    lib.pack_story.argtypes = lib.feeder_submit_story.argtypes[1:]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


class NativeFeeder:
    """Thread-pooled story packer. Usage:

        feeder = NativeFeeder(num_threads=4)
        out = feeder.pack_batch(frame_arrays, known_lengths, size, csize)

    Output arrays come from an internal pre-faulted ring of `buffer_depth`
    buffer sets (first-touch page faults on ~300 MB of fresh numpy pages per
    batch cost ~6x the actual pixel work). A returned batch is overwritten
    `buffer_depth` pack_batch calls later — consumers must device_put /
    copy before then (the training loops do so immediately). Returned
    arrays are read-only views into the ring so accidental in-place
    mutation fails loudly; consumers that prefetch or hold more than
    `buffer_depth - 1` batches must raise `buffer_depth` (exposed as
    `StoryH5Dataset.feeder_buffer_depth`) or pass `copy=True`."""

    def __init__(self, num_threads: int = 4, buffer_depth: int = 2):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError(
                "libstory_feeder.so not built — run `make -C native`")
        self._pool = self._lib.feeder_create(num_threads)
        self._depth = max(1, buffer_depth)
        self._rings: Dict = {}
        self._ring_idx: Dict = {}

    def close(self):
        if self._pool:
            self._lib.feeder_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def pack_batch(self, stories: Sequence[np.ndarray],
                   known_lengths: Sequence[int], size: int,
                   csize: int, copy: bool = False) -> Dict[str, np.ndarray]:
        """stories: list of (f, h, w, 3) uint8 arrays (equal shapes).
        Returns the batched pixel tensors (b leading dim) as read-only
        views into the internal ring (valid for `buffer_depth - 1` further
        pack_batch calls); `copy=True` returns owned, writable copies."""
        b = len(stories)
        f, h, w, _ = stories[0].shape
        m = size // 8
        key = (b, f, size, csize)
        ring = self._rings.get(key)
        if ring is None:
            shapes = {
                "target": (b, f, size, size, 3),
                "source": (b, f, size, size, 3),
                "reference_clip": (b, f, csize, csize, 3),
                "source_clip": (b, f, csize, csize, 3),
                "mask_clip": (b, f, csize, csize, 3),
                "mask_label": (b, f, m, m, 1),
            }
            ring = []
            for _ in range(self._depth):
                bufs = {k: np.empty(s, np.float32)
                        for k, s in shapes.items()}
                for a in bufs.values():
                    a.fill(0)  # pre-fault the pages once
                ring.append(bufs)
            self._rings[key] = ring
            self._ring_idx[key] = 0
        idx = self._ring_idx[key]
        self._ring_idx[key] = (idx + 1) % self._depth
        out = dict(ring[idx])
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        holds = []  # keep contiguous buffers alive until wait()
        for i, story in enumerate(stories):
            story = np.ascontiguousarray(story)
            holds.append(story)
            self._lib.feeder_submit_story(
                self._pool, story.ctypes.data_as(u8p), f, h, w, size, csize,
                int(known_lengths[i]),
                out["target"][i].ctypes.data_as(f32p),
                out["source"][i].ctypes.data_as(f32p),
                out["reference_clip"][i].ctypes.data_as(f32p),
                out["source_clip"][i].ctypes.data_as(f32p),
                out["mask_clip"][i].ctypes.data_as(f32p),
                out["mask_label"][i].ctypes.data_as(f32p))
        self._lib.feeder_wait(self._pool)
        if copy:
            out = {k: v.copy() for k, v in out.items()}
        else:
            # read-only views: writes to a ring-backed batch fail loudly
            # instead of silently corrupting a later batch
            ro = {}
            for k, v in out.items():
                view = v.view()
                view.flags.writeable = False
                ro[k] = view
            out = ro
        out["frame_known"] = (np.arange(f)[None, :]
                              < np.asarray(known_lengths)[:, None])
        return out
