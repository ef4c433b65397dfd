"""Streaming frame pipeline: producer thread -> native ring -> device.

Production shape of the reference's demo loop (load image, build pyramid,
track — test_optical_flow.cpp:41-83), restructured for throughput: a
producer thread decodes/acquires frames and pushes uint8 into the native
SPSC ring; the consumer pops, runs the fused native convert+pyramid, and
hands device arrays to the tracker while the producer works on the next
frame. Frames are dropped (not blocked on) when the ring is full, like a
real camera feed.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterable, Iterator

import numpy as np

from feature_tracker_tpu.runtime.native import get_runtime


class FrameStream:
    """Iterate (frame_id, pyramid levels as float32 numpy) over a source.

    Args:
      source: iterable of uint8 [H, W] frames (all the same shape).
      levels: pyramid levels to build per frame.
      capacity: ring slots; the producer drops frames when full.
    """

    def __init__(self, source: Iterable[np.ndarray], levels: int = 4,
                 capacity: int = 8,
                 on_drop: Callable[[int], None] | None = None):
        self._source = iter(source)
        self._levels = levels
        self._capacity = capacity
        self._on_drop = on_drop
        self._rt = get_runtime()
        self._ring = None
        self._shape = None
        self._produced = 0
        self._dropped = 0
        self._done = threading.Event()
        self._thread = None

    def _producer(self):
        for frame in self._source:
            frame = np.ascontiguousarray(frame, np.uint8)
            if self._ring is None:
                raise RuntimeError("ring not initialized")
            if not self._ring.push(frame):
                self._dropped += 1
                if self._on_drop is not None:
                    self._on_drop(self._produced)
            self._produced += 1
        self._done.set()

    def __iter__(self) -> Iterator:
        first = next(self._source, None)
        if first is None:
            return
        first = np.ascontiguousarray(first, np.uint8)
        self._shape = first.shape
        self._ring = self._rt.ring_buffer(self._capacity, first.nbytes)
        self._ring.push(first)
        self._produced = 1
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

        frame_id = 0
        while True:
            frame = self._ring.pop(self._shape)
            if frame is None:
                if self._done.is_set() and len(self._ring) == 0:
                    break
                # Producer (decode/camera) is slower than us: yield the
                # core briefly instead of busy-spinning on the empty ring.
                time.sleep(0.0005)
                continue
            pyramid = self._rt.convert_and_pyramid(frame, self._levels)
            yield frame_id, pyramid
            frame_id += 1

    @property
    def dropped(self) -> int:
        return self._dropped
