"""Host->device frame streaming with background prefetch.

Replaces the reference's capture thread + shared_mutex handoff
(rs_driver.cpp:136-225): a producer thread decodes/loads frames and stages
them on-device ahead of the consumer, so the accelerator never waits on
host I/O. The queue discipline also mirrors RsDriver's rate limiting
(rs_driver.cpp:196) via an optional min_interval.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterable, Iterator

import jax


class FrameStream:
    """Iterate (timestamp, device_array) with lookahead prefetching."""

    def __init__(
        self,
        source: Iterable,
        prefetch: int = 2,
        transfer: Callable | None = None,
        min_interval_s: float = 0.0,
    ):
        self._source = source
        self._queue: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        self._transfer = transfer or (lambda x: jax.device_put(x))
        self._min_interval = min_interval_s
        self._done = object()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._started = False
        self._exhausted = False

    def _producer(self) -> None:
        last = 0.0
        try:
            for item in self._source:
                ts, frame = item
                if self._min_interval > 0:
                    now = time.monotonic()
                    wait = self._min_interval - (now - last)
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                staged = self._transfer(frame)
                self._queue.put((ts, staged))
        finally:
            self._queue.put(self._done)

    def _start(self) -> None:
        if not self._started:
            self._thread.start()
            self._started = True

    def __iter__(self) -> Iterator:
        self._start()
        while True:
            item = self._queue.get()
            if item is self._done:
                self._exhausted = True
                return
            yield item

    @property
    def exhausted(self) -> bool:
        return self._exhausted

    def poll(self):
        """Non-blocking GetFrame analog (rs_driver.cpp:233-262): returns
        (ts, frame) when a fresh frame is staged, else None (the caller
        sleeps interval/8 and retries -- rs_viewer.cpp:82-86)."""
        self._start()
        try:
            item = self._queue.get_nowait()
        except queue.Empty:
            return None
        if item is self._done:
            self._exhausted = True
            return None
        return item


def stream_clip(clip, prefetch: int = 2) -> FrameStream:
    """Stream a recorded Clip's frames to device."""
    return FrameStream(
        ((clip.timestamps[i], clip.depths[i]) for i in range(len(clip))),
        prefetch=prefetch,
    )


def stream_tum(seq, prefetch: int = 2, stop: int | None = None,
               start: int = 0) -> FrameStream:
    """Stream a TumSequence: PNG decode happens on the producer thread."""
    return FrameStream(seq.frames(start=start, stop=stop), prefetch=prefetch)
