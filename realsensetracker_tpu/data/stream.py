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
    """Iterate (timestamp, device_array) with lookahead prefetching.

    Error and lifecycle semantics (each one was a silent failure mode):

    * a producer-thread exception (corrupt frame, failed device transfer)
      is re-raised in the CONSUMER at the point of iteration -- a clean
      end-of-stream after frame k of n would otherwise let a replay
      "complete" (and score ATE) on a silently truncated sequence;
    * iterating again after exhaustion raises RuntimeError instead of
      blocking forever on an empty queue whose producer already exited;
    * close() (also a context-manager exit) unblocks and stops the
      producer, so a consumer that stops early does not leak a thread
      pinning prefetched device buffers in a long-lived process.
    """

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
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._started = False
        self._exhausted = False

    def _put(self, item) -> bool:
        """put() that gives up when the stream is closed (a full queue with
        a departed consumer would otherwise block the producer forever)."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self) -> None:
        last = 0.0
        try:
            for item in self._source:
                if self._stop.is_set():
                    return
                ts, frame = item
                if self._min_interval > 0:
                    now = time.monotonic()
                    wait = self._min_interval - (now - last)
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                staged = self._transfer(frame)
                if not self._put((ts, staged)):
                    return
        except BaseException as e:  # surfaced to the consumer, not swallowed
            self._error = e
        finally:
            self._put(self._done)

    def _start(self) -> None:
        if not self._started:
            self._thread.start()
            self._started = True

    def _finish(self):
        """Common end-of-stream handling: propagate producer errors."""
        self._exhausted = True
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                "frame stream producer failed mid-sequence"
            ) from err

    def __iter__(self) -> Iterator:
        if self._exhausted:
            raise RuntimeError(
                "FrameStream is single-pass and already exhausted; "
                "create a new stream to re-read the source"
            )
        self._start()
        while True:
            item = self._queue.get()
            if item is self._done:
                self._finish()
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
            self._finish()
            return None
        return item

    def close(self) -> None:
        """Stop the producer and release its staged frames."""
        self._stop.set()
        while True:  # drain so a blocked put() can observe _stop
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        if self._started:
            self._thread.join(timeout=5.0)
        self._exhausted = True

    def __enter__(self) -> "FrameStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def stream_clip(clip, prefetch: int = 2) -> FrameStream:
    """Stream a recorded Clip's frames to device."""
    return FrameStream(
        ((clip.timestamps[i], clip.depths[i]) for i in range(len(clip))),
        prefetch=prefetch,
    )


def stream_tum(seq, prefetch: int = 2, stop: int | None = None,
               start: int = 0, raw: bool = False) -> FrameStream:
    """Stream a TumSequence: PNG decode happens on the producer thread.
    ``raw=True`` yields uint16 counts (half the tracker upload bytes;
    pair with depth_scale=1/tum.DEPTH_SCALE)."""
    return FrameStream(seq.frames(start=start, stop=stop, raw=raw),
                       prefetch=prefetch)
