"""Threaded host pipeline with bounded queues and rate telemetry.

Host-side equivalent of the reference streaming runtime
(video_framework/video_pipeline.{h,cpp} + concurrent_queue.h): a chain of
stages, each running on its own thread, joined by bounded producer/consumer
queues.  Backpressure is structural — a full queue blocks the producer
(the reference instead throttles the root's frame rate against queue depth,
video_unit.cpp:411-454; with a blocking bounded queue the effect is the
same and needs no tuning).

Telemetry mirrors VideoUnit's measurement scheme: per-stage processing time
over a sliding window (video_unit.cpp:348-387) exposed as rates, plus live
queue depths (VideoPipelineStats, video_pipeline.cpp:184-277).
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from typing import Any, Callable, Iterable, Iterator

_SENTINEL = object()


class StageStats:
    """Sliding-window rate measurement (64 samples, like the reference)."""

    def __init__(self, name: str, window: int = 64):
        self.name = name
        self.times = collections.deque(maxlen=window)
        self.processed = 0

    def record(self, dt: float):
        self.times.append(dt)
        self.processed += 1

    @property
    def rate(self) -> float:
        if not self.times:
            return 0.0
        total = sum(self.times)
        return len(self.times) / total if total > 0 else 0.0


class Stage:
    """One pipeline stage: fn(item) -> iterable of outputs (or None).

    `flush()` on the underlying object (if present) is called after the
    input stream ends, producing trailing outputs — matching the reference
    units' flush-on-EOS ProcessFrame(flush=true) convention.
    """

    def __init__(self, name: str,
                 fn: Callable[[Any], Iterable | None],
                 flush: Callable[[], Iterable | None] | None = None):
        self.name = name
        self.fn = fn
        self.flush = flush
        self.stats = StageStats(name)


class Pipeline:
    """stages[0] consumes the source iterator; outputs of the last stage
    are yielded from run()."""

    def __init__(self, stages: list[Stage], queue_size: int = 10):
        self.stages = stages
        self.queue_size = queue_size
        self.queues: list[queue.Queue] = []
        self._threads: list[threading.Thread] = []
        self._error: BaseException | None = None

    def _worker(self, stage: Stage, q_in: queue.Queue, q_out: queue.Queue):
        try:
            while True:
                item = q_in.get()
                if item is _SENTINEL:
                    break
                t0 = time.monotonic()
                out = stage.fn(item)
                stage.stats.record(time.monotonic() - t0)
                if out is not None:
                    for o in out:
                        q_out.put(o)
            if stage.flush is not None:
                t0 = time.monotonic()
                out = stage.flush()
                stage.stats.record(time.monotonic() - t0)
                if out is not None:
                    for o in out:
                        q_out.put(o)
        except BaseException as e:  # propagate to run()
            self._error = e
        finally:
            q_out.put(_SENTINEL)

    def run(self, source: Iterable) -> Iterator:
        n = len(self.stages)
        self.queues = [queue.Queue(maxsize=self.queue_size)
                       for _ in range(n + 1)]
        for i, st in enumerate(self.stages):
            t = threading.Thread(target=self._worker,
                                 args=(st, self.queues[i],
                                       self.queues[i + 1]),
                                 name=f"stage-{st.name}", daemon=True)
            t.start()
            self._threads.append(t)

        def feed():
            try:
                for item in source:
                    self.queues[0].put(item)
            finally:
                self.queues[0].put(_SENTINEL)

        feeder = threading.Thread(target=feed, name="source", daemon=True)
        feeder.start()

        q_last = self.queues[-1]
        while True:
            item = q_last.get()
            if item is _SENTINEL:
                break
            yield item
        feeder.join()
        for t in self._threads:
            t.join()
        if self._error is not None:
            raise self._error

    def status(self) -> str:
        parts = []
        for i, st in enumerate(self.stages):
            depth = self.queues[i].qsize() if self.queues else 0
            parts.append(f"{st.name}[q={depth} n={st.stats.processed} "
                         f"{st.stats.rate:.1f}/s]")
        return " -> ".join(parts)


class StatusPrinter:
    """Periodic pipeline status line (the reference's --pipeline_status)."""

    def __init__(self, pipeline: Pipeline, interval: float = 2.0):
        self.pipeline = pipeline
        self.interval = interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.wait(self.interval):
            print(f"[pipeline] {self.pipeline.status()}", flush=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()
