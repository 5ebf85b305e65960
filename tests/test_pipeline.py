"""Host pipeline: ordering, flush, backpressure, error propagation."""

import time

import pytest

from video_segment_tpu.runtime import pipeline as pl


def test_pipeline_order_and_flush():
    seen = []

    def double(x):
        return [x * 2]

    buffered = []

    def buffer3(x):
        buffered.append(x)
        if len(buffered) == 3:
            out, buffered[:] = list(buffered), []
            return out
        return []

    def flush():
        return list(buffered)

    p = pl.Pipeline([pl.Stage("double", double),
                     pl.Stage("buf", buffer3, flush=flush)], queue_size=2)
    out = list(p.run(range(7)))
    assert out == [0, 2, 4, 6, 8, 10, 12]


def test_pipeline_overlap():
    """Stages sleeping in parallel should take ~max, not ~sum."""

    def slow_a(x):
        time.sleep(0.02)
        return [x]

    def slow_b(x):
        time.sleep(0.02)
        return [x]

    p = pl.Pipeline([pl.Stage("a", slow_a), pl.Stage("b", slow_b)])
    t0 = time.monotonic()
    out = list(p.run(range(20)))
    dt = time.monotonic() - t0
    assert len(out) == 20
    assert dt < 0.7  # serial would be ~0.8s
    assert p.stages[0].stats.processed == 20
    assert p.stages[0].stats.rate > 0


def test_pipeline_error_propagates():
    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return [x]

    p = pl.Pipeline([pl.Stage("boom", boom)])
    with pytest.raises(ValueError, match="boom"):
        list(p.run(range(10)))
