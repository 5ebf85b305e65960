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


def test_midchain_error_unblocks_producers():
    """A raising stage must not deadlock upstream producers blocked on its
    (bounded, now-undrained) input queue: run() re-raises promptly."""

    def fast(x):
        return [x]

    def boom(x):
        raise RuntimeError("midchain")

    p = pl.Pipeline([pl.Stage("fast", fast), pl.Stage("boom", boom)],
                    queue_size=2)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="midchain"):
        list(p.run(range(10_000)))
    assert time.monotonic() - t0 < 5.0
    # every thread must have unwound (nothing left wedged on a full queue)
    for t in p._threads:
        t.join(timeout=2.0)
        assert not t.is_alive()


def test_source_error_propagates():
    def bad_source():
        yield 1
        raise OSError("decode failed")

    p = pl.Pipeline([pl.Stage("id", lambda x: [x])])
    with pytest.raises(OSError, match="decode failed"):
        list(p.run(bad_source()))


def test_rate_policy_max_rate_caps_source():
    """max_rate paces the feeder (reference video_unit.cpp:389-409)."""
    p = pl.Pipeline([pl.Stage("id", lambda x: [x])],
                    rate_policy=pl.RatePolicy(max_rate=50.0))
    t0 = time.monotonic()
    out = list(p.run(range(10)))
    dt = time.monotonic() - t0
    assert out == list(range(10))
    assert dt >= 9 / 50.0  # 9 inter-frame gaps at 50 fps

    # Unlimited (max_rate=0) runs much faster than the capped pipeline.
    p2 = pl.Pipeline([pl.Stage("id", lambda x: [x])])
    t0 = time.monotonic()
    assert len(list(p2.run(range(10)))) == 10
    assert time.monotonic() - t0 < 9 / 50.0


def test_rate_policy_dynamic_throttles_on_queue_depth():
    """Dynamic rate: deepest queue over threshold halves the rate per
    num_throttle_frames of excess, floored at min_throttle_rate
    (video_unit.cpp:427-447)."""
    rp = pl.RatePolicy(dynamic_rate=True, dynamic_rate_scale=1.0,
                       startup_frames=0, update_interval=0.0,
                       queue_throttle_threshold=2, num_throttle_frames=1,
                       min_throttle_rate=0.25)
    p = pl.Pipeline([pl.Stage("id", lambda x: [x])], queue_size=8,
                    rate_policy=rp)
    p.queues = [__import__("queue").Queue(maxsize=8) for _ in range(2)]
    p.stages[0].stats.record(0.01)  # measured stage rate: 100/s
    for _ in range(4):  # depth 4 = threshold 2 + 2 excess -> scale 0.25
        p.queues[0].put(object())
    rate, _ = p._current_rate(fed=10, last_update=0.0)
    assert rate == pytest.approx(100.0 * 0.25, rel=1e-6)

    # Below threshold: no throttle, rate = min stage rate * scale.
    while not p.queues[0].empty():
        p.queues[0].get()
    rate, _ = p._current_rate(fed=10, last_update=0.0)
    assert rate == pytest.approx(100.0, rel=1e-6)


# -- unit tree (multi-child fan-out + tree Seek, video_unit.cpp:219-263) --

def test_unit_tree_fanout_all_children_see_every_item():
    root = pl.Unit("src", lambda x: [x * 2])
    got_a, got_b = [], []
    a = root.add_child(pl.Unit("a", lambda x: [("a", x)]))
    b = root.add_child(pl.Unit("b", lambda x: [("b", x + 1)]))
    assert (a.name, b.name) == ("a", "b")
    tree = pl.UnitTree(root)
    out = list(tree.run(range(5)))
    got_a = sorted(v for n, v in out if n == "a")
    got_b = sorted(v for n, v in out if n == "b")
    assert got_a == [("a", 0), ("a", 2), ("a", 4), ("a", 6), ("a", 8)]
    assert got_b == [("b", 1), ("b", 3), ("b", 5), ("b", 7), ("b", 9)]
    # telemetry covers every unit
    assert all(st.stats.processed == 5 for st in tree.stages)


def test_unit_tree_flush_and_interior_collect():
    buffered = []

    def buf(x):
        buffered.append(x)
        return []

    root = pl.Unit("src", lambda x: [x])
    mid = root.add_child(pl.Unit("buf", buf, flush=lambda: list(buffered),
                                 collect=True))
    sink_seen = []
    mid.add_child(pl.Unit("sink", lambda x: sink_seen.append(x) or [],
                          collect=False))
    out = list(pl.UnitTree(root).run(range(4)))
    assert sorted(v for n, v in out if n == "buf") == [0, 1, 2, 3]
    assert sorted(sink_seen) == [0, 1, 2, 3]  # flush outputs reach children


def test_unit_tree_seek_propagation_stops_at_false():
    calls = []

    def seek_yes(name):
        def s(pts):
            calls.append((name, pts))
            return True
        return s

    def seek_no(pts):
        calls.append(("mid", pts))
        return False

    root = pl.Unit("root", seek=seek_yes("root"))
    mid = root.add_child(pl.Unit("mid", seek=seek_no))
    mid.add_child(pl.Unit("leaf", seek=seek_yes("leaf")))
    sib = root.add_child(pl.Unit("sib", seek=seek_yes("sib")))
    assert sib is not mid
    assert root.seek(42) is True
    # mid returned False, so leaf is never re-seeked (video_unit.cpp:256-262)
    assert ("root", 42) in calls and ("mid", 42) in calls
    assert ("sib", 42) in calls
    assert all(n != "leaf" for n, _ in calls)


def test_unit_tree_branch_error_aborts_whole_tree():
    def boom(x):
        if x == 2:
            raise ValueError("branch boom")
        return [x]

    root = pl.Unit("src", lambda x: [x])
    root.add_child(pl.Unit("ok", lambda x: [x]))
    root.add_child(pl.Unit("boom", boom))
    tree = pl.UnitTree(root, queue_size=2)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="branch boom"):
        list(tree.run(range(10_000)))
    assert time.monotonic() - t0 < 5.0
    for t in tree._threads:
        t.join(timeout=2.0)
        assert not t.is_alive()


def test_conversion_units():
    """LuminanceUnit / FlipBGRUnit / ColorTwistUnit counterparts
    (conversion_units.h:42-104) run in a UnitTree and convert correctly."""
    import numpy as np
    from video_segment_tpu.runtime import conversion
    from video_segment_tpu.runtime.pipeline import Unit, UnitTree

    frames = [np.full((4, 6, 3), (10, 100, 200), np.uint8) for _ in range(3)]
    root = Unit("src")
    flip = root.add_child(conversion.flip_bgr_unit())
    flip.add_child(conversion.luminance_unit())
    twist = root.add_child(conversion.color_twist_unit(scale=(2, 1, 0.5),
                                                       offset=(0, 10, 0)))
    got = {"luminance": [], "color_twist": []}
    for name, item in UnitTree(root).run(iter(frames)):
        got[name].append(item)

    assert len(got["luminance"]) == 3
    # Flipped to RGB first, so luminance sees (R,G,B)=(10,100,200) as BGR
    # input (B=10 swapped): 0.114*200+0.587*100+0.299*10 over 255.
    exp = (0.114 * 200 + 0.587 * 100 + 0.299 * 10) / 255.0
    assert abs(float(got["luminance"][0][0, 0]) - exp) < 1e-6
    tw = got["color_twist"][0]
    assert tw.dtype == np.uint8
    assert tuple(tw[0, 0]) == (20, 110, 100)
