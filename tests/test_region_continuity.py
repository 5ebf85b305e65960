"""Cross-set hierarchy id continuity."""

import numpy as np

from video_segment_tpu.core import dense, region
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)


def _static_video(n, h=24, w=32):
    img = np.full((h, w, 3), 50, np.uint8)
    img[:, : w // 2] = (200, 80, 40)
    img[6:18, 20:30] = (40, 200, 120)
    return [img.copy() for _ in range(n)]


def test_hierarchy_ids_persist_across_sets():
    frames = _static_video(30)
    ds = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                 frac_min_region_size=0.08), 32, 24)
    rs = region.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=3, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=40,
                                  use_flow=False), 32, 24)
    out = []
    for i, fr in enumerate(frames):
        rs.add_frame(i, fr)
        out += rs.process_frames(False, ds.process_frame(False, fr))
    out += rs.process_frames(True, ds.process_frame(True))

    hier_frames = [sf for sf in out if sf.hierarchy]
    assert len(hier_frames) >= 2
    # Static video: every set's level-0 id set should match the previous
    # set's (the scene does not change).
    for a, b in zip(hier_frames, hier_frames[1:]):
        ids_a = set(a.hierarchy[0].ids.tolist())
        ids_b = set(b.hierarchy[0].ids.tolist())
        inter = len(ids_a & ids_b)
        assert inter / max(len(ids_a), 1) > 0.9, (ids_a, ids_b)
    # Region2D ids stay identical frame to frame.
    mid = [sf for sf in out if sf.frame_index in (5, 20)]
    assert set(mid[0].region_ids.tolist()) == set(mid[1].region_ids.tolist())


def _moving_video(n, h=24, w=48):
    """A textured square translating 1px/frame over a two-tone background."""
    rng = np.random.default_rng(7)
    noise = (rng.random((h, w, 3)) * 20).astype(np.uint8)
    frames = []
    for i in range(n):
        img = np.full((h, w, 3), 60, np.uint8) + noise
        img[:, : w // 3] = (190, 90, 50)
        x = 8 + i  # moves right
        img[6:18, x:x + 10] = (40, 200, 120)
        frames.append(img)
    return frames


def test_moving_scene_composition_stable_across_seams():
    """Counterpart constraints: overlap regions grouped together at level l
    by one set must stay together at level l in the next set
    (region_segmentation.cpp:143-197)."""
    frames = _moving_video(30)
    ds = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                 frac_min_region_size=0.08), 48, 24)
    rs = region.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=3, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=60,
                                  use_flow=False), 48, 24)
    # Capture the per-set level assignments as they are produced.
    seen = []
    orig = rs._process_set

    def capture(chunks, emit_all):
        res = orig(chunks, emit_all)
        seen.append([(pg.copy(), pid.copy()) for pg, pid in rs._prev_assign])
        return res

    rs._process_set = capture
    out = []
    for i, fr in enumerate(frames):
        rs.add_frame(i, fr)
        out += rs.process_frames(False, ds.process_frame(False, fr))
    out += rs.process_frames(True, ds.process_frame(True))

    hier_frames = [sf for sf in out if sf.hierarchy]
    assert len(hier_frames) >= 3
    # For consecutive sets: overlap overseg regions that shared a level-l id
    # in set k must share one in set k+1 (composition, not just id reuse).
    for k in range(len(seen) - 1):
        prev = seen[k]
        hier_next = hier_frames[k + 1].hierarchy
        for lv in range(min(len(prev), len(hier_next))):
            pg, pid = prev[lv]
            if not len(pg):
                continue
            # Group overlap gids by previous assignment...
            import collections
            groups = collections.defaultdict(list)
            for g, i_ in zip(pg.tolist(), pid.tolist()):
                groups[i_].append(g)
            # ...and check each group that persisted gets one id in the
            # next set's level-lv id mapping of its member gids.
            nxt = seen[k + 1]
            if lv >= len(nxt):
                continue
            ng, nid = nxt[lv]
            lookup = dict(zip(ng.tolist(), nid.tolist()))
            for members in groups.values():
                next_ids = {lookup[g] for g in members if g in lookup}
                assert len(next_ids) <= 1, (
                    f"level {lv}: previous group split across sets: "
                    f"{next_ids}")
