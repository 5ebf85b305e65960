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
