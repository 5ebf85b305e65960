"""Long-stream behavior: bounded buffers, unbounded length, id monotony."""

import numpy as np

from video_segment_tpu.core import dense, region
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)


def _frame(f, h=20, w=28):
    img = np.full((h, w, 3), 60, np.uint8)
    img[5:15, (2 + f) % (w - 8):(2 + f) % (w - 8) + 8] = 210
    return img


def test_long_stream_bounded_buffers():
    opts = DenseSegmentationOptions(chunk_size=6, presmoothing="gaussian",
                                    frac_min_region_size=0.1)
    ds = dense.DenseSegmentation(opts, 28, 20)
    rs = region.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=3, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=40,
                                  use_flow=False), 28, 20)
    emitted = []
    max_dense_buf = 0
    max_feat_buf = 0
    max_chunks = 0
    n = 60
    for f in range(n):
        rs.add_frame(f, _frame(f))
        out = ds.process_frame(False, _frame(f))
        emitted += rs.process_frames(False, out)
        max_dense_buf = max(max_dense_buf, len(ds._buffer))
        max_feat_buf = max(max_feat_buf, len(rs._features))
        max_chunks = max(max_chunks, len(rs._chunks))
    emitted += rs.process_frames(True, ds.process_frame(True))

    # Every frame exactly once, in order.
    assert sorted(sf.frame_index for sf in emitted) == list(range(n))
    # Dense buffer bounded by chunk_size + 1; features by ~2 chunk sets;
    # buffered chunks by the set size.
    assert max_dense_buf <= opts.chunk_size + 1
    assert max_feat_buf <= 4 * opts.chunk_size
    assert max_chunks <= 3
    # Region ids never regress below previously assigned ranges.
    assert ds._max_region_id > 0


def test_chunk_ids_monotone():
    opts = DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                    frac_min_region_size=0.1)
    ds = dense.DenseSegmentation(opts, 28, 20)
    out = []
    for f in range(17):
        out += ds.process_frame(False, _frame(f))
    out += ds.process_frame(True)
    hier_frames = [sf for sf in out if sf.hierarchy is not None]
    assert [sf.chunk_id for sf in hier_frames] == list(
        range(len(hier_frames)))
    # hierarchy_frame_idx points at each chunk's first emitted frame.
    for sf in hier_frames:
        assert sf.hierarchy_frame_idx == sf.frame_index
