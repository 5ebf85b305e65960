"""High-level API smoke tests (segment_frames / segment_video)."""

import numpy as np

from video_segment_tpu import proto
from video_segment_tpu.api import segment_frames, segment_video
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)
from video_segment_tpu.dataio import seg_io


def _frames(n=8, h=24, w=32):
    for f in range(n):
        img = np.full((h, w, 3), 50, np.uint8)
        img[6:18, 4 + f:16 + f] = 210
        yield img


def _opts():
    return (DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                     frac_min_region_size=0.1),
            RegionSegmentationOptions(chunk_set_size=2, chunk_set_overlap=1,
                                      min_region_num=2, max_region_num=50,
                                      use_flow=False))


def test_segment_frames_streaming():
    d, r = _opts()
    out = list(segment_frames(_frames(), 32, 24, use_flow=False,
                              dense_options=d, region_options=r))
    assert sorted(sf.frame_index for sf in out) == list(range(8))
    assert any(sf.hierarchy for sf in out)


def test_segment_video_writes_pb(tmp_path):
    # Build a small mp4 via the video writer, then run the file API.
    import cv2
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for img in _frames():
        w.write(img)
    w.release()

    d, r = _opts()
    out = segment_video(vid, str(tmp_path / "out.pb"), use_flow=False,
                        dense_options=d, region_options=r)
    reader = seg_io.SegmentationReader(out)
    assert reader.open_and_read_headers()
    assert reader.num_frames == 8
    desc = proto.SegmentationDesc()
    desc.ParseFromString(reader.read_frame())
    assert desc.frame_width == 32


def test_segment_frames_flow_on_end_to_end():
    """Flow-enabled pipeline through the v2 solver: flow-displaced
    temporal edges in extraction, flow histograms in the region stage."""
    rng = np.random.default_rng(5)
    noise = (rng.random((24, 32, 3)) * 20).astype(np.uint8)
    frames = []
    for i in range(10):
        img = np.full((24, 32, 3), 90, np.uint8) + noise
        img[:, :10] = (200, 60, 60)
        x = 12 + i
        img[8:16, x:x + 6] = (50, 200, 90)
        frames.append(img)

    out = list(segment_frames(iter(frames), 32, 24, use_flow=True,
                              dense_options=DenseSegmentationOptions(
                                  chunk_size=4, presmoothing="gaussian",
                                  frac_min_region_size=0.1),
                              region_options=RegionSegmentationOptions(
                                  chunk_set_size=2, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=30,
                                  use_flow=True)))
    assert len(out) == 10
    assert any(sf.hierarchy for sf in out)
    for sf in out:
        assert len(sf.region_ids) >= 2
