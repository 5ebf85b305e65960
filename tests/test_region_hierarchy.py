"""Hierarchical region segmentation: agglomeration + chunk-set streaming."""

import numpy as np

from video_segment_tpu import proto
from video_segment_tpu.core import dense, region
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)
from video_segment_tpu.dataio import emit
from video_segment_tpu.segment_util import util


def _video(n_frames, h=24, w=32):
    """Four vertical color bands + a moving bright square."""
    frames = []
    for f in range(n_frames):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, : w // 4] = (30, 30, 30)
        img[:, w // 4: w // 2] = (90, 90, 200)
        img[:, w // 2: 3 * w // 4] = (60, 180, 60)
        img[:, 3 * w // 4:] = (200, 100, 30)
        x0 = 2 + f % 6
        img[4:10, x0:x0 + 6] = (250, 250, 250)
        frames.append(img)
    return frames


def _run(frames, chunk_size=5, set_size=3, overlap=1):
    h, w = frames[0].shape[:2]
    ds = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=chunk_size,
                                 presmoothing="gaussian",
                                 frac_min_region_size=0.08), w, h)
    rs = region.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=set_size,
                                  chunk_set_overlap=overlap,
                                  min_region_num=2,
                                  max_region_num=50,
                                  use_flow=False), w, h)
    out = []
    for i, fr in enumerate(frames):
        rs.add_frame(i, fr)
        out += rs.process_frames(False, ds.process_frame(False, fr))
    out += rs.process_frames(True, ds.process_frame(True))
    return out


def test_all_frames_emitted_once():
    frames = _video(16)
    out = _run(frames)
    assert sorted(sf.frame_index for sf in out) == list(range(16))
    assert len(set(sf.frame_index for sf in out)) == 16


def test_hierarchy_levels_shrink():
    frames = _video(16)
    out = _run(frames)
    first = next(sf for sf in out if sf.hierarchy)
    levels = first.hierarchy
    assert len(levels) >= 2
    counts = [len(l.ids) for l in levels]
    assert all(counts[i] > counts[i + 1] for i in range(len(counts) - 1))
    # Level-0 regions are the Region2D regions of the set's frames.
    set_frames = [sf for sf in out if sf.chunk_id == first.chunk_id]
    seen = np.unique(np.concatenate([sf.region_ids for sf in set_frames]))
    assert set(seen).issubset(set(levels[0].ids.tolist()))


def test_parent_child_consistency():
    frames = _video(16)
    out = _run(frames)
    first = next(sf for sf in out if sf.hierarchy)
    proto_levels = emit.hierarchy_to_proto(first.hierarchy)
    errs = util.verify_global_hierarchy(proto_levels)
    assert errs == [], errs[:5]


def test_proto_roundtrip_multilevel():
    frames = _video(16)
    out = _run(frames)
    first = next(sf for sf in out if sf.hierarchy)
    payload = emit.segframe_to_bytes(first)
    msg = proto.SegmentationDesc()
    msg.ParseFromString(payload)
    assert len(msg.hierarchy) >= 2
    # Rendering at a higher level produces fewer distinct draw ids.
    img0 = util.desc_to_id_image(msg, list(msg.hierarchy), 0)
    img1 = util.desc_to_id_image(msg, list(msg.hierarchy),
                                 len(msg.hierarchy) - 1)
    assert len(np.unique(img1)) <= len(np.unique(img0))
    assert (img0 >= 0).all()


def test_segmentation_quality_bands():
    """The four color bands should end up in distinct top-level regions."""
    frames = _video(16)
    out = _run(frames)
    first = next(sf for sf in out if sf.hierarchy)
    payload = emit.segframe_to_bytes(first)
    msg = proto.SegmentationDesc()
    msg.ParseFromString(payload)
    # Pick the highest level that still has >= 5 regions (the top levels
    # merge all the way down to min_region_num by design).
    level = max(l for l in range(len(msg.hierarchy))
                if len(msg.hierarchy[l].region) >= 5)
    top = util.desc_to_id_image(msg, list(msg.hierarchy), level)
    h, w = top.shape
    cols = [top[h - 2, 2], top[h - 2, w // 4 + 2], top[h - 2, w // 2 + 2],
            top[h - 2, -2]]
    assert len(set(cols)) == 4, f"bands merged at level {level}: {cols}"
