"""Vectorized emission: strip + upscale paths."""

import numpy as np

from video_segment_tpu import proto
from video_segment_tpu.core.dense import SegFrame
from video_segment_tpu.dataio import emit
from video_segment_tpu.ops import rle
from video_segment_tpu.segment_util import util


def _square_frame():
    lab = np.zeros((24, 32), np.int64)
    lab[6:18, 8:24] = 7
    ids, counts, ys, lxs, rxs = rle.frame_rle(lab)
    return lab, SegFrame(frame_width=32, frame_height=24, region_ids=ids,
                         interval_counts=counts, ys=ys, lxs=lxs, rxs=rxs,
                         frame_index=0)


def test_vectorized_strip_roundtrip():
    lab, sf = _square_frame()
    payload = emit.segframe_to_bytes(sf, vectorize=True,
                                     remove_rasterization=True)
    desc = proto.SegmentationDesc()
    desc.ParseFromString(payload)
    assert desc.rasterization_removed
    rebuilt = util.desc_to_id_image(desc)
    # Pixel-center contour convention costs ~half a pixel around each
    # region perimeter (ROADMAP item 8 tracks corner-exact tracing).
    assert (rebuilt == lab).mean() > 0.95


def test_save_descriptors_features():
    """save_descriptors emits one RegionFeatures{id} per region on hierarchy
    frames, none elsewhere (segmentation.cpp:491-501: the reference's
    AddToRegionFeatures impls are empty, so id-only entries are parity)."""
    from video_segment_tpu.core.dense import HierarchyLevelData

    lab, sf = _square_frame()
    hier = [HierarchyLevelData(
        ids=np.array([0, 7], np.int64),
        sizes=np.array([int((lab == 0).sum()), int((lab == 7).sum())]),
        start_frames=np.zeros(2, np.int64), end_frames=np.zeros(2, np.int64),
        neighbor_pairs=np.array([[0, 7]], np.int64))]
    sf.hierarchy = hier

    desc = proto.SegmentationDesc()
    desc.ParseFromString(emit.segframe_to_bytes(sf, save_descriptors=True))
    assert [f.id for f in desc.features] == [0, 7]

    # Survives the vectorize re-serialization path too.
    desc2 = proto.SegmentationDesc()
    desc2.ParseFromString(emit.segframe_to_bytes(sf, vectorize=True,
                                                 save_descriptors=True))
    assert [f.id for f in desc2.features] == [0, 7]

    # Non-hierarchy frames carry no features, matching output_hierarchy gate.
    sf.hierarchy = None
    desc3 = proto.SegmentationDesc()
    desc3.ParseFromString(emit.segframe_to_bytes(sf, save_descriptors=True))
    assert len(desc3.features) == 0


def test_vectorized_upscale():
    lab, sf = _square_frame()
    payload = emit.segframe_to_bytes(sf, vectorize=True,
                                     remove_rasterization=True,
                                     output_dims=(64, 48))
    desc = proto.SegmentationDesc()
    desc.ParseFromString(payload)
    assert desc.frame_width == 64 and desc.frame_height == 48
    rebuilt = util.desc_to_id_image(desc)
    assert rebuilt.shape == (48, 64)
    # The square lands at ~2x coordinates.
    assert rebuilt[24, 32] == 7
    assert rebuilt[2, 2] == 0
