"""Kill-and-resume at a chunk boundary: identical output streams."""

import numpy as np

from video_segment_tpu.core import dense, region
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)
from video_segment_tpu.runtime import checkpoint


def _video(n, h=24, w=40):
    rng = np.random.default_rng(11)
    noise = (rng.random((h, w, 3)) * 18).astype(np.uint8)
    frames = []
    for i in range(n):
        img = np.full((h, w, 3), 70, np.uint8) + noise
        img[:, : w // 3] = (180, 90, 60)
        img[5:17, (6 + i) % (w - 10):(6 + i) % (w - 10) + 8] = (40, 190, 130)
        frames.append(img)
    return frames


def _drivers():
    ds = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                 frac_min_region_size=0.08), 40, 24)
    rs = region.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=2, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=40,
                                  use_flow=False), 40, 24)
    return ds, rs


def _sig(frames_out):
    """Comparable signature of emitted SegFrames."""
    sig = []
    for sf in frames_out:
        sig.append((sf.frame_index, tuple(sf.region_ids.tolist()),
                    tuple(sf.ys.tolist()), tuple(sf.lxs.tolist()),
                    tuple(sf.rxs.tolist())))
    return sig


def test_kill_and_resume_matches_straight_run(tmp_path):
    frames = _video(20)

    # Straight run.
    ds, rs = _drivers()
    ref_out = []
    for i, fr in enumerate(frames):
        rs.add_frame(i, fr)
        ref_out += rs.process_frames(False, ds.process_frame(False, fr))
    ref_out += rs.process_frames(True, ds.process_frame(True))

    # Run half, checkpoint, build FRESH drivers, restore, continue.
    ds1, rs1 = _drivers()
    out_a = []
    cut = 11
    for i, fr in enumerate(frames[:cut]):
        rs1.add_frame(i, fr)
        out_a += rs1.process_frames(False, ds1.process_frame(False, fr))
    path = str(tmp_path / "ckpt.pkl")
    checkpoint.save(path, ds1, rs1, frames_consumed=cut)
    del ds1, rs1

    ds2, rs2 = _drivers()
    consumed = checkpoint.restore(path, ds2, rs2)
    assert consumed == cut
    out_b = []
    for i, fr in enumerate(frames[cut:], start=cut):
        rs2.add_frame(i, fr)
        out_b += rs2.process_frames(False, ds2.process_frame(False, fr))
    out_b += rs2.process_frames(True, ds2.process_frame(True))

    assert _sig(out_a + out_b) == _sig(ref_out)


def test_restore_rejects_geometry_mismatch(tmp_path):
    ds, rs = _drivers()
    path = str(tmp_path / "ckpt.pkl")
    checkpoint.save(path, ds, rs, frames_consumed=0)
    other = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=5), 64, 48)
    import pytest
    with pytest.raises(ValueError):
        checkpoint.restore(path, other)
