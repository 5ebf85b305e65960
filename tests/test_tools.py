"""Offline tools (converter, renderer, viewer) driven on a generated .pb."""

import os

import numpy as np
import pytest

from video_segment_tpu import proto
from video_segment_tpu.core import dense
from video_segment_tpu.core.options import DenseSegmentationOptions
from video_segment_tpu.dataio import emit, seg_io


@pytest.fixture(scope="module")
def seg_pb(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tools") / "seg.pb")
    opts = DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                    frac_min_region_size=0.1)
    ds = dense.DenseSegmentation(opts, 32, 24)
    w = seg_io.SegmentationWriter(path)
    w.open_file([0, 1])
    rng = np.random.default_rng(0)
    frames = []
    for f in range(8):
        img = np.full((24, 32, 3), 60, np.uint8)
        img[6:18, 4 + f:16 + f] = 200
        frames.append(img)
    results = []
    for fr in frames:
        results += ds.process_frame(False, fr)
    results += ds.process_frame(True)
    for sf in results:
        w.add_to_chunk(emit.segframe_to_bytes(sf), pts=sf.frame_index * 100)
    w.write_term_and_close()
    return path


def test_converter_color_bitmaps(seg_pb, tmp_path):
    from video_segment_tpu.tools import converter
    out = str(tmp_path / "conv")
    assert converter.main([f"--input={seg_pb}", f"--output_dir={out}",
                           "--mode=bitmap_color"]) == 0
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 8


def test_converter_id_bitmaps_roundtrip(seg_pb, tmp_path):
    import cv2
    from video_segment_tpu.dataio import fast_proto
    from video_segment_tpu.segment_util import util
    from video_segment_tpu.tools import converter
    out = str(tmp_path / "ids")
    assert converter.main([f"--input={seg_pb}", f"--output_dir={out}",
                           "--mode=bitmap_ids"]) == 0
    img = cv2.imread(os.path.join(out, "frame0000.png"))
    ids = (img[..., 0].astype(np.int64)
           | img[..., 1].astype(np.int64) << 8
           | img[..., 2].astype(np.int64) << 16)
    r = seg_io.SegmentationReader(seg_pb)
    r.open_and_read_headers()
    d = proto.SegmentationDesc()
    d.ParseFromString(r.read_frame())
    np.testing.assert_array_equal(ids, util.desc_to_id_image(d))


def test_converter_strip(seg_pb, tmp_path):
    from video_segment_tpu.tools import converter
    out = str(tmp_path / "strip.pb")
    assert converter.main([f"--input={seg_pb}", "--mode=strip",
                           f"--strip_output={out}",
                           f"--output_dir={tmp_path}"]) == 0
    r = seg_io.SegmentationReader(out)
    assert r.open_and_read_headers()
    assert r.num_frames == 8
    d = proto.SegmentationDesc()
    d.ParseFromString(r.read_frame())
    assert not d.region[0].HasField("shape_moments")


def test_renderer_video(seg_pb, tmp_path):
    from video_segment_tpu.tools import renderer
    out = str(tmp_path / "render.mp4")
    assert renderer.main([f"--input={seg_pb}", f"--output_video={out}",
                          "--render_level=0.5"]) == 0
    assert os.path.getsize(out) > 0


def test_viewer_contact_sheet(seg_pb, tmp_path):
    from video_segment_tpu.tools import viewer
    out = str(tmp_path / "sheet.png")
    assert viewer.main([f"--input={seg_pb}", f"--dump={out}"]) == 0
    assert os.path.exists(out)


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    import cv2
    path = str(tmp_path_factory.mktemp("vid") / "tiny.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (32, 24))
    rng = np.random.default_rng(7)
    base = (rng.random((24, 32, 3)) * 80 + 40).astype(np.uint8)
    for f in range(6):
        img = base.copy()
        img[6:18, 4 + 2 * f:16 + 2 * f] = (220, 180, 90)
        vw.write(img)
    vw.release()
    return path


def test_seg_tree_cli_flow_both(tiny_video, tmp_path):
    """End-to-end flagship CLI: --flow_type both computes + caches both
    directions, rate-policy flags parse, and the .pb stream verifies."""
    from video_segment_tpu.core import flow as flow_mod
    from video_segment_tpu.tools import seg_tree

    out = str(tmp_path / "tiny.pb")
    rc = seg_tree.main([
        "--input_file", tiny_video, "--flow", "--flow_type", "both",
        "--save_flow", "--over_segment", "--write_to_file",
        "--output_file", out, "--chunk_size", "4",
        "--max_rate", "0", "--no-dynamic_rate"])
    assert rc in (0, None)
    assert os.path.exists(out)

    r = seg_io.SegmentationReader(out)
    assert r.open_and_read_headers()
    assert len(r.frame_offsets) == 6

    # The .flow cache advertises BOTH and holds 2 fields per flow frame.
    cache = flow_mod.FlowCacheReader(tiny_video + ".flow")
    assert cache.flow_type == flow_mod.FLOW_BOTH
    n = 0
    while cache.read() is not None:
        n += 1
    cache.close()
    assert n == 2 * 5  # forward + backward for frames 1..5


def test_batch_segment_fused(tiny_video, tmp_path):
    """Fused lockstep batch: two clips through one vmapped solve per
    chunk; each emits an independently readable .pb stream."""
    from video_segment_tpu.tools import batch_segment

    outd = str(tmp_path / "fused")
    rc = batch_segment.main([tiny_video, tiny_video, "--fused", "--no-flow",
                             "--output_dir", outd])
    assert rc in (0, None)
    pbs = sorted(os.listdir(outd))
    assert len(pbs) == 2
    for pb in pbs:
        r = seg_io.SegmentationReader(os.path.join(outd, pb))
        assert r.open_and_read_headers()
        assert len(r.frame_offsets) == 6
        r.close()
