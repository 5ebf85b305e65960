"""Shape moments, vectorization, and raster round-trip tests."""

import numpy as np

from video_segment_tpu import proto
from video_segment_tpu.dataio import fast_proto
from video_segment_tpu.ops import rle
from video_segment_tpu.segment_util import boundary, util


def test_shape_moments_rectangle():
    # One region: rectangle y in [2,4], x in [3,6].
    counts = np.array([3])
    ys = np.array([2, 3, 4])
    lxs = np.array([3, 3, 3])
    rxs = np.array([6, 6, 6])
    m = rle.shape_moments(counts, ys, lxs, rxs)[0]
    xs = np.arange(3, 7)
    yy = np.arange(2, 5)
    assert m[0] == 12
    assert np.isclose(m[1], xs.mean())
    assert np.isclose(m[2], yy.mean())
    assert np.isclose(m[3], (xs ** 2).mean())
    assert np.isclose(m[4], xs.mean() * yy.mean())
    assert np.isclose(m[5], (yy ** 2).mean())


def test_moments_wire_encoding():
    ids = np.array([7])
    counts = np.array([1])
    ys, lxs, rxs = np.array([0]), np.array([0]), np.array([3])
    m = rle.shape_moments(counts, ys, lxs, rxs)
    raw = fast_proto.encode_regions(ids, counts, ys, lxs, rxs, m)
    msg = proto.SegmentationDesc()
    msg.ParseFromString(raw)
    sm = msg.region[0].shape_moments
    assert sm.size == 4
    assert np.isclose(sm.mean_x, 1.5)
    assert np.isclose(sm.moment_xx, (np.arange(4) ** 2).mean())


def test_vectorization_roundtrip():
    # Frame with a square region (id 5) inside background (id 1), plus a
    # hole in the square filled by id 9.
    lab = np.full((32, 32), 1, np.int64)
    lab[6:26, 6:26] = 5
    lab[12:18, 12:18] = 9
    ids, counts, ys, lxs, rxs = rle.frame_rle(lab)
    from video_segment_tpu.segment_util import joint_boundary
    mesh, polys = joint_boundary.compute_vectorization(lab)
    assert len(mesh) > 0
    assert len(polys[5]) >= 2  # outer + hole
    assert any(h for _, h in polys[5])

    payload = fast_proto.encode_frame(
        ids, counts, ys, lxs, rxs, frame_width=32, frame_height=32)
    desc = proto.SegmentationDesc()
    desc.ParseFromString(payload)
    boundary.vectorization_to_proto(desc, mesh, polys,
                                    remove_rasterization=True)
    assert desc.rasterization_removed
    assert len(desc.region[0].raster.scan_inter) == 0

    # Rebuild rasters from polygons: with jointly traced shared segments
    # the axis-aligned test shapes round-trip EXACTLY (no crack filling).
    util.replace_rasterization_from_vectorization(desc)
    rebuilt = util.desc_to_id_image(desc)
    assert (rebuilt == lab).all(), \
        f"raster/vector mismatch {(rebuilt != lab).mean()}"


def test_region_boundary_pixels():
    lab = np.zeros((8, 8), np.int64)
    lab[2:6, 2:6] = 3
    b = boundary.region_boundary(lab, 3)
    assert len(b) == 12  # 4x4 block: perimeter pixels
    assert (b.min() >= 2) and (b.max() <= 5)


def test_thin_straight_region_keeps_ring():
    """A 1-px-wide straight region whose side segments each simplify to a
    2-point diagonal must fall back to unsimplified crack points instead of
    losing its ring (raster-free upscaled streams would drop the region)."""
    from video_segment_tpu.segment_util import joint_boundary as jb

    lab = np.zeros((8, 8), np.int64)
    lab[2:6, 3] = 1      # 4x1 vertical line
    lab[2:6, 2] = 2      # side neighbors force junctions at the ends
    lab[2:6, 4] = 3
    lab[1, 3] = 4
    lab[6, 3] = 5
    mesh, polys = jb.compute_vectorization(lab)
    poly_sets = []
    for rid in np.unique(lab):
        plist = polys.get(int(rid), [])
        assert plist, f"region {rid} lost its polygons"
        rings = [np.stack([mesh[idx], mesh[idx + 1]], axis=1)
                 for idx, hole in plist]
        poly_sets.append((int(rid), rings))
    back = jb.rasterize_polygons(8, 8, poly_sets)
    np.testing.assert_array_equal(back, lab)
