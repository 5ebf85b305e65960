"""Native kernels + spatial connectedness enforcement tests."""

import numpy as np

from video_segment_tpu import native
from video_segment_tpu.core import connectedness


def test_native_available():
    assert native.available(), "native library failed to build"


def test_multi_label_cc():
    lab = np.array([[1, 1, 2, 2],
                    [1, 3, 3, 2],
                    [1, 1, 3, 1]], np.int32)
    comp, n = native.multi_label_cc(lab)
    # label 1: two components (left blob + bottom-right pixel); 2: one; 3: one
    assert n == 4
    assert comp[0, 0] == comp[2, 1]          # left blob connected
    assert comp[2, 3] != comp[0, 0]          # island of label 1
    assert comp[0, 2] == comp[1, 3]


def test_native_rle_matches_numpy():
    rng = np.random.default_rng(3)
    lab = rng.integers(0, 5, size=(20, 30)).astype(np.int64)
    ids, ys, lxs, rxs = native.rle_encode(lab)
    # Reconstruct.
    img = np.zeros_like(lab)
    for v, y, l, r in zip(ids, ys, lxs, rxs):
        img[y, l:r + 1] = v
    np.testing.assert_array_equal(img, lab)


def test_enforce_spatial_connectedness_splits_islands():
    # Region 1 has two islands in every frame, connected to nothing.
    t, h, w = 3, 20, 30
    lab = np.zeros((t, h, w), np.int32)
    lab[:, 2:8, 2:8] = 1     # island A (36 px/frame)
    lab[:, 12:18, 20:28] = 1  # island B (48 px/frame) — larger, keeps id
    out, n, origin = connectedness.enforce_spatial_connectedness(lab, 2)
    assert n == 3
    assert origin[2] == 1
    assert (out[:, 12:18, 20:28] == 1).all()   # largest tube keeps the id
    assert (out[:, 2:8, 2:8] == 2).all()       # split-off island renamed
    assert (out[:, 0, 0] == 0).all()


def test_enforce_keeps_connected_regions():
    t, h, w = 2, 10, 10
    lab = np.zeros((t, h, w), np.int32)
    lab[:, 4:, :] = 1
    out, n, origin = connectedness.enforce_spatial_connectedness(lab, 2)
    assert n == 2
    np.testing.assert_array_equal(out, lab)


def test_tiny_islands_not_split():
    # A 2-px island (below min avg tube area) stays with its region.
    t, h, w = 2, 12, 12
    lab = np.zeros((t, h, w), np.int32)
    lab[:, 2:8, 2:8] = 1
    lab[:, 10, 10] = 1
    out, n, origin = connectedness.enforce_spatial_connectedness(lab, 2)
    assert n == 2
    assert (out[:, 10, 10] == 1).all()


def test_flow_advected_centroid_matching():
    """A fast-moving component stays one tube when centroids are advected
    along backward flow (dense_segmentation_graph.h:735-742), but
    fragments into per-frame tubes on raw centroids."""
    t, h, w = 4, 24, 64
    labels = np.zeros((t, h, w), np.int64)
    step = 12  # far beyond the 4%-diagonal matching radius (~2.7 px)
    for f in range(t):
        x = 4 + f * step
        labels[f, 8:16, x:x + 8] = 1
    flow = np.zeros((t - 1, h, w, 2), np.float32)
    for f in range(1, t):
        x = 4 + f * step
        # backward flow only on the mover: current pos - step = prev pos
        flow[f - 1, 8:16, x:x + 8, 0] = -step

    out_flow, n_flow, _ = connectedness.enforce_spatial_connectedness(
        labels.copy(), 2, flow=flow)
    out_raw, n_raw, _ = connectedness.enforce_spatial_connectedness(
        labels.copy(), 2)
    # The mover stays ONE region across frames when advected...
    mover_ids_flow = {int(out_flow[f, 11, 8 + f * step]) for f in range(t)}
    assert len(mover_ids_flow) == 1, mover_ids_flow
    # ...but fragments per frame on raw centroids (matching radius ~2.7px).
    mover_ids_raw = {int(out_raw[f, 11, 8 + f * step]) for f in range(t)}
    assert len(mover_ids_raw) > 1, mover_ids_raw
    assert n_flow < n_raw


def test_native_neighbor_pairs_matches_numpy(rng):
    """Fused native adjacency pass == the pure-NumPy offset enumeration."""
    from video_segment_tpu.ops import rle

    for shape in [(1, 7, 9), (4, 18, 25), (3, 33, 64)]:
        lab = rng.integers(0, 40, shape).astype(np.int32)
        got = native.neighbor_pairs(lab)
        assert got is not None
        orig = native.neighbor_pairs
        try:  # force the NumPy fallback inside rle.neighbor_pairs
            native.neighbor_pairs = lambda *a, **k: None
            want = np.asarray(rle.neighbor_pairs(lab))
        finally:
            native.neighbor_pairs = orig
        assert (set(map(tuple, got.tolist()))
                == set(map(tuple, want.tolist())))
