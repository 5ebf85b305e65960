"""Pixel front-end kernels vs OpenCV / NumPy oracles."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from video_segment_tpu.ops import color, edges, filters


def _rand_img(rng, h=33, w=47, c=3):
    return rng.random((h, w, c), dtype=np.float32)


def test_bgr_to_lab_matches_opencv_uint8(rng):
    img_u8 = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    ours = np.asarray(color.bgr_to_lab(jnp.asarray(img_u8, jnp.float32) / 255.0))
    ref = cv2.cvtColor(img_u8, cv2.COLOR_BGR2Lab).astype(np.float32)
    # OpenCV uint8 path quantizes; allow ~1.5 levels.
    assert np.abs(ours - ref).max() < 2.0


def test_gaussian_blur_matches_opencv(rng):
    img = _rand_img(rng)
    ours = np.asarray(filters.gaussian_blur(jnp.asarray(img), 3, 1.5))
    ref = cv2.GaussianBlur(img, (3, 3), 1.5)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilateral_filter_matches_reference_formula(rng):
    """Oracle: direct NumPy transcription of the reference formula
    (circular window r=floor(1.5*ss), replicate border, joint sq-diff color
    weight) — imagefilter/image_filter.cpp:184-277."""
    img = _rand_img(rng, 20, 24)
    ss, sc = 3.0, 0.25
    radius = int(ss * 1.5)
    pad = np.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="edge")
    h, w, _ = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            wsum = 0.0
            vsum = np.zeros(3)
            c0 = img[y, x]
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    r2 = dy * dy + dx * dx
                    if r2 > radius * radius:
                        continue
                    c1 = pad[y + dy + radius, x + dx + radius]
                    d2 = float(np.sum((c0 - c1) ** 2))
                    wt = np.exp(-0.5 * r2 / ss ** 2) * np.exp(-0.5 * d2 / sc ** 2)
                    wsum += wt
                    vsum += wt * c1
            out[y, x] = vsum / wsum
    ours = np.asarray(filters.bilateral_filter(jnp.asarray(img), ss, sc))
    np.testing.assert_allclose(ours, out, atol=1e-4)


def test_spatial_edges_small():
    vol = np.zeros((1, 2, 3, 3), np.float32)
    vol[0, 0, 0] = [0.0, 0.0, 0.0]
    vol[0, 0, 1] = [0.3, 0.3, 0.3]
    vol[0, 0, 2] = [0.6, 0.6, 0.6]
    vol[0, 1] = 0.9
    w = np.asarray(edges.spatial_edge_weights(jnp.asarray(vol), "l2"))
    # Right edge (0,0)->(0,1): L2 = sqrt(3*0.09/3) = 0.3
    assert np.isclose(w[0, 0, 0, 0], 0.3, atol=1e-6)
    # Right edge at last column invalid.
    assert np.isinf(w[0, 0, 0, 2])
    # Bottom edges from row 1 invalid (only 2 rows).
    assert np.isinf(w[1, 0, 1, 0])
    # Bottom edge (0,0)->(1,0): diff 0.9.
    assert np.isclose(w[1, 0, 0, 0], 0.9, atol=1e-6)
    # Bottom-left from x=0 invalid.
    assert np.isinf(w[2, 0, 0, 0])


def test_temporal_edges_identity_flow(rng):
    vol = rng.random((2, 4, 5, 3), dtype=np.float32)
    w, v = edges.temporal_edge_weights(jnp.asarray(vol), None, "l2")
    w, v = np.asarray(w), np.asarray(v)
    assert w.shape == (9, 1, 4, 5)
    # Center offset (dy=0,dx=0) is index 4: distance curr->same pixel prev.
    d = np.sqrt(np.sum((vol[1] - vol[0]) ** 2, -1) / 3.0)
    np.testing.assert_allclose(w[4, 0], d, atol=1e-5)
    # Targets of center offset = flat indices in frame 0.
    np.testing.assert_array_equal(v[4, 0], np.arange(20).reshape(4, 5))
    # Corner validity: top-left offset invalid at y=0 or x=0.
    assert np.isinf(w[0, 0, 0, 2]) and np.isinf(w[0, 0, 2, 0])
    assert np.isfinite(w[0, 0, 1, 1])


def test_temporal_edges_with_flow():
    vol = np.zeros((2, 4, 6, 3), np.float32)
    vol[0, 2, 3] = 0.5
    flow = np.zeros((1, 4, 6, 2), np.float32)
    flow[0, 1, 2] = [1.2, 1.7]   # pixel (y=1,x=2) anchors at (y=2,x=3)
    w, v = edges.temporal_edge_weights(jnp.asarray(vol), jnp.asarray(flow), "l2")
    w, v = np.asarray(w), np.asarray(v)
    # Center offset now points at (2,3) in frame 0 for pixel (1,2).
    assert v[4, 0, 1, 2] == 2 * 6 + 3
    d = np.sqrt(3 * 0.25 / 3.0)
    np.testing.assert_allclose(w[4, 0, 1, 2], d, atol=1e-5)


def test_build_chunk_edges_shapes(rng):
    vol = rng.random((3, 4, 5, 3), dtype=np.float32)
    el = edges.build_chunk_edges(jnp.asarray(vol))
    n = 3 * 4 * 5
    assert el.u.shape == (4 * n + 9 * 2 * 4 * 5,)
    finite = np.isfinite(np.asarray(el.w))
    u, v = np.asarray(el.u), np.asarray(el.v)
    assert (u[finite] != v[finite]).all()
    assert u.min() >= 0 and v.min() >= 0 and max(u.max(), v.max()) < n
