"""Pixel front-end kernels vs OpenCV / NumPy oracles."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from video_segment_tpu.ops import filters


def _rand_img(rng, h=33, w=47, c=3):
    return rng.random((h, w, c), dtype=np.float32)


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

