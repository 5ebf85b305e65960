"""Oracle tests for gradient distances, aggregators, and the gradient
trait in the edge-table solver (pixel_distance.h:160-175,523-561,646-821).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_segment_tpu.ops import pixel_distance as pd


def test_gradient_diff_oracle(rng):
    a = rng.random((64, 2)).astype(np.float32)
    b = rng.random((64, 2)).astype(np.float32)
    # GradientDiffL2 (pixel_distance.h:160-166)
    l2 = np.minimum(1.0, 10.0 * np.sqrt(((a - b) ** 2).sum(-1) * 0.5))
    np.testing.assert_allclose(
        np.asarray(pd.gradient_distance(jnp.asarray(a), jnp.asarray(b))),
        l2, rtol=1e-5)
    # GradientDiffL1 (pixel_distance.h:169-175)
    l1 = np.abs(a - b).sum(-1) * 0.5
    np.testing.assert_allclose(
        np.asarray(pd.gradient_distance(jnp.asarray(a), jnp.asarray(b),
                                        "l1")), l1, rtol=1e-5)


def test_aggregators_oracle(rng):
    d1 = rng.random(32).astype(np.float32)
    d2 = rng.random(32).astype(np.float32)
    # LinearDistanceAggregator2 (convex combination)
    np.testing.assert_allclose(
        np.asarray(pd.aggregate(jnp.asarray(d1), jnp.asarray(d2),
                                "linear", 0.3)),
        0.3 * d1 + 0.7 * d2, rtol=1e-5)
    # IndependentDistanceAggregator2: 1 - (1-d1)(1-d2)
    np.testing.assert_allclose(
        np.asarray(pd.aggregate(jnp.asarray(d1), jnp.asarray(d2),
                                "independent")),
        1.0 - (1.0 - d1) * (1.0 - d2), rtol=1e-5)
    # SqrtAggregator: sqrt(d1^2+d2^2)/sqrt(2)
    np.testing.assert_allclose(
        np.asarray(pd.aggregate(jnp.asarray(d1), jnp.asarray(d2), "sqrt")),
        np.sqrt(d1 ** 2 + d2 ** 2) * 0.70711, rtol=1e-5)
    # Scalar versions match the array versions.
    assert pd.aggregate_scalar(0.05, 0.1, "independent") == pytest.approx(
        1.0 - 0.95 * 0.9)
    assert pd.aggregate_scalar(0.05, 0.1, "sqrt") == pytest.approx(
        np.sqrt(0.05 ** 2 + 0.1 ** 2) * 0.70711, rel=1e-4)


def test_sign_normalize_orientation_invariance(rng):
    g = rng.standard_normal((16, 2)).astype(np.float32)
    a = np.asarray(pd.sign_normalize(jnp.asarray(g)))
    b = np.asarray(pd.sign_normalize(jnp.asarray(-g)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    assert (a[:, 0] >= 0).all()


def test_gradient_features_central_difference():
    vol = np.zeros((1, 8, 8, 3), np.float32)
    vol[0, :, 4:] = 1.0  # vertical step edge
    g = np.asarray(pd.gradient_features(jnp.asarray(vol)))
    assert g.shape == (1, 8, 8, 2)
    # gx peaks at the step columns (3 and 4), gy is zero
    assert abs(g[0, 4, 3, 0] - 0.5) < 1e-5
    assert abs(g[0, 4, 4, 0] - 0.5) < 1e-5
    np.testing.assert_allclose(g[..., 1], 0.0, atol=1e-6)


@pytest.mark.parametrize("aggregator", ["linear", "independent", "sqrt"])
def test_gradient_trait_solve(rng, aggregator):
    """The solver runs with the gradient trait + each aggregator and
    separates a texture boundary with equal means (where the color-mean
    trait alone cannot)."""
    from video_segment_tpu.core import oversegmentation as ov

    h, w = 16, 32
    vol = np.full((2, h, w, 3), 0.5, np.float32)
    # left half: flat; right half: strong vertical stripes with the SAME
    # mean color -> gradient magnitudes differ sharply at the boundary.
    vol[:, :, w // 2:] += 0.3 * np.tile([1.0, -1.0], w // 4)[None, None, :,
                                                             None]
    params = ov.OversegParams(min_region_size=1, table_divisor=2,
                              preseg_schedule=(4,), gradient_trait=True,
                              aggregator=aggregator)
    res = ov.oversegment(jnp.asarray(vol), params=params)
    lab = np.asarray(res.label)
    left = np.unique(lab[:, :, : w // 2 - 2])
    right = np.unique(lab[:, :, w // 2 + 2:])
    assert not set(left) & set(right), "texture boundary was merged away"
