"""Boundary F-measure + solver determinism tests."""

import numpy as np
import jax.numpy as jnp

from video_segment_tpu.core import oversegmentation as ov
from video_segment_tpu.segment_util import metrics


def test_f_measure_identity():
    lab = np.zeros((16, 16), np.int64)
    lab[:, 8:] = 1
    r = metrics.boundary_f_measure(lab, lab)
    assert r["f_measure"] == 1.0


def test_f_measure_tolerance():
    a = np.zeros((16, 16), np.int64)
    a[:, 8:] = 1
    b = np.zeros((16, 16), np.int64)
    b[:, 9:] = 1  # boundary shifted by 1 px, within tolerance 2
    r = metrics.boundary_f_measure(a, b, tolerance=2)
    assert r["f_measure"] == 1.0
    r0 = metrics.boundary_f_measure(a, b, tolerance=0)
    assert r0["f_measure"] < 1.0


def test_f_measure_disagreement():
    a = np.zeros((32, 32), np.int64)
    a[:, 16:] = 1
    b = np.zeros((32, 32), np.int64)
    b[16:, :] = 1
    r = metrics.boundary_f_measure(a, b, tolerance=1)
    assert r["f_measure"] < 0.5


def test_covering():
    a = np.zeros((8, 8), np.int64)
    a[:, 4:] = 1
    assert metrics.segmentation_covering(a, a) == 1.0


def test_solver_determinism(rng):
    vol = jnp.asarray(rng.random((3, 24, 24, 3), dtype=np.float32))
    p = ov.OversegParams(min_region_size=4, schedule=(16, 512, 2047),
                         max_rounds_per_level=6, max_final_rounds=8,
                         min_size_rounds=6)
    a = np.asarray(ov.oversegment(vol, params=p).label)
    b = np.asarray(ov.oversegment(vol, params=p).label)
    np.testing.assert_array_equal(a, b)
