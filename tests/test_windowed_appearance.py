"""WindowedAppearanceDescriptor option vs NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from video_segment_tpu.core import region as region_mod
from video_segment_tpu.ops import histograms as hops


def test_accumulate_windowed_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    tpad, h, w = 4, 6, 8
    rcap, wcap = 8, 3
    lb, cb = 4, 5
    labels = rng.integers(0, rcap - 1, (tpad, h, w)).astype(np.int32)
    lab_u8 = rng.integers(0, 256, (tpad, h, w, 3)).astype(np.uint8)
    gains = rng.uniform(0.8, 1.2, (tpad, 3)).astype(np.float32)
    win_slot = np.array([0, 0, 1, 2], np.int32)

    wh, wc = region_mod._accumulate_windowed(
        jnp.asarray(labels), jnp.asarray(lab_u8), jnp.asarray(gains),
        jnp.asarray(win_slot), rcap, wcap, lb, cb)
    wh, wc = np.asarray(wh), np.asarray(wc)

    # Oracle: AddValueInterpolated semantics (histograms.cpp:142-199).
    nb = lb * cb * cb
    ref = np.zeros((wcap, rcap, nb), np.float64)
    cnt = np.zeros((wcap, rcap), np.float64)
    for t in range(tpad):
        for y in range(h):
            for x in range(w):
                v = np.minimum(lab_u8[t, y, x] * gains[t], 255.0)
                coords = [v[0] / 255.0 * (lb - 1), v[1] / 255.0 * (cb - 1),
                          v[2] / 255.0 * (cb - 1)]
                axes = []
                for c in coords:
                    i0 = int(c)
                    d = c - i0
                    i1 = i0 + (1 if d >= 1e-6 else 0)
                    axes.append(((i0, 1 - d), (i1, d)))
                r = labels[t, y, x]
                s = win_slot[t]
                cnt[s, r] += 1
                for xi, wx in axes[0]:
                    for yi, wy in axes[1]:
                        for zi, wz in axes[2]:
                            ref[s, r, (xi * cb + yi) * cb + zi] += wx * wy * wz
    np.testing.assert_allclose(wh, ref, atol=1e-3)
    np.testing.assert_allclose(wc, cnt, atol=1e-5)


def test_windowed_distance_matches_oracle():
    rng = np.random.default_rng(1)
    nw, r, b = 3, 6, 10
    wh = rng.random((nw, r, b)).astype(np.float32)
    wcnt = (rng.random((nw, r)) > 0.2).astype(np.float32) * \
        rng.integers(1, 50, (nw, r))
    edges = np.array([[0, 1], [2, 3], [4, 5]], np.int32)

    got = np.asarray(hops.edge_color_distance_windowed(
        jnp.asarray(wh), jnp.asarray(wcnt.astype(np.float32)),
        jnp.asarray(edges)))

    def chi2(p, q):
        p = p / max(p.sum(), 1e-12)
        q = q / max(q.sum(), 1e-12)
        den = p + q
        return 0.5 * np.sum(np.where(den > 0, (p - q) ** 2 / np.maximum(den, 1e-12), 0))

    for k, (a, bb) in enumerate(edges):
        ds, ws = 0.0, 0.0
        for wi in range(nw):
            if wcnt[wi, a] <= 0:
                continue
            best, bw = np.inf, 0.0
            for m in range(max(wi - 1, 0), min(wi + 2, nw)):
                if wcnt[m, bb] <= 0:
                    continue
                d = chi2(wh[wi, a], wh[m, bb])
                if d < best:
                    best, bw = d, min(wcnt[wi, a], wcnt[m, bb])
            if np.isfinite(best):
                ds += best * bw
                ws += bw
        want = ds / ws if ws > 0 else 0.0
        np.testing.assert_allclose(got[k], want, atol=1e-4), k


def test_windowed_pipeline_runs():
    """End-to-end smoke: region stage with appearance_window_size set."""
    from video_segment_tpu.core import dense
    from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                                RegionSegmentationOptions)
    rng = np.random.default_rng(2)
    frames = []
    for i in range(12):
        img = np.full((20, 24, 3), 60, np.uint8)
        img[:, :12] = (200, 80, 40)
        img[(4 + i // 2) % 12:(12 + i // 2) % 20, 14:20] = (40, 200, 120)
        frames.append(img)
    ds = dense.DenseSegmentation(
        DenseSegmentationOptions(chunk_size=4, presmoothing="gaussian",
                                 frac_min_region_size=0.1), 24, 20)
    rs = region_mod.RegionSegmentation(
        RegionSegmentationOptions(chunk_set_size=2, chunk_set_overlap=1,
                                  min_region_num=2, max_region_num=30,
                                  use_flow=False,
                                  appearance_window_size=4), 24, 20)
    out = []
    for i, fr in enumerate(frames):
        rs.add_frame(i, fr)
        out += rs.process_frames(False, ds.process_frame(False, fr))
    out += rs.process_frames(True, ds.process_frame(True))
    assert out and any(sf.hierarchy for sf in out)
