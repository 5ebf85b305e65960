"""Tile-local Pallas edge extraction == XLA scatter extraction.

The tile path (OversegParams.extract_tile) must produce the exact same
packed edge table as the per-direction segment_min scatters for any init
labeling whose non-head regions are (8,128)-tile-local — including pixel
identity labels, flood/felz preseg labels, constraint head planes, and
flow-displaced temporal keys (interpret mode on CPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_segment_tpu.core import oversegmentation as ov


def _identity_init(t, h, w):
    return jnp.arange(t * h * w, dtype=jnp.int32)


def _tile_flood_init(t, h, w, rng):
    """Synthetic tile-local preseg: within each (8,128) tile, pixels group
    into horizontal runs rooted at the run's first pixel."""
    lab = np.zeros((t, h, w), np.int64)
    for tt in range(t):
        for y0 in range(0, h, 8):
            for x0 in range(0, w, 128):
                hh = min(8, h - y0)
                ww = min(128, w - x0)
                for dy in range(hh):
                    x = 0
                    while x < ww:
                        run = int(rng.integers(1, 9))
                        run = min(run, ww - x)
                        root = tt * h * w + (y0 + dy) * w + (x0 + x)
                        lab[tt, y0 + dy, x0 + x:x0 + x + run] = root
                        x += run
    return jnp.asarray(lab.reshape(-1), jnp.int32)


def _extract_both(vol, init_label, params, flow=None, head_planes=0,
                  constr=None):
    t, h, w, _ = vol.shape
    n_pix = t * h * w
    has_constraints = constr is not None
    if constr is None:
        constr = jnp.full(n_pix, -1, jnp.int32)
    frozen = jnp.zeros(n_pix, bool)
    fin = jnp.full(n_pix, ov._I32MAX, jnp.int32)
    r_cap = ov._table_cap(params, n_pix, h, w, has_constraints)
    nseg = r_cap + 1
    ts, memb, orig_slot = ov._init_table(vol, init_label, constr, frozen,
                                         fin, r_cap, has_constraints,
                                         params, None, head_planes)
    memb3 = memb.reshape(t, h, w)
    base = ov._extract_edges(memb3, vol, flow, nseg, r_cap, params)
    tile = ov._extract_edges(
        memb3, vol, flow, nseg, r_cap,
        params._replace(extract_tile=True),
        init_label=init_label, orig_slot=orig_slot, head_planes=head_planes)
    return np.asarray(base), np.asarray(tile)


@pytest.mark.parametrize("shape", [(1, 16, 128), (2, 16, 256), (3, 24, 144)])
def test_identity_labels_match(shape):
    rng = np.random.default_rng(0)
    t, h, w = shape
    vol = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32))
    base, tile = _extract_both(vol, _identity_init(t, h, w),
                               ov.OversegParams())
    np.testing.assert_array_equal(base, tile)


def test_tile_preseg_labels_match():
    rng = np.random.default_rng(1)
    t, h, w = 2, 16, 256
    vol = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32))
    base, tile = _extract_both(vol, _tile_flood_init(t, h, w, rng),
                               ov.OversegParams())
    np.testing.assert_array_equal(base, tile)


def test_head_planes_match():
    """Constraint head planes (non-tile-local labels) keep the scatter path
    for their pixels; combined tables must still be identical."""
    rng = np.random.default_rng(2)
    t, h, w = 3, 16, 128
    vol = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32))
    init = np.asarray(_tile_flood_init(t, h, w, rng)).copy()
    # Head plane 0: two whole-plane groups rooted at voxels 0 and w//2
    # (labels span tiles, as host-built constraint groups do).
    plane = np.arange(h * w)
    init[:h * w] = np.where((plane % w) < w // 2, 0, w // 2)
    constr = np.full(t * h * w, -1, np.int32)
    constr[:h * w] = np.where((plane % w) < w // 2, 3, 7)
    base, tile = _extract_both(vol, jnp.asarray(init, jnp.int32),
                               ov.OversegParams(),
                               head_planes=1,
                               constr=jnp.asarray(constr))
    np.testing.assert_array_equal(base, tile)


def test_flow_displaced_match():
    rng = np.random.default_rng(3)
    t, h, w = 3, 16, 128
    vol = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32))
    flow = jnp.asarray(
        rng.uniform(-2, 2, (t - 1, h, w, 2)).astype(np.float32))
    base, tile = _extract_both(vol, _tile_flood_init(t, h, w, rng),
                               ov.OversegParams(), flow=flow)
    np.testing.assert_array_equal(base, tile)


def test_full_solve_matches_scatter_path():
    rng = np.random.default_rng(5)
    vol = np.zeros((2, 16, 128, 3), np.float32)
    vol[:, :, 64:] = 0.75
    vol += rng.normal(0, 0.02, vol.shape).astype(np.float32)
    base = ov.oversegment(jnp.asarray(vol),
                          params=ov.OversegParams(min_region_size=4))
    tile = ov.oversegment(jnp.asarray(vol),
                          params=ov.OversegParams(min_region_size=4,
                                                  extract_tile=True))
    np.testing.assert_array_equal(np.asarray(base.label),
                                  np.asarray(tile.label))
