"""Banded (spatially split) edge-table solve vs the monolithic solve.

The banded path (OversegParams.bands) restores 20-frame chunks at
720p/1080p; these tests pin its correctness on CPU: on piecewise-constant
volumes the segmentation equals color connected components, so banded and
monolithic results must be identical as partitions — including regions
spanning band seams, which exercises the boundary-edge pass.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_segment_tpu.core import oversegmentation as ov


def canonical(labels: np.ndarray) -> np.ndarray:
    """Partition-canonical relabeling (first-occurrence order)."""
    flat = labels.ravel()
    _, inv = np.unique(flat, return_inverse=True)
    first = np.zeros(inv.max() + 1, np.int64)
    seen = np.unique(inv, return_index=True)
    order = np.argsort(seen[1])
    first[seen[0][order]] = np.arange(len(order))
    return first[inv].reshape(labels.shape)


def blocky_volume(t=3, h=32, w=24, seed=0):
    """Piecewise-constant volume whose blocks span band boundaries."""
    rng = np.random.default_rng(seed)
    vol = np.zeros((t, h, w, 3), np.float32)
    # vertical strips crossing every horizontal seam
    colors = rng.random((4, 3)).astype(np.float32)
    for i in range(4):
        vol[:, :, i * (w // 4):(i + 1) * (w // 4)] = colors[i]
    # a rectangle straddling the h//2 seam
    vol[:, h // 2 - 5:h // 2 + 5, 3:9] = rng.random(3).astype(np.float32)
    return jnp.asarray(vol)


PARAMS = ov.OversegParams(min_region_size=1, table_slots=0,
                          table_divisor=2, preseg_schedule=(4,),
                          edge_topk=8)


def solve(vol, bands, **kw):
    p = PARAMS._replace(bands=bands, **kw)
    res = ov.oversegment(vol, params=p)
    return np.asarray(res.label)


def test_banded_matches_monolithic_blocky():
    vol = blocky_volume()
    mono = canonical(solve(vol, 1))
    band = canonical(solve(vol, 2))
    np.testing.assert_array_equal(mono, band)
    band4 = canonical(solve(vol, 4))
    np.testing.assert_array_equal(mono, band4)


def test_banded_region_spans_seam():
    """A uniform volume must come out as ONE region despite banding."""
    vol = jnp.ones((2, 16, 16, 3), jnp.float32) * 0.5
    band = solve(vol, 2)
    assert len(np.unique(band)) == 1


def test_banded_rejects_misaligned_height():
    vol = jnp.ones((2, 20, 16, 3), jnp.float32)
    with pytest.raises(ValueError):
        solve(vol, 2)  # 10-row bands not 8-aligned


def test_banded_constrained_continuity():
    """Constraint ids survive a banded solve and pre-merged frozen plane
    fragments reunite across bands."""
    vol = blocky_volume()
    t, h, w, _ = vol.shape
    # constraints: strip index on plane 0 (frozen) and plane 1
    strip = (np.arange(w) // (w // 4)).astype(np.int32)
    constraints = np.full((t, h, w), -1, np.int32)
    constraints[0] = strip[None, :]
    constraints[1] = strip[None, :]
    frozen = np.zeros((t, h, w), bool)
    frozen[0] = True
    # banded init: per-(cid, band) canonical voxel on plane 0
    init = np.arange(t * h * w, dtype=np.int32).reshape(t, h, w)
    for bands in (1, 2):
        bh = h // bands
        key = (constraints[0].astype(np.int64) * bands
               + (np.arange(h) // bh)[:, None]).ravel()
        uniq, first = np.unique(key, return_index=True)
        init2 = init.copy()
        init2[0] = first[np.searchsorted(uniq, key)].reshape(h, w)
        res = ov.oversegment(vol, constraints=jnp.asarray(constraints),
                             init_label=jnp.asarray(init2),
                             frozen=jnp.asarray(frozen),
                             params=PARAMS._replace(bands=bands))
        lab = np.asarray(res.label)
        # every frozen-plane strip ends as one region carrying its cid
        for s in range(4):
            roots = np.unique(lab[0][:, strip == s])
            assert len(roots) == 1, (bands, s, roots)
            constr, _ = ov.region_attrs(res, roots)
            assert constr[0] == s


def test_banded_vmap_matches_map():
    vol = blocky_volume(seed=3)
    a = canonical(solve(vol, 2))
    b = canonical(solve(vol, 2, bands_vmap=True))
    np.testing.assert_array_equal(a, b)
