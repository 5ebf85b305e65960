"""Multi-device sharding tests (virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_segment_tpu.ops import filters
from video_segment_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_mesh_shape(mesh8):
    assert dict(zip(mesh8.axis_names, mesh8.devices.shape)) == {
        "data": 2, "space": 4}


def test_sharded_presmooth_matches_single_chip(rng, mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, t, h, w = 2, 2, 32, 16
    vol = rng.random((b, t, h, w, 3), dtype=np.float32)
    fn = pmesh.sharded_presmooth(mesh8, "gaussian", halo=1)
    sharded = np.asarray(fn(jax.device_put(
        jnp.asarray(vol),
        NamedSharding(mesh8, P("data", None, "space", None, None)))))
    ref = np.stack([
        np.stack([np.asarray(filters.presmooth(jnp.asarray(img), "gaussian"))
                  for img in clip]) for clip in vol])
    np.testing.assert_allclose(sharded, ref, atol=1e-5)


def test_sharded_bilateral_matches(rng, mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, t, h, w = 2, 1, 32, 16
    vol = rng.random((b, t, h, w, 3), dtype=np.float32)
    fn = pmesh.sharded_presmooth(mesh8, "bilateral", halo=4)
    sharded = np.asarray(fn(jax.device_put(
        jnp.asarray(vol),
        NamedSharding(mesh8, P("data", None, "space", None, None)))))
    ref = np.stack([
        np.stack([np.asarray(filters.presmooth(jnp.asarray(img), "bilateral"))
                  for img in clip]) for clip in vol])
    np.testing.assert_allclose(sharded, ref, atol=1e-4)


def test_halo_exchange_rows(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    h = 16
    x = jnp.arange(h, dtype=jnp.float32).reshape(h, 1, 1)

    def f(blk):
        return pmesh.halo_exchange_rows(blk, "space", 1)

    fn = jax.jit(jax.shard_map(f, mesh=mesh8, in_specs=P("space", None, None),
                               out_specs=P("space", None, None)))
    out = np.asarray(fn(jax.device_put(
        x, NamedSharding(mesh8, P("space", None, None))))).ravel()
    # Each shard of 4 rows gains one row each side; edge shards replicate.
    expected = []
    for s in range(4):
        rows = list(range(s * 4, s * 4 + 4))
        prev = rows[0] if s == 0 else rows[0] - 1
        nxt = rows[-1] if s == 3 else rows[-1] + 1
        expected += [prev] + rows + [nxt]
    np.testing.assert_array_equal(out, np.asarray(expected, np.float32))


def test_sharded_oversegment_matches_banded_single(rng, mesh8):
    """The mesh-sharded banded solve (bands on the "space" axis) must
    produce exactly the single-device banded labels."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_segment_tpu.core import oversegmentation as ov

    b, t, h, w = 2, 3, 32, 16
    vol = np.zeros((b, t, h, w, 3), np.float32)
    colors = rng.random((b, 3, 3)).astype(np.float32)
    for ci in range(b):
        vol[ci, :, :, : w // 2] = colors[ci, 0]
        vol[ci, :, :, w // 2:] = colors[ci, 1]
        vol[ci, :, h // 2 - 4:h // 2 + 4, 2:7] = colors[ci, 2]
    flow = np.zeros((b, t - 1, h, w, 2), np.float32)

    params = ov.OversegParams(min_region_size=1, table_divisor=2,
                              preseg_schedule=(4,), edge_topk=8)
    fn = pmesh.sharded_oversegment(mesh8, params)
    sharded = np.asarray(fn(
        jax.device_put(jnp.asarray(vol), NamedSharding(
            mesh8, P("data", None, "space", None, None))),
        jax.device_put(jnp.asarray(flow), NamedSharding(
            mesh8, P("data", None, "space", None, None)))))

    space = dict(zip(mesh8.axis_names, mesh8.devices.shape))["space"]
    for ci in range(b):
        single = np.asarray(ov.oversegment(
            jnp.asarray(vol[ci]),
            params=params._replace(bands=space)).label)
        np.testing.assert_array_equal(sharded[ci], single)


def _synthetic_clip(rng, t, h, w):
    """Moving-square clip with well-separated colors."""
    vol = np.zeros((t, h, w, 3), np.float32)
    vol[...] = (0.1, 0.2, 0.3)
    for i in range(t):
        y = 4 + i
        vol[i, y:y + 8, 6:18] = (0.8, 0.7, 0.6)
    vol += rng.normal(0, 0.002, vol.shape).astype(np.float32)
    return np.clip(vol, 0.0, 1.0)


def test_mesh_constrained_streaming_matches_single(rng, mesh8):
    """The FULL streaming dense driver (constrained chunk solves with
    frozen/init planes, global id continuity) on the mesh must emit
    exactly the single-device result: chunk solves run through
    parallel.mesh.sharded_chunk_solver with rows on "space"."""
    from video_segment_tpu.core import dense
    from video_segment_tpu.core.options import DenseSegmentationOptions

    t, h, w = 10, 32, 32
    clip = (_synthetic_clip(rng, t, h, w) * 255).astype(np.uint8)
    space = dict(zip(mesh8.axis_names, mesh8.devices.shape))["space"]

    def run(mesh):
        opts = DenseSegmentationOptions(
            chunk_size=4, enforce_spatial_connectedness=False,
            solver_bands=0 if mesh is not None else space)
        ds = dense.DenseSegmentation(opts, w, h, mesh=mesh)
        out = []
        for fr in clip:
            out += ds.process_frame(False, fr)
        out += ds.process_frame(True)
        assert ds._chunk_id >= 2  # the constrained path actually ran
        return out

    ref = run(None)
    got = run(mesh8)
    assert len(got) == len(ref) == t
    from video_segment_tpu.segment_util import util
    for a, b in zip(ref, got):
        ia = util.rasterize_ids(a.region_ids, a.interval_counts,
                                np.stack([a.ys, a.lxs, a.rxs], 1), h, w)
        ib = util.rasterize_ids(b.region_ids, b.interval_counts,
                                np.stack([b.ys, b.lxs, b.rxs], 1), h, w)
        np.testing.assert_array_equal(ia, ib)


def test_sharded_agglomeration_matches(rng, mesh8):
    """The region-stage agglomeration program accepts row-sharded
    statistics tables (regions over the whole mesh) and produces the
    single-device hierarchy exactly."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_segment_tpu.core import agglomeration

    r, rcap, b = 24, 32, 16
    hist = np.zeros((rcap, b), np.float32)
    hist[np.arange(r), rng.integers(0, b, r)] = 100.0
    hist[:r] += rng.random((r, b)).astype(np.float32)
    sizes = np.zeros(rcap, np.float32)
    sizes[:r] = rng.integers(50, 500, r).astype(np.float32)
    edges = np.stack([np.arange(r - 1), np.arange(1, r)], axis=1)
    fh = np.zeros((0, rcap, 4), np.float32)
    fc = np.zeros((0, rcap), np.float32)

    plain = agglomeration.agglomerate(hist, fh, fc, sizes, edges, r,
                                      use_flow=False)
    all_axes = P(("data", "space"))
    sh = NamedSharding(mesh8, P(("data", "space"), None))
    sharded = agglomeration.agglomerate(
        jax.device_put(jnp.asarray(hist), sh), fh, fc,
        jax.device_put(jnp.asarray(sizes), NamedSharding(mesh8, all_axes)),
        edges, r, use_flow=False)
    assert len(plain) == len(sharded) > 0
    for a, b2 in zip(plain, sharded):
        np.testing.assert_array_equal(a, b2)


def test_fused_multi_clip_solve_matches_per_clip(rng):
    """fused_oversegment batches clips through ONE compiled program
    (vmap over the clip axis); each clip's labels must equal the
    single-clip solve."""
    from video_segment_tpu.core import oversegmentation as ov

    b, t, h, w = 3, 3, 16, 16
    vol = np.zeros((b, t, h, w, 3), np.float32)
    colors = rng.random((b, 3, 3)).astype(np.float32)
    for ci in range(b):
        vol[ci, :, :, : w // 2] = colors[ci, 0]
        vol[ci, :, :, w // 2:] = colors[ci, 1]
        vol[ci, :, h // 2 - 3:h // 2 + 3, 2:7] = colors[ci, 2]
    flow = np.zeros((b, t - 1, h, w, 2), np.float32)

    params = ov.OversegParams(min_region_size=1, table_divisor=2,
                              preseg_schedule=(4,), edge_topk=8)
    fused = np.asarray(pmesh.fused_oversegment(params)(
        jnp.asarray(vol), jnp.asarray(flow)))
    assert fused.shape == (b, t, h, w)
    for ci in range(b):
        single = np.asarray(ov.oversegment(
            jnp.asarray(vol[ci]),
            params=params._replace(edge_table=True)).label)
        np.testing.assert_array_equal(fused[ci], single)
