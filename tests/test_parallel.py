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
