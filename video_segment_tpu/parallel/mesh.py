"""Device-mesh sharding of the segmentation compute path.

Multi-chip strategy (the reference is single-process shared-memory,
SURVEY §2.7; this is the TPU-native scale-out design):

- "data" axis: clip/chunk parallelism — each chip segments different clips
  or different chunk batches (the production serving topology).
- "space" axis: frame rows.  The pixel front-end (presmoothing, edge
  weights, TV-L1 iterations) shards with ppermute halo exchange; the
  SOLVER shards through its row-band decomposition
  (`OversegParams.bands` + `bands_vmap`, `sharded_oversegment` below):
  each device runs the pixel phases (seed compaction, edge extraction) of
  its own band, and the O(regions) global table phases run on the
  all-gathered band tables — the expensive O(pixels) work never leaves
  its shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              space: int | None = None) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if data is None or space is None:
        # Favor spatial sharding within a clip, data across clips.
        space = min(4, n)
        while n % space:
            space -= 1
        data = n // space
    return Mesh(np.asarray(devs).reshape(data, space), ("data", "space"))


def halo_exchange_rows(x: jnp.ndarray, axis_name: str = "space",
                       halo: int = 1, border: str = "edge") -> jnp.ndarray:
    """Pad a row-sharded (..., Hs, W, C) block with `halo` rows from its
    mesh neighbors.  At the outer mesh boundary the fill matches the
    downstream filter's border mode: "edge" (BORDER_REPLICATE) or
    "reflect" (reflect-101), so shard outputs equal single-chip outputs."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    top = x[..., :halo, :, :]
    bot = x[..., -halo:, :, :]
    from_prev = jax.lax.ppermute(bot, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    if border == "reflect":
        top_fill = jnp.flip(x[..., 1:halo + 1, :, :], axis=-3)
        bot_fill = jnp.flip(x[..., -halo - 1:-1, :, :], axis=-3)
    else:  # edge: the border row repeated, as BORDER_REPLICATE does
        top_fill = jnp.repeat(x[..., :1, :, :], halo, axis=-3)
        bot_fill = jnp.repeat(x[..., -1:, :, :], halo, axis=-3)
    from_prev = jnp.where(idx == 0, top_fill, from_prev)
    from_next = jnp.where(idx == n - 1, bot_fill, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=-3)


def sharded_presmooth(mesh: Mesh, mode: str = "bilateral", halo: int = 4):
    """pjit-ed presmoothing over (B,T,H,W,3): B on "data", H on "space".

    The halo supplies true neighbor rows; the filter's own border padding
    only touches rows that are cropped away, so shard outputs match the
    single-chip filter exactly away from numerical noise."""
    from video_segment_tpu.ops import filters

    border = "reflect" if mode == "gaussian" else "edge"

    def shard_fn(block):  # (Bs, T, Hs, W, 3)
        padded = halo_exchange_rows(block, "space", halo, border)

        def one(img):
            out = filters.presmooth(img, mode)
            return out[halo:-halo] if halo else out

        return jax.vmap(jax.vmap(one))(padded)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=P("data", None, "space", None, None),
                       out_specs=P("data", None, "space", None, None))
    return jax.jit(fn)


def _free_solve_one(params, has_flow):
    """Per-clip unconstrained solve closure shared by the fused and
    mesh-sharded multi-clip paths: (T,H,W,3) [+(T-1,H,W,2) flow] ->
    (T,H,W) int32 labels via the edge-table solver."""
    from video_segment_tpu.core import oversegmentation as ov

    def solve_one(vol, flow):
        t, h, w, _ = vol.shape
        n = t * h * w
        return ov._solve(vol, flow, jnp.arange(n, dtype=jnp.int32),
                         jnp.full(n, -1, jnp.int32), jnp.zeros(n, bool),
                         jnp.full(n, ov.NUM_BUCKETS, jnp.int32), params,
                         has_flow, False).label

    return solve_one


def fused_oversegment(params=None, has_flow: bool = False):
    """Single-device fused multi-clip over-segmentation: ONE compiled
    program solves a whole batch of clips (vmap over the leading clip
    axis), instead of serializing per-clip programs on the chip.

    Returns fn(vols, flows) for vols (clips, T, H, W, 3) [flows
    (clips, T-1, H, W, 2)] -> (clips, T, H, W) int32 labels, identical
    per clip to the single-clip solve (vmap only batches; the math is
    per-clip).  This is the device-side half of BASELINE config 5's
    batch topology — host stages (RLE, histograms, proto emission) stay
    per-clip and overlap via tools/batch_segment --concurrent; multi-chip
    batch rides the mesh "data" axis (`sharded_oversegment`)."""
    from video_segment_tpu.core import oversegmentation as ov

    p = (params or ov.OversegParams())._replace(edge_table=True)
    return jax.jit(jax.vmap(_free_solve_one(p, has_flow)))


def sharded_oversegment(mesh: Mesh, params=None, has_flow: bool = False):
    """jit-ed over-segmentation with clips on "data" and the solver's
    row-band dimension on "space".

    Returns fn(vol, flow) for vol (clips, T, H, W, 3) [flow
    (clips, T-1, H, W, 2)] -> (clips, T, H, W) int32 labels.  H must split
    into `space` bands of 8-aligned height.  Labels are identical to the
    single-device banded solve (the band decomposition, not the mesh,
    defines the math).
    """
    from jax.sharding import NamedSharding

    from video_segment_tpu.core import oversegmentation as ov

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    p = (params or ov.OversegParams())._replace(
        bands=axes["space"], bands_vmap=True, edge_table=True)

    solve_one = _free_solve_one(p, has_flow)
    vspec = NamedSharding(mesh, P("data", None, "space", None, None))
    return jax.jit(jax.vmap(solve_one),
                   in_shardings=(vspec, vspec),
                   out_shardings=NamedSharding(
                       mesh, P("data", None, "space", None)))
