"""Device-mesh sharding of the segmentation compute path.

Multi-chip strategy (the reference is single-process shared-memory,
SURVEY §2.7; this is the TPU-native scale-out design):

- "data" axis: clip/chunk parallelism — each chip segments different clips
  or different chunk batches (the production serving topology).
- "space" axis: the pixel front-end (presmoothing, edge weights, TV-L1
  iterations) is sharded over frame rows with halo exchange via ppermute
  over ICI; stencils see identical values as the single-chip path.

The merge solver's region graph is global per chunk, so its labels ride the
data axis (one chunk per data-shard).
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
