"""Spatio-temporal pixel-graph edge construction (device-side).

Replaces the reference's per-frame threaded edge jobs
(dense_segmentation_graph.h:956-1142) with batched tensor ops over the whole
chunk volume:

- Spatial edges: forward N8 stencil per pixel — right, bottom, bottom-left,
  bottom-right (AddSpatialEdgesImpl).
- Temporal edges: 9-neighborhood into the previous frame around an anchor
  that is the pixel itself, or the pixel displaced along backward optical
  flow with C-style truncation and clamping (AddTemporalEdgesImpl /
  AddTemporalFlowEdgesImpl).  Neighborhood validity is tested on the anchor
  position, as in GetLocalEdges.

Weights are the reference color distances on smoothed [0,1] BGR
(pixel_distance.h:141-157): L1 = mean abs diff, L2 = sqrt(mean sq diff).
Invalid (out-of-bounds) edges carry weight +inf.

Edges are exposed as a flat structured list (u, v, w) of static size
4*T*H*W + 9*(T-1)*H*W so downstream solvers stay shape-static under jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

SPATIAL_OFFSETS = ((0, 1), (1, 0), (1, -1), (1, 1))
TEMPORAL_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


class EdgeList(NamedTuple):
    u: jnp.ndarray  # (E,) int32 flat voxel index, t*H*W + y*W + x
    v: jnp.ndarray  # (E,) int32
    w: jnp.ndarray  # (E,) float32, +inf where invalid


def color_dist(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    d = a - b
    if metric == "l1":
        return jnp.sum(jnp.abs(d), axis=-1) * (1.0 / 3.0)
    if metric == "l2":
        return jnp.sqrt(jnp.sum(d * d, axis=-1) * (1.0 / 3.0))
    raise ValueError(f"unknown metric: {metric}")


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x[..., y+dy, x+dx, :] with zero fill (validity handled by masks)."""
    out = x
    h, w = x.shape[-3], x.shape[-2]
    out = jnp.roll(out, (-dy, -dx), axis=(-3, -2))
    return out


def _valid_mask(h: int, w: int, dy: int, dx: int) -> jnp.ndarray:
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return ((ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w))


def spatial_edge_weights(vol: jnp.ndarray, metric: str = "l2") -> jnp.ndarray:
    """(T,H,W,3) -> (4,T,H,W) forward-N8 weights, +inf at frame borders."""
    t, h, w, _ = vol.shape
    ws = []
    for dy, dx in SPATIAL_OFFSETS:
        nb = _shift2d(vol, dy, dx)
        d = color_dist(vol, nb, metric)
        ws.append(jnp.where(_valid_mask(h, w, dy, dx), d, jnp.inf))
    return jnp.stack(ws)


def temporal_edge_weights(vol: jnp.ndarray, flow: jnp.ndarray | None,
                          metric: str = "l2"):
    """Temporal 9-neighborhood edges from frame t to t-1.

    vol: (T,H,W,3); flow: (T-1,H,W,2) backward flow for frames 1..T-1 or None.
    Returns (w, v): both (9, T-1, H, W); v is the flat voxel index of the
    previous-frame endpoint.
    """
    t, h, w, _ = vol.shape
    curr = vol[1:]          # (T-1,H,W,3)
    prev = vol[:-1]
    n = h * w

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    if flow is None:
        py = jnp.broadcast_to(ys, (t - 1, h, w))
        px = jnp.broadcast_to(xs, (t - 1, h, w))
    else:
        # C truncation toward zero, then clamp (AddTemporalFlowEdgesImpl).
        px = jnp.clip((xs[None] + flow[..., 0]).astype(jnp.int32), 0, w - 1)
        py = jnp.clip((ys[None] + flow[..., 1]).astype(jnp.int32), 0, h - 1)

    prev_flat = prev.reshape(t - 1, n, 3)
    frame_base = (jnp.arange(t - 1, dtype=jnp.int32) * n)[:, None, None]

    weights = []
    targets = []
    for dy, dx in TEMPORAL_OFFSETS:
        ny = py + dy
        nx = px + dx
        valid = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        nyc = jnp.clip(ny, 0, h - 1)
        nxc = jnp.clip(nx, 0, w - 1)
        flat = nyc * w + nxc                              # (T-1,H,W)
        nb = jnp.take_along_axis(
            prev_flat, flat.reshape(t - 1, n, 1), axis=1
        ).reshape(t - 1, h, w, 3)
        d = color_dist(curr, nb, metric)
        weights.append(jnp.where(valid, d, jnp.inf))
        targets.append(frame_base + flat)
    return jnp.stack(weights), jnp.stack(targets).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("metric", "has_flow"))
def _build_edges_impl(vol, flow, metric, has_flow):
    t, h, w, _ = vol.shape
    n = h * w
    sw = spatial_edge_weights(vol, metric)                # (4,T,H,W)
    idx = (jnp.arange(t * n, dtype=jnp.int32)).reshape(t, h, w)
    su = jnp.broadcast_to(idx, (4, t, h, w))
    sv = []
    for dy, dx in SPATIAL_OFFSETS:
        sv.append(idx + dy * w + dx)
    sv = jnp.stack(sv)

    tw, tv = temporal_edge_weights(vol, flow if has_flow else None, metric)
    tu = jnp.broadcast_to(idx[1:], (9, t - 1, h, w)) if t > 1 else \
        jnp.zeros((9, 0, h, w), jnp.int32)

    u = jnp.concatenate([su.reshape(-1), tu.reshape(-1)])
    v = jnp.concatenate([sv.reshape(-1), tv.reshape(-1)])
    wgt = jnp.concatenate([sw.reshape(-1), tw.reshape(-1)])
    # Normalize invalid entries to self-loops at node 0.
    bad = ~jnp.isfinite(wgt)
    u = jnp.where(bad, 0, u)
    v = jnp.where(bad, 0, v)
    return EdgeList(u=u, v=v, w=wgt)


def build_chunk_edges(vol: jnp.ndarray, flow: jnp.ndarray | None = None,
                      metric: str = "l2") -> EdgeList:
    """Build the full spatio-temporal edge list for a chunk volume."""
    if flow is None:
        t, h, w, _ = vol.shape
        dummy = jnp.zeros((max(t - 1, 0), h, w, 2), jnp.float32)
        return _build_edges_impl(vol, dummy, metric, False)
    return _build_edges_impl(vol, flow, metric, True)
