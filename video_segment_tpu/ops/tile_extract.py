"""Pallas per-tile edge-table extraction reduction.

The edge-table solver's one-time region-adjacency extraction reduces, for
every stencil direction, the minimum-bucket pixel edge per (region,
direction) (core/oversegmentation._extract_edges).  The XLA formulation is
one O(pixels) `segment_min` scatter per direction — measured as the single
largest device phase of a chunk solve (scatter-bound; BENCH_NOTES round 3).

After the tile pre-segmentation, every (non-constraint-plane) region is
local to one (8,128) tile, so the per-(region, direction) minima reduce
entirely in VMEM with the same one-hot machinery the tile solver uses
(ops/tile_felz): a region's label IS its root cell's (row % 8, col % 128)
coordinate pair.  The global table then *gathers* each slot's minima from
its root cell — O(regions) instead of O(pixels) random-access updates.

Direction keys (packed (bucket << bits) | global partner id) are computed
OUTSIDE the kernel by the existing direction fold (halo shifts and
flow-displaced gathers stay in XLA, where they are cheap elementwise work);
the kernel only performs the label-keyed min reduction that XLA could only
express as a scatter.

Reduction layout mirrors tile_felz: one column one-hot per tile
(8,128,128), per-label-row masked int32 minima.  Keys use up to 31 bits, so
reductions stay in int32 (the f32 tables of tile_felz would corrupt partner
bits above 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_segment_tpu.ops.tile_felz import TILE_H, TILE_W, _onehot_cols

_I32MAX = jnp.iinfo(jnp.int32).max


def _label_min_i32(labr, ohc, v):
    """Per-label min of int32 v (+I32MAX identity) as a (8,128) table.

    Exact int32 arithmetic (packed keys carry partner ids in the low bits;
    the f32 variant in tile_felz is only safe below 2^24)."""
    rows = []
    vb = jnp.where(ohc, v[:, :, None], _I32MAX)          # (i, j, b)
    labr3 = labr[:, :, None]
    for a in range(TILE_H):
        va = jnp.where(labr3 == a, vb, _I32MAX)
        rows.append(jnp.min(va, axis=(0, 1))[None, :])
    return jnp.concatenate(rows, axis=0)


def _kernel(labr_ref, labc_ref, keys_ref, out_ref, *, band_h, n_dirs):
    def sub_body(s, _):
        ds = pl.ds(s * TILE_H, TILE_H)
        labr = labr_ref[0, ds]
        labc = labc_ref[0, ds]
        ohc = _onehot_cols(labc)
        for d in range(n_dirs):
            out_ref[d, 0, ds] = _label_min_i32(labr, ohc, keys_ref[d, 0, ds])
        return 0

    jax.lax.fori_loop(0, band_h // TILE_H, sub_body, 0)


@functools.partial(jax.jit, static_argnames=())
def tile_reduce_min(labr: jnp.ndarray, labc: jnp.ndarray,
                    keys: jnp.ndarray) -> jnp.ndarray:
    """Per-(tile, label, direction) minima of packed edge keys.

    labr/labc: (T,H,W) int32 tile-local label of each pixel's region root
    (its root cell's row % TILE_H / col % TILE_W — tile-locality is the
    preseg contract).  keys: (D,T,H,W) int32 packed (bucket, partner),
    I32MAX where absent.  Returns (D,T,H,W) int32: at each region's root
    cell, the minimum key over the region's pixels for that direction;
    I32MAX at cells that root no region.
    """
    d_cols, t, h, w = keys.shape
    band_h = 64 if h % 64 == 0 or h >= 256 else TILE_H
    if h % band_h and h % 32 == 0:
        band_h = 32
    elif h % band_h and h % 16 == 0:
        band_h = 16
    hp = -(-h // band_h) * band_h
    wp = -(-w // TILE_W) * TILE_W
    padded = (hp != h) or (wp != w)
    if padded:
        # Padded pixels carry I32MAX keys and label (0,0): harmless.
        labr = jnp.pad(labr, ((0, 0), (0, hp - h), (0, wp - w)))
        labc = jnp.pad(labc, ((0, 0), (0, hp - h), (0, wp - w)))
        keys = jnp.pad(keys, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                       constant_values=_I32MAX)

    lspec = pl.BlockSpec((1, band_h, TILE_W), lambda ti, yi, xi: (ti, yi, xi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((d_cols, 1, band_h, TILE_W),
                         lambda ti, yi, xi: (0, ti, yi, xi),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, band_h=band_h, n_dirs=d_cols),
        out_shape=jax.ShapeDtypeStruct((d_cols, t, hp, wp), jnp.int32),
        grid=(t, hp // band_h, wp // TILE_W),
        in_specs=[lspec, lspec, kspec],
        out_specs=kspec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(labr, labc, keys)
    if padded:
        out = out[:, :, :h, :w]
    return out
