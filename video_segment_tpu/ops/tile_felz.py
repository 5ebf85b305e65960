"""Pallas tile-local Felzenszwalb solver (Stage A of the v2 over-segmenter).

Runs the full bucket-schedule merge semantics of the reference
(segmentation_graph.h:339-463: ascending weight levels, mean-color
descriptor gate, finalize-on-failed-test) *locally* inside (8,128) VMEM
tiles, one frame at a time, so the global edge-table solver starts from
~10-100x fewer regions than raw pixels.  Cross-tile, temporal, constraint,
and min-region-size semantics are NOT handled here — they belong to the
global phases.

Everything is VMEM-resident and label-indexed work is expressed as
one-hot contractions so the MXU does it:

- a tile label is a (row, col) pair (labr in [0,8), labc in [0,128)), so
  tables are (8,128)-shaped and no (8,128)->(1024,..) reshape is needed
  (Mosaic rejects that shape cast);
- aggregate(v)[a,b]   = sum of v over pixels with label (a,b):
  per-channel dot_general batched over pixel rows;
- distribute(T)[i,j]  = T[labr[i,j], labc[i,j]]:
  one dot_general against the row one-hot + a masked lane reduction;
- per-label min/max: masked (8,128,128) reductions per label row.

The pure-NumPy mirror `tile_felz_reference` implements the identical
round structure; tests assert exact label equality in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_segment_tpu.ops import cc

TILE_H = 8
TILE_W = 128
NUM_BUCKETS = 2048
_BIG = 2 ** 30  # python int; jnp constants would be captured by the kernel

# In-tile N8 directions as (dy, dx); every edge is proposed from both ends.
DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


def _roll2(x, dy, dx):
    """Neighbor view: value at (i+dy, j+dx), non-wrapping handled by masks."""
    return pltpu.roll(pltpu.roll(x, (-dy) % TILE_H, axis=0),
                      (-dx) % TILE_W, axis=1)


def _onehot_cols(labc):
    """(8,128) int32 col labels -> (8,128,128) bool one-hot over columns.

    Built ONCE per round and threaded through every aggregate / distribute
    / per-label reduction.  Everything label-indexed runs as per-label-ROW
    slices against this column one-hot: all large intermediates keep a
    128-wide minor dimension (lane-aligned) — an (i,j,a) row one-hot has
    minor dim 8 and wastes 15/16 of each vector register."""
    b = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, TILE_W), 2)
    return labc[:, :, None] == b


def _row_iota3():
    """(a, i, j) iota over the label-row axis a."""
    return jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_H, TILE_W), 0)


def _aggregate(labr, ohc_f, v):
    """Sum v (8,128) into label table (8,128): T[a,b] = sum over pixels
    with label (a,b).  lhs[i,a,j] = v[i,j] masked to label row a; one dot
    batched over pixel rows i contracting j (Mosaic needs a single
    contracting dim), then a sum over i.  128-minor operands throughout."""
    return _aggregate_many(labr, ohc_f, [v])[0]


def _aggregate_many(labr, ohc_f, vs):
    """Fused _aggregate of K value planes: ONE dot against the column
    one-hot (its (8,128,128) read dominated per-round traffic when issued
    per plane).  Each output row is the same contraction the single-plane
    form computes, so results are identical."""
    k = len(vs)
    a3 = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_H, TILE_W), 1)
    mask = labr[:, None, :] == a3                       # (i, a, j)
    lhs = jnp.concatenate(
        [jnp.where(mask, v[:, None, :], 0.0) for v in vs], axis=1)
    out = jax.lax.dot_general(lhs, ohc_f, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = jnp.sum(out, axis=0)                          # (k*8, 128)
    return [out[i * TILE_H:(i + 1) * TILE_H] for i in range(k)]


def _distribute(labr, ohc_f, table):
    """Per-pixel value of its label: g[i,j] = table[labr[i,j], labc[i,j]].
    p[a,i,j] = table[a, labc[i,j]] via one dot against the column one-hot,
    then a masked sum over the 8 label rows."""
    return _distribute_many(labr, ohc_f, [table])[0]


def _distribute_many(labr, ohc_f, tables):
    """Fused _distribute of K tables (one one-hot read)."""
    k = len(tables)
    stk = jnp.concatenate(tables, axis=0)               # (k*8, 128)
    p = jax.lax.dot_general(stk, ohc_f, (((1,), (2,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = p.reshape(k, TILE_H, TILE_H, TILE_W)            # (k, a, i, j)
    mask = labr[None] == _row_iota3()
    return [jnp.sum(jnp.where(mask, p[i], 0.0), axis=0) for i in range(k)]


def _label_min(labr, ohc, v):
    """Per-label min of v (+_BIG identity), returned as a (8,128) table."""
    rows = []
    vb = jnp.where(ohc, v[:, :, None].astype(jnp.float32), 2.0 ** 31)
    labr3 = labr[:, :, None]   # int32 minor-dim insertion (i1 unsupported)
    for a in range(TILE_H):
        va = jnp.where(labr3 == a, vb, 2.0 ** 31)
        rows.append(jnp.min(va, axis=(0, 1))[None, :])
    return jnp.concatenate(rows, axis=0).astype(jnp.int32)


def _label_min_masked(labr, ohc, v):
    """Per-label min of f32 v (+big identity), as (8,128) f32 table."""
    rows = []
    vb = jnp.where(ohc, v[:, :, None], 2.0 ** 31)
    labr3 = labr[:, :, None]
    for a in range(TILE_H):
        va = jnp.where(labr3 == a, vb, 2.0 ** 31)
        rows.append(jnp.min(va, axis=(0, 1))[None, :])
    return jnp.concatenate(rows, axis=0)


def _compose(pa, pb):
    """One pointer-jump of the (row,col) parent tables: P <- P[P]."""
    ohc_f = _onehot_cols(pb).astype(jnp.float32)
    pa2, pb2 = _distribute_many(pa, ohc_f, [pa.astype(jnp.float32),
                                            pb.astype(jnp.float32)])
    return pa2.astype(jnp.int32), pb2.astype(jnp.int32)


def _dist(a, b, metric):
    d0 = a[0] - b[0]
    d1 = a[1] - b[1]
    d2 = a[2] - b[2]
    if metric == "l1":
        return (jnp.abs(d0) + jnp.abs(d1) + jnp.abs(d2)) * (1.0 / 3.0)
    return jnp.sqrt((d0 * d0 + d1 * d1 + d2 * d2) * (1.0 / 3.0))


def _solve_subtile(color3, gy, gx, h, w, *, schedule, rounds_per_level,
                   merge_threshold, metric, fin_margin,
                   fin_eager=False, fin_gated=False, pair_merge=False):
    """Full local solve of one (8,128) subtile.  Returns flat local root
    label (8,128) int32 in [0,1024) and per-pixel fin flag (8,128) f32.

    The level/round iteration runs as ONE lax.fori_loop body (merge round
    or conditional level-end), keeping the Mosaic program small: iteration
    i of n_levels*(rounds_per_level+1) decodes to level i//(R+1) and phase
    i%(R+1); theta comes from a branch-free select over the static
    schedule."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    inb = (gy < h) & (gx < w)

    c = [color3[:, :, 0], color3[:, :, 1], color3[:, :, 2]]

    # Static per-direction edge buckets + validity.
    buckets = []
    valids = []
    for dy, dx in DIRS:
        nb = [_roll2(ch, dy, dx) for ch in c]
        d = _dist(c, nb, metric)
        bkt = jnp.clip((d * NUM_BUCKETS).astype(jnp.int32), 0,
                       NUM_BUCKETS - 1)
        nb_inb = _roll2(inb.astype(jnp.int32), dy, dx) > 0
        v = (inb & nb_inb
             & (rows + dy >= 0) & (rows + dy < TILE_H)
             & (cols + dx >= 0) & (cols + dx < TILE_W))
        buckets.append(bkt)
        valids.append(v)

    n_levels = len(schedule)
    rounds = ((rounds_per_level,) * n_levels
              if isinstance(rounds_per_level, int)
              else tuple(rounds_per_level))
    assert len(rounds) == n_levels, (rounds, schedule)

    def region_views(labr, ohc_f):
        """Per-pixel region means (fused aggregate + distribute)."""
        ones = jnp.ones((TILE_H, TILE_W), jnp.float32)
        size_t, s0, s1, s2 = _aggregate_many(labr, ohc_f, [ones] + c)
        den = jnp.maximum(size_t, 1.0)
        return _distribute_many(labr, ohc_f, [s0 / den, s1 / den, s2 / den])

    def merge_round(labr, labc, fin_t, fin_x, theta, rnd):
        ohc = _onehot_cols(labc)
        ohc_f = ohc.astype(jnp.float32)
        ones = jnp.ones((TILE_H, TILE_W), jnp.float32)
        size_t, s0, s1, s2 = _aggregate_many(labr, ohc_f, [ones] + c)
        den = jnp.maximum(size_t, 1.0)
        mean_px0 = _distribute_many(labr, ohc_f,
                                    [s0 / den, s1 / den, s2 / den, fin_t])
        mean_px, fin_px = mean_px0[:3], mean_px0[3]   # f32 finalize level
        lab_flat = labr * TILE_W + labc
        best = jnp.full((TILE_H, TILE_W), _BIG, jnp.int32)
        fbig = jnp.float32(float(_BIG))
        fail = jnp.full((TILE_H, TILE_W), fbig, jnp.float32)
        strong = jnp.full((TILE_H, TILE_W), fbig, jnp.float32)
        for k, (dy, dx) in enumerate(DIRS):
            nb_mean = [_roll2(m, dy, dx) for m in mean_px]
            nb_fin = _roll2(fin_px, dy, dx)
            nb_lab = _roll2(lab_flat, dy, dx)
            dd = _dist(mean_px, nb_mean, metric)
            adm = (valids[k] & (buckets[k] <= theta)
                   & (nb_lab != lab_flat)
                   & (buckets[k] < fin_px) & (buckets[k] < nb_fin)
                   & (dd < merge_threshold))
            cand = (buckets[k] << 10) | nb_lab
            best = jnp.minimum(best, jnp.where(adm, cand, _BIG))
            if fin_eager:
                # Eager finalization (one-round lag): a failed merge test
                # freezes both endpoints at the failing bucket before the
                # NEXT round instead of only at level end — the ascending
                # per-edge order of segmentation_graph.h:383-402, where the
                # first failure stops a region's growth immediately.  Gated
                # like the reference's test (only edges between two not-yet-
                # finalized regions count as tests).
                bk = buckets[k].astype(jnp.float32)
                act = (valids[k] & (buckets[k] <= theta)
                       & (nb_lab != lab_flat)
                       & (bk < fin_px) & (bk < nb_fin))
                fail = jnp.minimum(
                    fail, jnp.where(act & (dd >= merge_threshold), bk, fbig))
                strong = jnp.minimum(
                    strong,
                    jnp.where(act & (dd >= merge_threshold * fin_margin),
                              bk, fbig))
        if fin_eager:
            # Fold the existing tables through the aggregation (cell a's
            # pixel carries label b after an a->b hook, so aggregating the
            # table AS a pixel plane transfers orphaned fins to the root).
            fin_t = _label_min_masked(labr, ohc, jnp.minimum(fail, fin_t))
            fin_x = _label_min_masked(labr, ohc, jnp.minimum(strong, fin_x))

        best_t = _label_min(labr, ohc, best)
        partner = best_t & 1023
        have = best_t < _BIG
        own_flat = rows * TILE_W + cols           # table cell's own label id
        up = (rnd % 2) == 0
        hook = have & ((partner > own_flat) == up)
        if pair_merge:
            # Depth-1 hooking: cancel hooks whose target also hooks this
            # round, so every merge is tested against the target's CURRENT
            # mean instead of collapsing a->b->c chains through b's stale
            # one (the reference re-evaluates after every single merge,
            # segmentation_graph.h:339-463).  The chain end's hook always
            # survives, so progress is guaranteed.
            pa_t = partner >> 7
            pb_t = partner & 127
            hookp = _distribute(pa_t, _onehot_cols(pb_t).astype(jnp.float32),
                                jnp.where(hook, 1.0, 0.0))
            hook = hook & (hookp < 0.5)
        pa = jnp.where(hook, partner >> 7, rows)
        pb = jnp.where(hook, partner & 127, cols)
        # Parity hooking chains are monotone; one jump resolves <=2 deep.
        # Deeper chains leave stale labels that simply re-merge next round
        # (and the caller's final pointer_jump resolves any residue).
        pa, pb = _compose(pa, pb)
        labr2, labc = (x.astype(jnp.int32) for x in _distribute_many(
            labr, ohc_f, [pa.astype(jnp.float32), pb.astype(jnp.float32)]))
        return labr2, labc, fin_t, fin_x

    def level_end(labr, labc, fin_t, fin_x, theta, _rnd):
        # A failed merge test finalizes both endpoint regions FROM THE
        # FAILING EDGE'S WEIGHT UP (segmentation_graph.h:399-402 processes
        # edges in ascending order, so "finalized forever" there means
        # "no merges at weight >= the failing edge's weight"): fin tables
        # record the minimum failing bucket, and merge admissibility is
        # bucket < fin.  A blanket flag would also block near-zero-weight
        # edges the sequential reference would have merged long before the
        # failure — across tile seams that preserved the 8x128 grid in
        # smooth areas.  The EXPORTED level (fin_x) only counts strong
        # failures (dd >= margin * threshold): borderline tile-local
        # failures often dissolve once the global phase sees whole-region
        # means (round-3 sweep).
        ohc = _onehot_cols(labc)
        ohc_f = ohc.astype(jnp.float32)
        mean_px = region_views(labr, ohc_f)
        lab_flat = labr * TILE_W + labc
        fin_px = _distribute(labr, ohc_f, fin_t) if fin_gated else None
        fail = jnp.full((TILE_H, TILE_W), _BIG, jnp.int32)
        strong = jnp.full((TILE_H, TILE_W), _BIG, jnp.int32)
        for k, (dy, dx) in enumerate(DIRS):
            nb_mean = [_roll2(m, dy, dx) for m in mean_px]
            nb_lab = _roll2(lab_flat, dy, dx)
            dd = _dist(mean_px, nb_mean, metric)
            act = (valids[k] & (buckets[k] <= theta)
                   & (nb_lab != lab_flat))
            if fin_gated:
                # Reference test gate (segmentation_graph.h:388): only
                # edges between two not-yet-finalized regions are tested,
                # so an edge to an already-finalized neighbor cannot
                # finalize this region.
                bk = buckets[k].astype(jnp.float32)
                nb_fin = _roll2(fin_px, dy, dx)
                act = act & (bk < fin_px) & (bk < nb_fin)
            bad = act & (dd >= merge_threshold)
            fail = jnp.minimum(fail, jnp.where(bad, buckets[k], _BIG))
            strong = jnp.minimum(
                strong,
                jnp.where(act & (dd >= merge_threshold * fin_margin),
                          buckets[k], _BIG))
        fail_f = fail.astype(jnp.float32)
        strong_f = strong.astype(jnp.float32)
        if fin_eager:
            # Transfer orphaned fins of merged-away roots (see merge_round).
            fail_f = jnp.minimum(fail_f, fin_t)
            strong_f = jnp.minimum(strong_f, fin_x)
            fin_t = _label_min_masked(labr, ohc, fail_f)
            fin_x = _label_min_masked(labr, ohc, strong_f)
        else:
            fin_t = jnp.minimum(fin_t, _label_min_masked(labr, ohc, fail_f))
            fin_x = jnp.minimum(
                fin_x, _label_min_masked(labr, ohc, strong_f))
        return labr, labc, fin_t, fin_x

    # Static per-iteration decode (theta, merge-vs-level-end, round parity
    # index) via branch-free scalar selects (Pallas kernels cannot capture
    # constant arrays): a per-LEVEL round count (rounds may be a tuple,
    # e.g. many depth-1 rounds at low thetas where convergence is safe,
    # few at the texture-forming levels) without a ragged loop structure.
    iters = []                                   # (theta, is_merge, rnd)
    for lv, th in enumerate(schedule):
        for ph in range(rounds[lv] + 1):
            iters.append((th, ph < rounds[lv], ph))

    def body(i, carry):
        labr, labc, fin_t, fin_x = carry
        theta = jnp.int32(0)
        merge = jnp.bool_(False)
        rnd = jnp.int32(0)
        for pos, (th, mg, ph) in enumerate(iters):
            sel = i == pos
            theta = jnp.where(sel, jnp.int32(th), theta)
            merge = jnp.where(sel, jnp.bool_(mg), merge)
            rnd = jnp.where(sel, jnp.int32(ph), rnd)
        return jax.lax.cond(merge, merge_round, level_end,
                            labr, labc, fin_t, fin_x, theta, rnd)

    open_f = jnp.full((TILE_H, TILE_W), float(_BIG), jnp.float32)
    labr, labc, fin_t, fin_x = jax.lax.fori_loop(
        0, len(iters), body, (rows, cols, open_f, open_f))

    # Resolve residual label chains to a fixed point, min-propagating the
    # fin table along the pointer graph as labels jump: fins (and the
    # stats below) recorded at a STALE chain root would otherwise be
    # orphaned when its pixels re-point to the true root.
    def jcond(carry):
        return carry[3]

    def jbody(carry):
        labr, labc, finx, _ = carry
        ohc_b = _onehot_cols(labc)
        ohc_f = ohc_b.astype(jnp.float32)
        finx2 = _label_min_masked(labr, ohc_b, finx)
        nr, nc = (x.astype(jnp.int32) for x in _distribute_many(
            labr, ohc_f, [labr.astype(jnp.float32),
                          labc.astype(jnp.float32)]))
        chg = jnp.any((nr != labr) | (nc != labc))
        return nr, nc, finx2, chg

    labr, labc, fin_x, _ = jax.lax.while_loop(
        jcond, jbody, (labr, labc, fin_x, jnp.bool_(True)))

    # Final per-region statistics, exported CELL-POSITIONED (value lives at
    # the pixel position of its region's root cell): the global solver's
    # init then gathers per-slot stats from O(regions) cells instead of
    # segment-summing O(pixels) — the pixel-space scatters dominated
    # _init_table on the remote backend.
    ohc_f = _onehot_cols(labc).astype(jnp.float32)
    fin_px = _distribute(labr, ohc_f, fin_x)
    ones = jnp.ones((TILE_H, TILE_W), jnp.float32)
    size_t = _aggregate(labr, ohc_f, ones)
    csum_t = [_aggregate(labr, ohc_f, ch) for ch in c]
    return labr * TILE_W + labc, fin_px, size_t, csum_t


def _kernel(vol_ref, out_ref, fin_ref, size_ref, c0_ref, c1_ref, c2_ref, *,
            h, w, band_h, schedule, rounds_per_level, merge_threshold,
            metric, fin_margin, fin_eager, fin_gated, pair_merge):
    t_idx = pl.program_id(0)
    y_idx = pl.program_id(1)
    x_idx = pl.program_id(2)

    def sub_body(s, _):
        color3 = vol_ref[0, pl.ds(s * TILE_H, TILE_H)]
        y0 = y_idx * band_h + s * TILE_H
        x0 = x_idx * TILE_W
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        gy = y0 + rows
        gx = x0 + cols
        lab, fin, size_t, csum_t = _solve_subtile(
            color3, gy, gx, h, w, schedule=schedule,
            rounds_per_level=rounds_per_level,
            merge_threshold=merge_threshold,
            metric=metric, fin_margin=fin_margin,
            fin_eager=fin_eager, fin_gated=fin_gated,
            pair_merge=pair_merge)
        # local root -> global voxel id
        root_y = y0 + (lab >> 7)
        root_x = x0 + (lab & 127)
        ds = pl.ds(s * TILE_H, TILE_H)
        out_ref[0, ds] = t_idx * (h * w) + root_y * w + root_x
        # Finalize level, NUM_BUCKETS == never finalized (open).
        fin_ref[0, ds] = \
            jnp.minimum(fin, float(NUM_BUCKETS)).astype(jnp.int32)
        size_ref[0, ds] = size_t
        c0_ref[0, ds] = csum_t[0]
        c1_ref[0, ds] = csum_t[1]
        c2_ref[0, ds] = csum_t[2]
        return 0

    jax.lax.fori_loop(0, band_h // TILE_H, sub_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("schedule", "rounds_per_level",
                                    "merge_threshold", "metric",
                                    "fin_margin", "fin_eager", "fin_gated",
                                    "pair_merge"))
def tile_felzenszwalb(vol: jnp.ndarray,
                      schedule: tuple = (4, 32, 192, 1024),
                      rounds_per_level: int | tuple = 2,
                      merge_threshold: float = 0.05,
                      metric: str = "l2",
                      fin_margin: float = 1.0,
                      fin_eager: bool = False,
                      fin_gated: bool = False,
                      pair_merge: bool = False):
    """(T,H,W,3) float volume -> (labels, fin, (size, c0, c1, c2)).

    `stats` are CELL-POSITIONED per-region statistics ((T,H,W) f32 each):
    the voxel count and per-channel color sums of each region, stored at
    the pixel position of the region's root cell (0 elsewhere) — the
    global solver's table init gathers these instead of re-reducing
    pixels.  Labels are global voxel ids of in-tile roots
    (self-rooted).  `fin` is
    the finalize LEVEL of each pixel's local region: the minimum bucket at
    which a strong merge test failed (NUM_BUCKETS = never failed).  The
    global solver admits merges only at bucket < fin — the ascending-order
    meaning of the reference's finalization (segmentation_graph.h:399-402):
    a blanket "finalized" flag would also block the near-zero-weight edges
    the sequential reference merges long before any failure, which is what
    preserved 8x128 tile seams in smooth areas.
    """
    t, h, w, _ = vol.shape
    band_h = 64 if h % 64 == 0 or h >= 256 else TILE_H
    if h % band_h and h % 32 == 0:
        band_h = 32        # avoid 15% dead padded rows (e.g. h=272 -> 288)
    elif h % band_h and h % 16 == 0:
        band_h = 16
    hp = -(-h // band_h) * band_h
    wp = -(-w // TILE_W) * TILE_W
    volp = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                   constant_values=1e6)

    ospec = pl.BlockSpec((1, band_h, TILE_W),
                         lambda ti, yi, xi: (ti, yi, xi),
                         memory_space=pltpu.VMEM)
    out, fin, size_c, c0, c1, c2 = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, band_h=band_h,
                          schedule=schedule,
                          rounds_per_level=rounds_per_level,
                          merge_threshold=merge_threshold, metric=metric,
                          fin_margin=fin_margin, fin_eager=fin_eager,
                          fin_gated=fin_gated, pair_merge=pair_merge),
        out_shape=(jax.ShapeDtypeStruct((t, hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((t, hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((t, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((t, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((t, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((t, hp, wp), jnp.float32)),
        grid=(t, hp // band_h, wp // TILE_W),
        in_specs=[pl.BlockSpec((1, band_h, TILE_W, 3),
                               lambda ti, yi, xi: (ti, yi, xi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(ospec,) * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(volp)
    out = out[:, :h, :w]
    fin = fin[:, :h, :w]
    stats = (size_c[:, :h, :w], c0[:, :h, :w], c1[:, :h, :w],
             c2[:, :h, :w])
    # Labels are self-rooted by construction (the root cell's own label is
    # itself after full pointer jumping), but pointer-jump defensively —
    # it exits after one no-change iteration.
    return (cc.pointer_jump(out.reshape(-1)).reshape(out.shape), fin,
            stats)


# ---------------------------------------------------------------------------
# NumPy mirror (same round structure; used as the test oracle).


def tile_felz_reference(vol: np.ndarray, schedule=(4, 32, 192, 1024),
                        rounds_per_level: int = 2,
                        merge_threshold: float = 0.05,
                        metric: str = "l2",
                        fin_margin: float = 1.0,
                        fin_eager: bool = False,
                        fin_gated: bool = False,
                        pair_merge: bool = False):
    """Sequential NumPy mirror of the kernel, tile by tile."""
    t, h, w, _ = vol.shape
    out = np.zeros((t, h, w), np.int64)
    fin_out = np.zeros((t, h, w), np.int64)
    size_out = np.zeros((t, h, w), np.float32)
    csum_out = np.zeros((t, h, w, 3), np.float32)
    for ti in range(t):
        for y0 in range(0, h, TILE_H):
            for x0 in range(0, w, TILE_W):
                hh = min(TILE_H, h - y0)
                ww = min(TILE_W, w - x0)
                pad = np.full((TILE_H, TILE_W, 3), 1e6, np.float32)
                pad[:hh, :ww] = vol[ti, y0:y0 + hh, x0:x0 + ww]
                lab, fin = _ref_subtile(pad, hh, ww, schedule,
                                        rounds_per_level, merge_threshold,
                                        metric, fin_margin,
                                        fin_eager=fin_eager,
                                        fin_gated=fin_gated,
                                        pair_merge=pair_merge)
                ry, rx = lab[:hh, :ww] // TILE_W, lab[:hh, :ww] % TILE_W
                out[ti, y0:y0 + hh, x0:x0 + ww] = \
                    ti * h * w + (y0 + ry) * w + (x0 + rx)
                fin_out[ti, y0:y0 + hh, x0:x0 + ww] = fin[:hh, :ww]
                # Cell-positioned region stats over valid pixels.
                lv = lab[:hh, :ww].ravel()
                sz = np.zeros(TILE_H * TILE_W, np.float32)
                cs = np.zeros((TILE_H * TILE_W, 3), np.float32)
                np.add.at(sz, lv, 1.0)
                np.add.at(cs, lv, pad[:hh, :ww].reshape(-1, 3))
                cells = np.flatnonzero(sz > 0)
                cy, cx = cells // TILE_W, cells % TILE_W
                size_out[ti, y0 + cy, x0 + cx] = sz[cells]
                csum_out[ti, y0 + cy, x0 + cx] = cs[cells]
    return out, fin_out, (size_out, csum_out[..., 0], csum_out[..., 1],
                          csum_out[..., 2])


def _ref_subtile(c, hh, ww, schedule, rounds_per_level, merge_threshold,
                 metric, fin_margin=1.0, fin_eager=False, fin_gated=False,
                 pair_merge=False):
    def dist(a, b):
        d = a - b
        if metric == "l1":
            return np.abs(d).sum(-1) / 3.0
        return np.sqrt((d * d).sum(-1) / 3.0)

    rows, cols = np.mgrid[0:TILE_H, 0:TILE_W]
    inb = (rows < hh) & (cols < ww)
    lab = (rows * TILE_W + cols).astype(np.int64)

    buckets = {}
    valids = {}
    for dy, dx in DIRS:
        nb = np.roll(np.roll(c, -dy, axis=0), -dx, axis=1)
        bkt = np.clip((dist(c, nb) * NUM_BUCKETS).astype(np.int64), 0,
                      NUM_BUCKETS - 1)
        nb_inb = np.roll(np.roll(inb, -dy, axis=0), -dx, axis=1)
        v = (inb & nb_inb & (rows + dy >= 0) & (rows + dy < TILE_H)
             & (cols + dx >= 0) & (cols + dx < TILE_W))
        buckets[(dy, dx)] = bkt
        valids[(dy, dx)] = v

    BIG = 2 ** 30
    fin = np.full(TILE_H * TILE_W, BIG, np.int64)    # finalize level
    fin_x = np.full(TILE_H * TILE_W, BIG, np.int64)  # exported (strong)

    def tables():
        csum = np.zeros((TILE_H * TILE_W, 3))
        size = np.zeros(TILE_H * TILE_W)
        np.add.at(csum, lab.ravel(), c.reshape(-1, 3))
        np.add.at(size, lab.ravel(), 1.0)
        return csum / np.maximum(size, 1.0)[:, None]

    rounds = ((rounds_per_level,) * len(schedule)
              if isinstance(rounds_per_level, int)
              else tuple(rounds_per_level))
    for lvl_i, theta in enumerate(schedule):
        for rnd in range(rounds[lvl_i]):
            mean = tables()
            mean_px = mean[lab]
            fin_px = fin[lab]
            best = np.full((TILE_H, TILE_W), BIG, np.int64)
            for dy, dx in DIRS:
                nb_lab = np.roll(np.roll(lab, -dy, axis=0), -dx, axis=1)
                nb_mean = np.roll(np.roll(mean_px, -dy, axis=0), -dx, axis=1)
                nb_fin = np.roll(np.roll(fin_px, -dy, axis=0), -dx, axis=1)
                dd = dist(mean_px, nb_mean)
                bkt = buckets[(dy, dx)]
                adm = (valids[(dy, dx)] & (bkt <= theta)
                       & (nb_lab != lab) & (bkt < fin_px) & (bkt < nb_fin)
                       & (dd < merge_threshold))
                cand = (bkt << 10) | nb_lab
                best = np.minimum(best, np.where(adm, cand, BIG))
            if fin_eager:
                fail = np.full((TILE_H, TILE_W), BIG, np.int64)
                strong = np.full((TILE_H, TILE_W), BIG, np.int64)
                for dy, dx in DIRS:
                    nb_lab = np.roll(np.roll(lab, -dy, axis=0), -dx, axis=1)
                    nb_mean = np.roll(np.roll(mean_px, -dy, axis=0), -dx,
                                      axis=1)
                    nb_fin = np.roll(np.roll(fin_px, -dy, axis=0), -dx,
                                     axis=1)
                    dd = dist(mean_px, nb_mean)
                    bkt = buckets[(dy, dx)]
                    act = (valids[(dy, dx)] & (bkt <= theta)
                           & (nb_lab != lab)
                           & (bkt < fin_px) & (bkt < nb_fin))
                    fail = np.minimum(
                        fail, np.where(act & (dd >= merge_threshold),
                                       bkt, BIG))
                    strong = np.minimum(
                        strong,
                        np.where(act & (dd >= merge_threshold * fin_margin),
                                 bkt, BIG))
                f2 = np.full(TILE_H * TILE_W, 2 ** 31, np.int64)
                np.minimum.at(
                    f2, lab.ravel(),
                    np.minimum(fail,
                               fin.reshape(TILE_H, TILE_W)).ravel())
                fin = f2
                s2 = np.full(TILE_H * TILE_W, 2 ** 31, np.int64)
                np.minimum.at(
                    s2, lab.ravel(),
                    np.minimum(strong,
                               fin_x.reshape(TILE_H, TILE_W)).ravel())
                fin_x = s2
            best_t = np.full(TILE_H * TILE_W, BIG, np.int64)
            np.minimum.at(best_t, lab.ravel(), best.ravel())
            partner = best_t & 1023
            have = best_t < BIG
            own = np.arange(TILE_H * TILE_W)
            up = (rnd % 2) == 0
            hook = have & ((partner > own) == up)
            if pair_merge:
                # Depth-1 hooking (see the kernel's merge_round).
                hook = hook & ~hook[partner]
            parent = np.where(hook, partner, own)
            parent = parent[parent]
            lab = parent[lab]

        mean = tables()
        mean_px = mean[lab]
        fin_px = fin[lab]
        fail = np.full((TILE_H, TILE_W), BIG, np.int64)
        strong = np.full((TILE_H, TILE_W), BIG, np.int64)
        for dy, dx in DIRS:
            nb_lab = np.roll(np.roll(lab, -dy, axis=0), -dx, axis=1)
            nb_mean = np.roll(np.roll(mean_px, -dy, axis=0), -dx, axis=1)
            dd = dist(mean_px, nb_mean)
            bkt = buckets[(dy, dx)]
            act = (valids[(dy, dx)] & (bkt <= theta) & (nb_lab != lab))
            if fin_gated:
                nb_fin = np.roll(np.roll(fin_px, -dy, axis=0), -dx, axis=1)
                act = act & (bkt < fin_px) & (bkt < nb_fin)
            fail = np.minimum(fail,
                              np.where(act & (dd >= merge_threshold),
                                       bkt, BIG))
            strong = np.minimum(
                strong,
                np.where(act & (dd >= merge_threshold * fin_margin),
                         bkt, BIG))
        if fin_eager:
            fail_t = np.full(TILE_H * TILE_W, 2 ** 31, np.int64)
            np.minimum.at(
                fail_t, lab.ravel(),
                np.minimum(fail, fin.reshape(TILE_H, TILE_W)).ravel())
            fin = fail_t
            strong_t = np.full(TILE_H * TILE_W, 2 ** 31, np.int64)
            np.minimum.at(
                strong_t, lab.ravel(),
                np.minimum(strong, fin_x.reshape(TILE_H, TILE_W)).ravel())
            fin_x = strong_t
        else:
            fail_t = np.full(TILE_H * TILE_W, BIG, np.int64)
            np.minimum.at(fail_t, lab.ravel(), fail.ravel())
            fin = np.minimum(fin, fail_t)
            strong_t = np.full(TILE_H * TILE_W, BIG, np.int64)
            np.minimum.at(strong_t, lab.ravel(), strong.ravel())
            fin_x = np.minimum(fin_x, strong_t)

    # Resolve residual label chains, min-propagating fins along the
    # pointer graph exactly as the kernel's export loop does (fins at a
    # stale chain root would otherwise be orphaned by the jump).
    flat = lab.ravel().copy()
    while True:
        f2 = np.full(TILE_H * TILE_W, 2 ** 31, np.int64)
        np.minimum.at(f2, flat, fin_x)
        fin_x = f2
        nf = flat[flat]
        done = (nf == flat).all()
        flat = nf
        if done:
            break
    lab = flat.reshape(lab.shape)
    return lab, np.minimum(fin_x, NUM_BUCKETS)[lab]
