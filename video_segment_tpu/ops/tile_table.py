"""Pallas supertile-table merge rounds (phase 1.5 of the v2 over-segmenter).

With fine presegs (OversegParams.preseg_pair_merge: ~700k 4px fragments per
480p chunk — the granularity that closes the texture-recall gap, BENCH_NOTES
round 5), the global edge-table solver's early schedule levels dominate the
solve: every Boruvka round costs O(cap * K) HBM gathers at cap ~= seed count,
and levels 0..2 run ~15 such rounds while collapsing 700k seeds to ~50k.

This module runs those early-level merge rounds VMEM-resident instead.  The
solve's slots are re-blocked per (st_h, st_w) supertile of the chunk volume
(slots of one supertile contiguous, order-preserving), and one kernel launch
runs a whole level's rounds for every supertile: labels live as (row, col)
pairs over an (SR, 128) slot grid, statistics re-aggregate per round from
seed slots via one-hot MXU contractions (the ops/tile_felz pattern, lifted
from pixels to table slots), and each slot's top-K edges are gathered from
planes instead of HBM tables.  Cross-supertile and cross-constraint merges
are structurally absent — they wait for the global levels >= st_levels, the
same deferral the masked global rounds implement (core/oversegmentation.py
`_table_round` with `sup`).  Level-end failure scans (finalization /
unconstraining) stay GLOBAL in the caller: fins must see cross-supertile
edges (reference semantics: segmentation_graph.h:383-402 finalizes both
endpoints of any failed test in ascending order, regardless of locality).

Semantics per round mirror `_table_round` (segmentation_graph.h:383-439
admissibility, minus constraint cases — constrained slots enter blocked):
best admissible (bucket, partner-root) per region by lexicographic
(bucket, partner) order, monotone parity hooking, pointer-jump compression,
fins min-merged via per-label mins.  The pure-JAX `blocked_rounds_reference`
is the oracle; tests assert label equality in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128          # lane dim of the slot grid (minor dim of every table)
_BIG = 2 ** 30
_I32MAX = np.int32(2 ** 31 - 1)
NUM_BUCKETS = 2048
_PBITS = 12      # partner bits in packed (bucket << _PBITS | partner) keys


# ---------------------------------------------------------------------------
# Blocked layout (XLA, built once per solve)

def blocked_layout(sup, n_sup: int, s_cap: int):
    """Order-preserving per-supertile blocking of table slots.

    Args:
      sup: (nseg,) int32 supertile id per slot (the sink slot should carry
        an id >= n_sup so it never blocks a real supertile slot).
      n_sup: static supertile count.
      s_cap: static slots per supertile (SR * 128).

    Returns (g2b, b2g): g2b (nseg,) int32 blocked position per slot (-1 if
    the slot overflowed its supertile's cap or sup >= n_sup); b2g
    (n_sup*s_cap,) int32 global slot per blocked position (nseg-1 = the
    global sink slot for empty positions, so stats gathers read zeros).
    Slots keep their relative (global-id) order inside each supertile, so
    lexicographic tie-breaks and hook parity agree between the blocked and
    the global views.
    """
    nseg = sup.shape[0]
    order = jnp.argsort(sup, stable=True)
    sorted_sup = sup[order]
    starts = jnp.searchsorted(sorted_sup, jnp.arange(n_sup, dtype=sup.dtype))
    rank = jnp.arange(nseg, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_sup, n_sup - 1)].astype(jnp.int32)
    ok = (rank < s_cap) & (sorted_sup < n_sup)
    # Unplaced slots scatter into a spare dump position (dropped below) so
    # they cannot clobber a real blocked position.
    blk = jnp.where(ok, sorted_sup.astype(jnp.int32) * s_cap + rank,
                    n_sup * s_cap)
    g2b = jnp.full((nseg,), -1, jnp.int32).at[order].set(
        jnp.where(ok, blk, -1))
    b2g = jnp.full((n_sup * s_cap + 1,), nseg - 1, jnp.int32).at[blk].set(
        order.astype(jnp.int32))[:-1]
    return g2b, b2g


# ---------------------------------------------------------------------------
# Pure-JAX oracle (vmapped over supertiles by the caller / tests)

def _dist(a, b, metric):
    d0 = a[0] - b[0]
    d1 = a[1] - b[1]
    d2 = a[2] - b[2]
    if metric == "l1":
        return (jnp.abs(d0) + jnp.abs(d1) + jnp.abs(d2)) * (1.0 / 3.0)
    return jnp.sqrt((d0 * d0 + d1 * d1 + d2 * d2) * (1.0 / 3.0))


def blocked_rounds_reference(lab, size, c0, c1, c2, fin, blocked, edges,
                             theta, *, rounds: int, merge_threshold: float,
                             force_merge_weight: float, metric: str):
    """One supertile's gated-level merge rounds, flat-indexed JAX oracle.

    Args:
      lab: (S,) int32 current local root per slot.
      size, c0..c2: (S,) f32 SEED statistics (per original slot).
      fin: (S,) int32 region finalize level of each slot's launch-time root.
      blocked: (S,) bool — slot's region may not merge (constrained, frozen,
        empty, or overflow slot).
      edges: (K, S) int32 packed bucket << _PBITS | partner-local-idx,
        _I32MAX = absent.  Cross-supertile edges must already be absent.
      theta: level bucket threshold (traced ok).
      rounds: max Boruvka rounds (static).
    Returns (S,) int32 labels after the rounds.
    """
    s = lab.shape[0]
    slots = jnp.arange(s, dtype=jnp.int32)
    ptn = edges & ((1 << _PBITS) - 1)
    bkt = jnp.where(edges < _I32MAX, edges >> _PBITS, NUM_BUCKETS)
    valid = edges < _I32MAX

    def round_body(carry):
        lab, i, idle = carry
        sums = jax.ops.segment_sum(
            jnp.stack([size, c0, c1, c2], axis=1), lab, num_segments=s)
        size_t = sums[:, 0]
        mean = sums[:, 1:4] / jnp.maximum(size_t, 1.0)[:, None]
        fin_t = jax.ops.segment_min(fin, lab, num_segments=s)
        blk_t = jax.ops.segment_max(blocked.astype(jnp.int32), lab,
                                    num_segments=s) > 0
        own = lab                       # (S,) root per slot
        om = mean[own]                  # (S,3) own-region mean
        ofin = fin_t[own]
        oblk = blk_t[own]
        a2 = lab[jnp.minimum(ptn, s - 1)]        # (K,S) partner roots
        nm = mean[a2]                            # (K,S,3)
        nfin = fin_t[a2]
        nblk = blk_t[a2]
        d = _dist(jnp.moveaxis(om, -1, 0)[:, None, :],
                  jnp.moveaxis(nm, -1, 0), metric)
        w_eff = bkt.astype(jnp.float32) * (1.0 / NUM_BUCKETS)
        d = jnp.where((w_eff < force_merge_weight) & (d < 0.2), 0.0, d)
        adm = (valid & (bkt <= theta) & (a2 != own[None])
               & (bkt < ofin[None]) & (bkt < nfin) & (d < merge_threshold)
               & ~oblk[None] & ~nblk)
        pk = jnp.where(adm, (bkt << _PBITS) | a2, _I32MAX)
        best_slot = jnp.min(pk, axis=0)          # (S,)
        best_t = jax.ops.segment_min(best_slot, own, num_segments=s)
        have = best_t < _I32MAX
        ptn_t = best_t & ((1 << _PBITS) - 1)
        up = (i % 2) == 0
        hook = have & ((ptn_t > slots) == up)
        parent = jnp.where(hook, ptn_t, slots)
        for _ in range(int(np.ceil(np.log2(max(s, 2))))):
            parent = parent[parent]
        new_lab = parent[lab]
        moved = jnp.sum(new_lab != lab)
        idle = jnp.where(jnp.sum(have) == 0, 2,
                         jnp.where(moved > 0, 0, idle + 1))
        return new_lab, i + 1, idle

    def cond(carry):
        _, i, idle = carry
        return (idle < 2) & (i < rounds)

    lab, _, _ = jax.lax.while_loop(
        cond, round_body, (lab, jnp.int32(0), jnp.int32(0)))
    return lab


# ---------------------------------------------------------------------------
# Pallas kernel: identical round structure, (SR, 128) slot grid per
# supertile, label-indexed work as one-hot MXU contractions (the
# ops/tile_felz pattern over table slots instead of pixels).

_FBIG = 2.0 ** 30   # float sentinel; packed keys are < 2**23 (exact in f32)


def _onehot_cols(labc, sr):
    b = jax.lax.broadcasted_iota(jnp.int32, (sr, L, L), 2)
    return labc[:, :, None] == b


def _aggregate_many(labr, ohc_f, vs, sr):
    """Per-label sums of the (sr, L) value planes: T[a,b] = sum of v over
    slots with label (a,b).  One batched dot against the column one-hot."""
    k = len(vs)
    a3 = jax.lax.broadcasted_iota(jnp.int32, (sr, sr, L), 1)
    mask = labr[:, None, :] == a3                       # (i, a, j)
    lhs = jnp.concatenate(
        [jnp.where(mask, v[:, None, :], 0.0) for v in vs], axis=1)
    out = jax.lax.dot_general(lhs, ohc_f, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = jnp.sum(out, axis=0)                          # (k*sr, L)
    return [out[i * sr:(i + 1) * sr] for i in range(k)]


def _distribute_many(idx_r, ohc_f, tables, sr):
    """Gather per-slot values from (sr, L) tables at (idx_r, idx_c) where
    ohc_f one-hot-encodes idx_c: g[i,j] = table[idx_r[i,j], idx_c[i,j]]."""
    k = len(tables)
    stk = jnp.concatenate(tables, axis=0)               # (k*sr, L)
    p = jax.lax.dot_general(stk, ohc_f, (((1,), (2,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = p.reshape(k, sr, sr, L)                         # (k, a, i, j)
    mask = idx_r[None] == jax.lax.broadcasted_iota(jnp.int32, (sr, sr, L), 0)
    return [jnp.sum(jnp.where(mask, p[i], 0.0), axis=0) for i in range(k)]


def _label_min_f(labr, ohc, v, sr):
    """Per-label min of the f32 plane v (+_FBIG identity) as (sr, L)."""
    vb = jnp.where(ohc, v[:, :, None], _FBIG)
    labr3 = labr[:, :, None]

    def body(a, acc):
        va = jnp.where(labr3 == a, vb, _FBIG)
        row = jnp.min(va, axis=(0, 1))
        return jax.lax.dynamic_update_slice(acc, row[None], (a, 0))

    return jax.lax.fori_loop(0, sr, body, jnp.full((sr, L), _FBIG))


def _compose(pa, pb, sr):
    """One pointer jump of the (row, col) parent tables: P <- P[P]."""
    ohc_f = _onehot_cols(pb, sr).astype(jnp.float32)
    pa2, pb2 = _distribute_many(pa, ohc_f, [pa.astype(jnp.float32),
                                            pb.astype(jnp.float32)], sr)
    return pa2.astype(jnp.int32), pb2.astype(jnp.int32)


def _kernel(labr_ref, labc_ref, size_ref, c0_ref, c1_ref, c2_ref, fin_ref,
            blk_ref, edges_ref, outr_ref, outc_ref, *, sr, k_edges, theta,
            rounds, merge_threshold, force_merge_weight, metric):
    labr0 = labr_ref[0]
    labc0 = labc_ref[0]
    size = size_ref[0]
    c0 = c0_ref[0]
    c1 = c1_ref[0]
    c2 = c2_ref[0]
    fin_f = fin_ref[0].astype(jnp.float32)
    blk_f = blk_ref[0].astype(jnp.float32)
    edges = edges_ref[0]                                 # (k, sr, L)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (sr, L), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (sr, L), 1)
    self_flat = row_iota * L + col_iota
    pmask = (1 << _PBITS) - 1

    def merge_round(carry):
        labr, labc, i, idle = carry
        ohc = _onehot_cols(labc, sr)
        ohc_f = ohc.astype(jnp.float32)
        size_t, s0, s1, s2 = _aggregate_many(labr, ohc_f,
                                             [size, c0, c1, c2], sr)
        den = jnp.maximum(size_t, 1.0)
        m0, m1, m2 = s0 / den, s1 / den, s2 / den
        fin_t = _label_min_f(labr, ohc, fin_f, sr)
        # Own-region values per slot.  A blocked slot never merges, so a
        # region is blocked iff its root seed is: the root-cell lookup of
        # the per-slot blocked plane is the region flag.
        om0, om1, om2, ofin_f, oblk_f, = _distribute_many(
            labr, ohc_f, [m0, m1, m2, fin_t, blk_f], sr)
        own_flat = labr * L + labc
        ofin = ofin_f.astype(jnp.int32)
        # Per-slot own-region value planes double as partner lookups:
        # plane[slot] = value of the region CONTAINING slot, so gathering
        # them at a partner's seed slot yields the partner region's values
        # without a second root indirection.
        own_flat_f = own_flat.astype(jnp.float32)

        def edge_fold(kk, best):
            e = jax.lax.dynamic_slice(edges, (kk, 0, 0), (1, sr, L))[0]
            valid = e < _I32MAX
            eptn = jnp.where(valid, e & pmask, 0)
            ebkt = jnp.where(valid, e >> _PBITS, NUM_BUCKETS)
            pr = eptn >> 7
            pc = eptn & (L - 1)
            ohp_f = _onehot_cols(pc, sr).astype(jnp.float32)
            nm0, nm1, nm2, nfin_f, nblk_f, nroot_f = _distribute_many(
                pr, ohp_f, [om0, om1, om2, ofin_f, oblk_f, own_flat_f], sr)
            d0, d1, d2 = om0 - nm0, om1 - nm1, om2 - nm2
            if metric == "l1":
                d = (jnp.abs(d0) + jnp.abs(d1) + jnp.abs(d2)) * (1.0 / 3.0)
            else:
                d = jnp.sqrt((d0 * d0 + d1 * d1 + d2 * d2) * (1.0 / 3.0))
            w_eff = ebkt.astype(jnp.float32) * (1.0 / NUM_BUCKETS)
            d = jnp.where((w_eff < force_merge_weight) & (d < 0.2), 0.0, d)
            nroot = nroot_f.astype(jnp.int32)
            nfin = nfin_f.astype(jnp.int32)
            adm = (valid & (ebkt <= theta) & (nroot != own_flat)
                   & (ebkt < ofin) & (ebkt < nfin) & (d < merge_threshold)
                   & (oblk_f < 0.5) & (nblk_f < 0.5))
            pk = jnp.where(adm, ((ebkt << _PBITS) | nroot).astype(
                jnp.float32), _FBIG)
            return jnp.minimum(best, pk)

        best = jax.lax.fori_loop(0, k_edges, edge_fold,
                                 jnp.full((sr, L), _FBIG))
        best_t = _label_min_f(labr, ohc, best, sr)       # per-label table
        have = best_t < 0.5 * _FBIG
        ptn_t = jnp.where(have, best_t.astype(jnp.int32) & pmask, self_flat)
        up = (i % 2) == 0
        hook = have & ((ptn_t > self_flat) == up)
        par_r = jnp.where(hook, ptn_t >> 7, row_iota)
        par_c = jnp.where(hook, ptn_t & (L - 1), col_iota)

        def jcond(c):
            return c[2]

        def jbody(c):
            pr_, pc_, _ = c
            nr, nc = _compose(pr_, pc_, sr)
            return nr, nc, jnp.any((nr != pr_) | (nc != pc_))

        par_r, par_c, _ = jax.lax.while_loop(
            jcond, jbody, (par_r, par_c, jnp.bool_(True)))
        nlr_f, nlc_f = _distribute_many(labr, ohc_f,
                                        [par_r.astype(jnp.float32),
                                         par_c.astype(jnp.float32)], sr)
        nlabr = nlr_f.astype(jnp.int32)
        nlabc = nlc_f.astype(jnp.int32)
        moved = jnp.sum(((nlabr != labr) | (nlabc != labc))
                        .astype(jnp.int32))
        nhave = jnp.sum(have.astype(jnp.int32))
        idle = jnp.where(nhave == 0, 2,
                         jnp.where(moved > 0, 0, idle + 1))
        return nlabr, nlabc, i + 1, idle

    def cond(carry):
        return (carry[3] < 2) & (carry[2] < rounds)

    labr, labc, _, _ = jax.lax.while_loop(
        cond, merge_round, (labr0, labc0, jnp.int32(0), jnp.int32(0)))
    outr_ref[0] = labr
    outc_ref[0] = labc


def tile_table_rounds(labr, labc, size, c0, c1, c2, fin, blocked, edges,
                      *, theta: int, rounds: int, merge_threshold: float,
                      force_merge_weight: float, metric: str,
                      interpret: bool = False):
    """One gated level's merge rounds over blocked supertile tables.

    Args: all (N, SR, 128) except edges (N, K, SR, 128); labr/labc int32
    local roots, size/c0..c2 f32 seed stats, fin int32 region fins,
    blocked int32 (1 = region may not merge), edges packed
    bucket << 12 | partner-local-idx (_I32MAX absent, cross-supertile
    edges pre-masked).  Returns (labr, labc) after the rounds.
    """
    n, sr, l_ = labr.shape
    assert l_ == L
    k_edges = edges.shape[1]
    kern = functools.partial(
        _kernel, sr=sr, k_edges=k_edges, theta=theta, rounds=rounds,
        merge_threshold=merge_threshold,
        force_merge_weight=force_merge_weight, metric=metric)
    spec3 = pl.BlockSpec((1, sr, L), lambda i: (i, 0, 0))
    spec4 = pl.BlockSpec((1, k_edges, sr, L), lambda i: (i, 0, 0, 0))
    outr, outc = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec3] * 8 + [spec4],
        out_specs=[spec3, spec3],
        out_shape=[jax.ShapeDtypeStruct((n, sr, L), jnp.int32)] * 2,
        interpret=interpret,
    )(labr, labc, size, c0, c1, c2, fin, blocked, edges)
    return outr, outc
