"""TPU over-segmentation solver: bucketized parallel region merging.

Replaces the reference's sequential Felzenszwalb-style bucket-sweep
union-find (segmentation_graph.h:339-463, dense_segmentation_graph.h) with a
data-parallel formulation:

- The ascending-weight edge sweep becomes an ascending *bucket threshold
  schedule*: level k examines only edges whose 2048-bucket discretized weight
  (segmentation.h:90, dense_segmentation_graph.h:296-299) is <= theta_k.
- Within a level, Boruvka-style rounds run to a fixed point: every region
  selects its minimum-weight admissible incident edge (via a per-pixel
  stencil reduction + one segment-min keyed by region label), all selected
  edges merge simultaneously (hooking + pointer jumping), and region
  statistics (size, color sum -> mean descriptor, constraint id, finalized
  flag) are re-aggregated with segment ops.
- Merge admissibility reproduces the reference semantics
  (segmentation_graph.h:383-439): mean-color descriptor distance
  (pixel_distance.h:469-521) with strict merge threshold 0.05 and the
  force-merge shortcut; regions whose merge test fails are finalized at the
  end of each level; same-constraint regions merge while distance <= split
  threshold 0.15 and are unconstrained (smaller side, or both if within 0.3x
  size) otherwise; different constraints never merge.
- After the schedule: a forced min-region-size phase (small regions merge
  along their minimum incident edge, segmentation_graph.h:407-415) and a
  forced constraint merge phase (MergeConstrainedRegions,
  segmentation_graph.h:703-786).

Edges are never materialized as lists: the spatio-temporal N8 + 9-neighbor
graph (dense_segmentation_graph.h:956-1142) is enumerated as a static stencil
over the (T,H,W) volume, so neighbor lookups are shifts, not gathers.  With
optical flow, temporal edges from frame t anchor at the flow-displaced,
clamped position in frame t-1 (AddTemporalFlowEdgesImpl); the reverse-view
edges seen from frame t-1 are approximated by the undisplaced neighborhood
(exact when flow is absent), which only ever adds merge candidates that still
must pass the descriptor gates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_segment_tpu.ops import cc

NUM_BUCKETS = 2048
_I32MAX = jnp.iinfo(jnp.int32).max

SPATIAL_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0),
                (1, -1), (-1, 1), (1, 1), (-1, -1))
TEMPORAL_DIRS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


class OversegParams(NamedTuple):
    merge_threshold: float = 0.05      # pixel_distance.h:471
    split_threshold: float = 0.15      # pixel_distance.h:472
    force_merge_weight: float = 0.001  # dense_segmentation.cpp:259 (L2)
    min_region_size: int = 100
    metric: str = "l2"
    # Static bound on distinct constraint ids per solve (keeps the compiled
    # program independent of the actual count, avoiding per-chunk recompiles).
    max_constraints: int = 1 << 16
    # Ascending bucket thresholds; each runs Boruvka rounds to fixed point.
    schedule: tuple = (2, 8, 32, 96, 256, 768, 2047)
    max_rounds_per_level: int = 12
    max_final_rounds: int = 24
    min_size_rounds: int = 24


class SolverState(NamedTuple):
    label: jnp.ndarray   # (N,) int32: root slot per voxel
    csum: jnp.ndarray    # (N,3) f32: color sums at root slots
    size: jnp.ndarray    # (N,)  f32: voxel counts at root slots
    constr: jnp.ndarray  # (N,)  int32: compact constraint id at roots, -1 free
    fin: jnp.ndarray     # (N,)  bool: merge test failed (finalized)
    frozen: jnp.ndarray  # (N,)  bool: plays the reference's virtual-node role
                         # (already-emitted geometry; constraint never reset,
                         #  always merged with its constraint group at the end)


class OversegResult(NamedTuple):
    label: jnp.ndarray   # (T,H,W) int32 root per voxel
    constr: jnp.ndarray  # (N,) int32 constraint id at root slots
    size: jnp.ndarray    # (N,) f32 region sizes at root slots


def _dist(a, b, metric):
    d = a - b
    if metric == "l1":
        return jnp.sum(jnp.abs(d), axis=-1) * (1.0 / 3.0)
    return jnp.sqrt(jnp.sum(d * d, axis=-1) * (1.0 / 3.0))


def _roll3(x, dt, dy, dx):
    return jnp.roll(x, (-dt, -dy, -dx), axis=(0, 1, 2))


class _Dir(NamedTuple):
    """Per-direction stencil views, all shaped (T,H,W)(,C)."""
    valid: jnp.ndarray
    nb_idx: jnp.ndarray     # flat voxel index of neighbor
    bucket: jnp.ndarray     # int32 discretized edge weight
    w_eff: jnp.ndarray      # bucket / NUM_BUCKETS (reference uses bucket value)
    nb_label: jnp.ndarray
    nb_mean: jnp.ndarray
    nb_size: jnp.ndarray
    nb_constr: jnp.ndarray
    nb_fin: jnp.ndarray


def _iter_dirs(vol, flow, label3, mean3, size3, constr3, fin3, metric):
    """Yield stencil views for every incident edge direction of every voxel.

    Spatial N8 within each frame; temporal 9-neighborhood to frame t-1
    (flow-displaced anchor when flow is given) and to frame t+1 (mirror).
    """
    t, h, w, _ = vol.shape
    n = h * w
    idx3 = jnp.arange(t * n, dtype=jnp.int32).reshape(t, h, w)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    def bucketize(d):
        b = jnp.clip((d * NUM_BUCKETS).astype(jnp.int32), 0, NUM_BUCKETS - 1)
        return b, b.astype(jnp.float32) * (1.0 / NUM_BUCKETS)

    # --- spatial dirs ---
    for dy, dx in SPATIAL_DIRS:
        valid = jnp.broadcast_to(
            (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w),
            (t, h, w))
        nb = _roll3(vol, 0, dy, dx)
        b, we = bucketize(_dist(vol, nb, metric))
        yield _Dir(valid, _roll3(idx3, 0, dy, dx), b, we,
                   _roll3(label3, 0, dy, dx), _roll3(mean3, 0, dy, dx),
                   _roll3(size3, 0, dy, dx), _roll3(constr3, 0, dy, dx),
                   _roll3(fin3, 0, dy, dx))

    if t == 1:
        return

    # --- temporal dirs ---
    if flow is None:
        for toff in (-1, 1):
            tvalid = ((jnp.arange(t) + toff >= 0) &
                      (jnp.arange(t) + toff < t))[:, None, None]
            for dy, dx in TEMPORAL_DIRS:
                valid = jnp.broadcast_to(
                    tvalid & (ys + dy >= 0) & (ys + dy < h)
                    & (xs + dx >= 0) & (xs + dx < w), (t, h, w))
                nb = _roll3(vol, toff, dy, dx)
                b, we = bucketize(_dist(vol, nb, metric))
                yield _Dir(valid, _roll3(idx3, toff, dy, dx), b, we,
                           _roll3(label3, toff, dy, dx),
                           _roll3(mean3, toff, dy, dx),
                           _roll3(size3, toff, dy, dx),
                           _roll3(constr3, toff, dy, dx),
                           _roll3(fin3, toff, dy, dx))
        return

    # Flow-displaced backward edges: voxel (t,y,x), t>=1, anchors at
    # clamp(trunc((y,x)+flow[t-1])) in frame t-1 (C truncation toward zero).
    px = jnp.clip((xs[None] + flow[..., 0]).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((ys[None] + flow[..., 1]).astype(jnp.int32), 0, h - 1)

    def gather_prev(arr3, flat):
        """arr3: (T,H,W)(,C); gather frames [0..T-2] at flat (T-1,H,W)."""
        prev = arr3[:-1].reshape((t - 1, n) + arr3.shape[3:])
        g = jnp.take_along_axis(
            prev, flat.reshape(t - 1, n, *([1] * (prev.ndim - 2))), axis=1)
        return g.reshape((t - 1, h, w) + arr3.shape[3:])

    def pad_first(x, fill=0):
        pad_widths = [(1, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_widths, constant_values=fill)

    for dy, dx in TEMPORAL_DIRS:
        ny = py + dy
        nx = px + dx
        # Validity tested on anchor coords (GetLocalEdges).
        valid2 = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        flat = jnp.clip(ny, 0, h - 1) * w + jnp.clip(nx, 0, w - 1)
        nb_vol = gather_prev(vol, flat)
        b, we = bucketize(_dist(vol[1:], nb_vol, metric))
        base = (jnp.arange(t - 1, dtype=jnp.int32) * n)[:, None, None]
        yield _Dir(pad_first(valid2, False), pad_first(base + flat),
                   pad_first(b), pad_first(we),
                   pad_first(gather_prev(label3, flat)),
                   pad_first(gather_prev(mean3, flat)),
                   pad_first(gather_prev(size3, flat)),
                   pad_first(gather_prev(constr3, flat), -1),
                   pad_first(gather_prev(fin3, flat)))

    # Mirror view from frame t-1 into frame t: undisplaced neighborhood
    # (approximation of the reverse edges; see module docstring).
    for dy, dx in TEMPORAL_DIRS:
        tvalid = ((jnp.arange(t) + 1) < t)[:, None, None]
        valid = jnp.broadcast_to(
            tvalid & (ys + dy >= 0) & (ys + dy < h)
            & (xs + dx >= 0) & (xs + dx < w), (t, h, w))
        nb = _roll3(vol, 1, dy, dx)
        b, we = bucketize(_dist(vol, nb, metric))
        yield _Dir(valid, _roll3(idx3, 1, dy, dx), b, we,
                   _roll3(label3, 1, dy, dx), _roll3(mean3, 1, dy, dx),
                   _roll3(size3, 1, dy, dx), _roll3(constr3, 1, dy, dx),
                   _roll3(fin3, 1, dy, dx))


def _gather_pixel_stats(state: SolverState, shape):
    t, h, w = shape
    # Single fused gather: [mean(3), size, constr, fin, frozen] per root slot.
    mean = state.csum / jnp.maximum(state.size, 1.0)[:, None]
    table = jnp.concatenate(
        [mean, state.size[:, None], state.constr.astype(jnp.float32)[:, None],
         state.fin.astype(jnp.float32)[:, None],
         state.frozen.astype(jnp.float32)[:, None]], axis=1)
    g = table[state.label].reshape(t, h, w, 7)
    mean3 = g[..., 0:3]
    size3 = g[..., 3]
    constr3 = g[..., 4].astype(jnp.int32)
    fin3 = g[..., 5] > 0
    frozen3 = g[..., 6] > 0
    label3 = state.label.reshape(t, h, w)
    return label3, mean3, size3, constr3, fin3, frozen3


def _desc_distance(own_mean, nb_mean, w_eff, p: OversegParams):
    d = _dist(own_mean, nb_mean, p.metric)
    force = (w_eff < p.force_merge_weight) & (d < 0.2)
    return jnp.where(force, 0.0, d)


def _apply_merge(state: SolverState, partner, n, up=None):
    """Hook roots along their selected partner (_I32MAX = no hook).

    When `up` is given (traced bool), only hooks toward larger (True) or
    smaller (False) slot indices are applied this round.  Monotone hooking
    can never form cycles — required because flow-displaced temporal edges
    are seen with different weights from their two endpoints, which breaks
    the usual only-2-cycles Boruvka guarantee.  Rounds alternate parity so
    both directions happen across rounds.
    """
    slots = jnp.arange(n, dtype=jnp.int32)
    hook = partner < _I32MAX
    if up is not None:
        hook = hook & ((partner > slots) == up)
    parent = jnp.where(hook, partner, slots)
    root = cc.pointer_jump(parent)
    csum = jax.ops.segment_sum(state.csum, root, num_segments=n)
    size = jax.ops.segment_sum(state.size, root, num_segments=n)
    constr = jax.ops.segment_max(state.constr, root, num_segments=n)
    fin = jax.ops.segment_max(state.fin.astype(jnp.int32), root,
                              num_segments=n) > 0
    frozen = jax.ops.segment_max(state.frozen.astype(jnp.int32), root,
                                 num_segments=n) > 0
    label = root[state.label]
    moved = jnp.sum(root != slots)
    return SolverState(label, csum, size, constr, fin, frozen), moved


def _select_partners(best_bucket, best_partner, label_flat, n):
    """Region-level Boruvka selection from per-pixel (bucket, partner) bests.

    Two int32 segment-mins replace one packed 64-bit key (TPU int64 is
    emulated): first the region's minimum bucket, then the minimum partner
    among pixels matching that bucket (globally consistent tie-breaking, so
    hooking produces only 2-cycles).
    """
    r_bucket = jax.ops.segment_min(best_bucket, label_flat, num_segments=n)
    at_min = (best_bucket == r_bucket[label_flat]) & (best_bucket < _I32MAX)
    key2 = jnp.where(at_min, best_partner, _I32MAX)
    return jax.ops.segment_min(key2, label_flat, num_segments=n)


def _merge_round(state: SolverState, vol, flow, theta, up,
                 p: OversegParams):
    """One Boruvka round: per-region min admissible edge, merge all."""
    t, h, w, _ = vol.shape
    n = t * h * w
    label3, mean3, size3, constr3, fin3, _ = _gather_pixel_stats(
        state, (t, h, w))
    own_constr_free = constr3 < 0
    own_fin = fin3

    best_bucket = jnp.full((t, h, w), _I32MAX, jnp.int32)
    best_partner = jnp.full((t, h, w), _I32MAX, jnp.int32)
    for d in _iter_dirs(vol, flow, label3, mean3, size3, constr3, fin3,
                        p.metric):
        differs = d.nb_label != label3
        act = d.valid & differs & (d.bucket <= theta)
        dd = _desc_distance(mean3, d.nb_mean, d.w_eff, p)
        either_free = own_constr_free | (d.nb_constr < 0)
        regular = (either_free & ~own_fin & ~d.nb_fin
                   & (dd < p.merge_threshold))
        constr_same = (~either_free & (constr3 == d.nb_constr)
                       & (dd <= p.split_threshold))
        adm = act & (regular | constr_same)
        bkt = jnp.where(adm, d.bucket, _I32MAX)
        take = adm & ((bkt < best_bucket) | ((bkt == best_bucket)
                                             & (d.nb_label < best_partner)))
        best_bucket = jnp.where(take, bkt, best_bucket)
        best_partner = jnp.where(take, d.nb_label, best_partner)

    partner = _select_partners(best_bucket.reshape(-1),
                               best_partner.reshape(-1), state.label, n)
    return _apply_merge(state, partner, n, up=up)


def _level_end(state: SolverState, vol, flow, theta, p: OversegParams):
    """Finalize failed merge tests and unconstrain split regions
    (segmentation_graph.h:399-402, 416-435), batched at level end."""
    t, h, w, _ = vol.shape
    n = t * h * w
    label3, mean3, size3, constr3, fin3, frozen3 = _gather_pixel_stats(
        state, (t, h, w))

    fail_any = jnp.zeros((t, h, w), bool)
    uncon_any = jnp.zeros((t, h, w), bool)
    for d in _iter_dirs(vol, flow, label3, mean3, size3, constr3, fin3,
                        p.metric):
        act = d.valid & (d.nb_label != label3) & (d.bucket <= theta)
        dd = _desc_distance(mean3, d.nb_mean, d.w_eff, p)
        either_free = (constr3 < 0) | (d.nb_constr < 0)
        fail = act & either_free & ~fin3 & ~d.nb_fin & (dd >= p.merge_threshold)
        fail_any = fail_any | fail
        split = (act & ~either_free & (constr3 == d.nb_constr)
                 & (dd > p.split_threshold))
        # Unconstrain own side unless the neighbor is much smaller (then the
        # neighbor unconstrains itself, seen from its own view).  Frozen
        # regions are never unconstrained (virtual-node semantics,
        # segmentation_graph.h:164-166).
        uncon = split & ~(d.nb_size < 0.3 * size3) & ~frozen3
        uncon_any = uncon_any | uncon

    fail_r = jax.ops.segment_max(fail_any.reshape(-1).astype(jnp.int32),
                                 state.label, num_segments=n) > 0
    uncon_r = jax.ops.segment_max(uncon_any.reshape(-1).astype(jnp.int32),
                                  state.label, num_segments=n) > 0
    return state._replace(
        fin=state.fin | fail_r,
        constr=jnp.where(uncon_r, -1, state.constr))


def _min_size_round(state: SolverState, vol, flow, up, p: OversegParams):
    """Small regions hook onto their minimum-weight incident edge
    (forced merges, segmentation_graph.h:407-415); different constraints
    still never merge."""
    t, h, w, _ = vol.shape
    n = t * h * w
    label3, mean3, size3, constr3, fin3, _ = _gather_pixel_stats(
        state, (t, h, w))
    own_small = size3 < p.min_region_size

    best_bucket = jnp.full((t, h, w), _I32MAX, jnp.int32)
    best_partner = jnp.full((t, h, w), _I32MAX, jnp.int32)
    for d in _iter_dirs(vol, flow, label3, mean3, size3, constr3, fin3,
                        p.metric):
        both_constr_diff = ((constr3 >= 0) & (d.nb_constr >= 0)
                            & (constr3 != d.nb_constr))
        adm = (d.valid & (d.nb_label != label3) & own_small
               & ~both_constr_diff)
        bkt = jnp.where(adm, d.bucket, _I32MAX)
        take = adm & ((bkt < best_bucket) | ((bkt == best_bucket)
                                             & (d.nb_label < best_partner)))
        best_bucket = jnp.where(take, bkt, best_bucket)
        best_partner = jnp.where(take, d.nb_label, best_partner)

    partner = _select_partners(best_bucket.reshape(-1),
                               best_partner.reshape(-1), state.label, n)
    return _apply_merge(state, partner, n, up=up)


def _merge_constrained(state: SolverState, num_constraints: int, n: int,
                       p: OversegParams):
    """Final constraint association (MergeConstrainedRegions,
    segmentation_graph.h:703-786): every constrained region is tested against
    its constraint group's representative — frozen (virtual-role) regions
    always merge; real regions merge when descriptor distance <= split
    threshold, otherwise they are unconstrained.  Hooks form a star onto the
    representative, so no cycles are possible."""
    slots = jnp.arange(n, dtype=jnp.int32)
    is_root = state.label[slots] == slots
    cid = jnp.where(is_root & (state.constr >= 0), state.constr,
                    num_constraints)
    # Representative: the frozen root of the group when one exists, else the
    # minimum root slot.
    frozen_slot = jnp.where(state.frozen, slots, _I32MAX)
    rep_frozen = jax.ops.segment_min(frozen_slot, cid,
                                     num_segments=num_constraints + 1)
    rep_any = jax.ops.segment_min(slots, cid,
                                  num_segments=num_constraints + 1)
    rep = jnp.where(rep_frozen < _I32MAX, rep_frozen, rep_any)

    target = rep[jnp.clip(state.constr, 0, num_constraints - 1)]
    active = (cid < num_constraints) & (target != slots)
    mean = state.csum / jnp.maximum(state.size, 1.0)[:, None]
    d = _dist(mean, mean[target], p.metric)
    merge = active & (state.frozen | (d <= p.split_threshold))
    uncon = active & ~merge & ~state.frozen

    state = state._replace(constr=jnp.where(uncon, -1, state.constr))
    partner = jnp.where(merge, target, _I32MAX)
    state, _ = _apply_merge(state, partner, n)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("params", "has_flow", "has_constraints"))
def _solve(vol, flow, init_label, constr_init, frozen_init,
           params: OversegParams, has_flow: bool, has_constraints: bool):
    t, h, w, _ = vol.shape
    n = t * h * w
    fl = flow if has_flow else None

    ones = jnp.ones(n, jnp.float32)
    csum = jax.ops.segment_sum(vol.reshape(n, 3), init_label, num_segments=n)
    size = jax.ops.segment_sum(ones, init_label, num_segments=n)
    constr = jax.ops.segment_max(constr_init, init_label, num_segments=n)
    frozen = jax.ops.segment_max(frozen_init.astype(jnp.int32), init_label,
                                 num_segments=n) > 0
    state = SolverState(init_label, csum, size, constr,
                        jnp.zeros(n, bool), frozen)

    def run_rounds(state, theta, max_rounds, round_fn):
        # Hook parity alternates per round; stop after two consecutive
        # merge-free rounds (both directions exhausted).
        def cond(carry):
            st, i, idle = carry
            return (idle < 2) & (i < max_rounds)

        def body(carry):
            st, i, idle = carry
            st, moved = round_fn(st, theta, (i % 2) == 0)
            return st, i + 1, jnp.where(moved > 0, 0, idle + 1)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), jnp.int32(0)))
        return state

    # Levels run inside a fori_loop with theta as a traced lookup so the
    # (large) stencil bodies are compiled exactly once, not once per level.
    n_levels = len(params.schedule)
    thetas = jnp.asarray(params.schedule, jnp.int32)
    level_rounds = jnp.asarray(
        [params.max_rounds_per_level] * (n_levels - 1)
        + [params.max_final_rounds], jnp.int32)

    merge_fn = lambda st, th, up: _merge_round(st, vol, fl, th, up, params)

    def level_body(l, state):
        state = run_rounds(state, thetas[l], level_rounds[l], merge_fn)
        return _level_end(state, vol, fl, thetas[l], params)

    state = jax.lax.fori_loop(0, n_levels, level_body, state)

    if params.min_region_size > 1:
        min_fn = lambda st, th, up: _min_size_round(st, vol, fl, up, params)
        state = run_rounds(state, jnp.int32(0),
                           jnp.int32(params.min_size_rounds), min_fn)

    if has_constraints:
        state = _merge_constrained(state, params.max_constraints, n, params)

    return OversegResult(label=state.label.reshape(t, h, w),
                         constr=state.constr, size=state.size)


def oversegment(vol, flow=None, constraints=None, init_label=None,
                frozen=None,
                params: OversegParams = OversegParams()) -> OversegResult:
    """Over-segment a chunk volume.

    Args:
      vol: (T,H,W,3) float32 smoothed BGR in [0,1].
      flow: optional (T-1,H,W,2) backward flow for frames 1..T-1.
      constraints: optional (T,H,W) int32 compact constraint ids (-1 free);
        callers map previous-chunk region ids to [0,C).
      init_label: optional (T,H,W) int32 initial labels (pre-merged
        constrained regions point at a canonical member voxel).
      frozen: optional (T,H,W) bool — voxels of already-emitted geometry
        (the reference's virtual nodes); their regions keep constraints and
        always merge with their constraint group.
      params: solver parameters.

    Returns OversegResult; `label` holds arbitrary root-voxel ids (compact
    them on the host), `constr[root]` the surviving compact constraint id.
    """
    t, h, w, _ = vol.shape
    n = t * h * w
    if init_label is None:
        init_label = jnp.arange(n, dtype=jnp.int32)
    else:
        init_label = init_label.reshape(n).astype(jnp.int32)
    if constraints is None:
        constr_init = jnp.full(n, -1, jnp.int32)
        has_constraints = False
    else:
        constr_init = constraints.reshape(n).astype(jnp.int32)
        has_constraints = True
    if frozen is None:
        frozen_init = jnp.zeros(n, bool)
    else:
        frozen_init = frozen.reshape(n).astype(bool)
    has_flow = flow is not None
    if flow is None:
        flow = jnp.zeros((max(t - 1, 0), h, w, 2), jnp.float32)
    return _solve(vol, flow, init_label, constr_init, frozen_init, params,
                  has_flow, has_constraints)
