"""Batched hierarchical region agglomeration (device).

Replaces the reference's sequential lowest-edge-first agglomeration with
budgeted parallel merge rounds (RegionAgglomerationGraph::SegmentGraph,
region_segmentation_graph.cpp:73-177):

- Edge weights: SquaredOR(appearance chi^2, flow chi^2) scaled by the region
  size penalizer, re-evaluated once per hierarchy level (the reference
  re-evaluates after every single merge; level-granular re-evaluation is the
  batched approximation).
- Each sub-round, every region proposes its minimum-weight incident edge;
  the globally smallest `budget` proposals merge simultaneously
  (direction-parity hooking, pointer jumping), so the merges per level match
  the reference's level cutoff (level size * (1 - cutoff),
  segmentation.cpp:305-389; level 0 cut to max_region_num).
- Region statistics (histograms, per-frame flow histograms/counts, sizes)
  merge with segment-sums.

One device program runs a whole level (target computation, median region
size for the penalizer, distance evaluation, a fixed number of sub-rounds),
so the host syncs once per hierarchy level.

Returns per-level root assignments over the original region index space;
callers compose them into parent/child hierarchies and remapped rasters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from video_segment_tpu.ops import cc, histograms as hops

_I32MAX = jnp.iinfo(jnp.int32).max
_DQ = 1 << 20  # distance quantization for integer keys


class AggloState(NamedTuple):
    label: jnp.ndarray      # (R,) region -> current root
    hist: jnp.ndarray       # (R,B) color histograms (unnormalized)
    flow_hist: jnp.ndarray  # (T,R,FB)
    flow_cnt: jnp.ndarray   # (T,R)
    sizes: jnp.ndarray      # (R,) f32
    win_hist: jnp.ndarray   # (NW,R,B) windowed appearance (NW=0: unused)
    win_cnt: jnp.ndarray    # (NW,R)


def _eval_distances(state: AggloState, edges, evalid, inv_median, use_flow,
                    penalizer):
    ra = state.label[edges[:, 0]]
    rb = state.label[edges[:, 1]]
    pairs = jnp.stack([ra, rb], axis=1)
    if state.win_hist.shape[0] > 0:
        # WindowedAppearanceDescriptor replaces the single-histogram
        # appearance distance (region_descriptor.cpp:207-276).
        color_d = hops.edge_color_distance_windowed(state.win_hist,
                                                    state.win_cnt, pairs)
    else:
        color_d = hops.edge_color_distance(state.hist, pairs)
    if state.flow_hist.shape[0] > 0:
        flow_d = hops.edge_flow_distance(state.flow_hist, state.flow_cnt,
                                         pairs)
    else:
        flow_d = jnp.zeros_like(color_d)
    # use_flow as a multiplier: disabled flow contributes distance 0.
    d = hops.combined_distance(color_d, flow_d * use_flow, state.sizes[ra],
                               state.sizes[rb], inv_median,
                               penalizer=penalizer, use_flow=True)
    return jnp.where(evalid & (ra != rb), d, jnp.inf)


def _label_subround(label, edges, d, budget, up):
    """One label-only merge subround.  Region statistics are NOT touched —
    distances are frozen for the level (the once-per-level re-evaluation
    approximation), so tables only need re-aggregating at level end."""
    r = label.shape[0]
    ra = label[edges[:, 0]]
    rb = label[edges[:, 1]]
    act = jnp.isfinite(d) & (ra != rb)
    key = jnp.where(act, jnp.clip((d * _DQ).astype(jnp.int32), 0, _DQ),
                    _I32MAX)

    # Per-region minimum proposal (both endpoints see the edge).
    seg = jnp.concatenate([ra, rb])
    k2 = jnp.concatenate([key, key])
    partner2 = jnp.concatenate([rb, ra])
    best = jax.ops.segment_min(k2, seg, num_segments=r)
    at_min = (k2 == best[seg]) & (k2 < _I32MAX)
    p2 = jnp.where(at_min, partner2, _I32MAX)
    partner = jax.ops.segment_min(p2, seg, num_segments=r)

    # Keep only the globally smallest `budget` proposals.
    order = jnp.sort(jnp.where(partner < _I32MAX, best, _I32MAX))
    kth = order[jnp.clip(budget - 1, 0, r - 1)]
    admit = ((partner < _I32MAX) & (best <= kth) & (best < _I32MAX)
             & (budget > 0))

    slots = jnp.arange(r, dtype=jnp.int32)
    hook = admit & ((partner > slots) == up)
    parent = jnp.where(hook, partner, slots)
    root = cc.pointer_jump(parent)
    moved = jnp.sum(root != slots)
    return root[label], moved


def _reaggregate(state: AggloState) -> AggloState:
    """Re-aggregate every statistics table onto current roots (one pass per
    level; slot s's live stats move to label[s])."""
    r = state.label.shape[0]
    seg = state.label
    hist = jax.ops.segment_sum(state.hist, seg, num_segments=r)
    fh = jax.vmap(lambda x: jax.ops.segment_sum(x, seg, num_segments=r),
                  in_axes=0, out_axes=0)(state.flow_hist)
    fc = jax.vmap(lambda x: jax.ops.segment_sum(x, seg, num_segments=r),
                  in_axes=0, out_axes=0)(state.flow_cnt)
    sizes = jax.ops.segment_sum(state.sizes, seg, num_segments=r)
    wh = jax.vmap(lambda x: jax.ops.segment_sum(x, seg, num_segments=r),
                  in_axes=0, out_axes=0)(state.win_hist)
    wc2 = jax.vmap(lambda x: jax.ops.segment_sum(x, seg, num_segments=r),
                   in_axes=0, out_axes=0)(state.win_cnt)
    return AggloState(state.label, hist, fh, fc, sizes, wh, wc2)


def _force_constraints(state: AggloState, constr):
    """Force-merge regions whose base members share a counterpart
    constraint (the reference's skeleton virtual edges,
    region_segmentation_graph.cpp:52-71: same-constraint regions always end
    the level merged).  `constr` is per BASE region, -1 = unconstrained.

    Hooks every constrained root onto the minimum root carrying its
    constraint — strictly downward, hence acyclic.  One pass is not always
    enough: a root whose members carry two different constraint ids hooks
    only toward the smaller rep, leaving the other constraint's group split
    (the reference's skeleton virtual edges transitively union all
    same-constraint regions, region_segmentation_graph.cpp:52-71) — so the
    pass iterates to a fixed point; each pass stays strictly downward and
    the minimum root per constraint only decreases, so it converges."""
    r = state.label.shape[0]
    slots = jnp.arange(r, dtype=jnp.int32)
    has_c = constr >= 0
    cid = jnp.clip(constr, 0, r - 1)

    def one_pass(root):
        rep = jax.ops.segment_min(jnp.where(has_c, root, _I32MAX), cid,
                                  num_segments=r)
        tgt = jnp.where(has_c, rep[cid], _I32MAX)
        partner = jax.ops.segment_min(
            jnp.where(has_c & (tgt != root), tgt, _I32MAX), root,
            num_segments=r)
        hook = (partner < _I32MAX) & (partner < slots)
        parent = jnp.where(hook, partner, slots)
        root2 = cc.pointer_jump(parent)[root]
        return root2, jnp.any(root2 != root)

    def cond(carry):
        _, changed, i = carry
        return changed & (i < 32)

    def body(carry):
        root, _, i = carry
        root2, changed = one_pass(root)
        return root2, changed, i + 1

    root, _, _ = jax.lax.while_loop(
        cond, body, (state.label, jnp.bool_(True), jnp.int32(0)))
    return state._replace(label=root)


def _level_step(state: AggloState, edges, evalid, constr, is_level0,
               max_region_num, min_region_num, cutoff_fraction, use_flow,
               penalizer, max_subrounds: int):
    r = state.label.shape[0]
    slots = jnp.arange(r, dtype=jnp.int32)
    active_mask = (state.label == slots) & (state.sizes > 0)
    active = jnp.sum(active_mask.astype(jnp.int32))

    cut_target = jnp.where(
        is_level0 & (active > max_region_num), max_region_num,
        jnp.maximum(min_region_num,
                    (active.astype(jnp.float32)
                     * cutoff_fraction).astype(jnp.int32)))
    # Anticipated forced constraint merges come out of the budget
    # (segmentation.cpp:316-330: target merges minus constraint merges).
    has_c = constr >= 0
    cid = jnp.clip(constr, 0, r - 1)
    root_c = jnp.where(has_c, state.label, 0)
    n_croots = jnp.sum(jax.ops.segment_max(
        has_c.astype(jnp.int32), root_c, num_segments=r))
    n_cids = jnp.sum(jax.ops.segment_max(
        has_c.astype(jnp.int32), cid, num_segments=r))
    anticipated = jnp.maximum(n_croots - n_cids, 0)
    budget_total = jnp.maximum(active - cut_target - anticipated, 0)

    sz_sorted = jnp.sort(jnp.where(active_mask, state.sizes, jnp.inf))
    median = sz_sorted[jnp.clip(active // 2, 0, r - 1)]
    inv_median = 1.0 / jnp.maximum(median, 1.0)

    d = _eval_distances(state, edges, evalid, inv_median, use_flow,
                        penalizer)

    def body(i, carry):
        label, merged, dd = carry
        label, moved = _label_subround(label, edges, dd,
                                       budget_total - merged, (i % 2) == 0)
        ra = label[edges[:, 0]]
        rb = label[edges[:, 1]]
        dd = jnp.where(ra != rb, dd, jnp.inf)
        return label, merged + moved, dd

    label, merged, _ = jax.lax.fori_loop(
        0, max_subrounds, body, (state.label, jnp.int32(0), d))
    state = _force_constraints(state._replace(label=label), constr)
    state = _reaggregate(state)
    active_after = jnp.sum(((state.label == slots)
                            & (state.sizes > 0)).astype(jnp.int32))
    return state, active_after


@functools.partial(jax.jit, static_argnames=("max_subrounds", "max_levels"))
def _run_all_levels(state: AggloState, edges, evalid, constr_stack,
                    max_region_num, min_region_num, cutoff_fraction,
                    use_flow, penalizer, max_subrounds: int,
                    max_levels: int):
    """Every hierarchy level in ONE device program (the per-level host
    round-trips dominated the region stage on the remote backend).  Levels
    past convergence degenerate to no-ops (budget clamps to zero once
    active <= min_region_num); the host trims them from the result."""
    r = state.label.shape[0]

    slots0 = jnp.arange(r, dtype=jnp.int32)
    active0 = jnp.sum(((state.label == slots0)
                       & (state.sizes > 0)).astype(jnp.int32))

    def cond(carry):
        st, labels_out, actives, l, active = carry
        return (l < max_levels) & (active > min_region_num)

    def body(carry):
        st, labels_out, actives, l, _ = carry
        st, active_after = _level_step(
            st, edges, evalid, constr_stack[l], l == 0, max_region_num,
            min_region_num, cutoff_fraction, use_flow, penalizer,
            max_subrounds)
        labels_out = jax.lax.dynamic_update_slice(
            labels_out, st.label[None], (l, 0))
        actives = actives.at[l].set(active_after)
        return st, labels_out, actives, l + 1, active_after

    init = (state, jnp.zeros((max_levels, r), jnp.int32),
            jnp.zeros(max_levels, jnp.int32), jnp.int32(0), active0)
    _, labels_out, actives, _, _ = jax.lax.while_loop(cond, body, init)
    return labels_out, actives


def agglomerate(hist, flow_hist, flow_cnt, sizes, edges, num_regions: int,
                *, min_region_num: int = 10, max_region_num: int = 10000,
                cutoff_fraction: float = 0.8, penalizer: float = 0.25,
                use_flow: bool = True, max_subrounds: int = 6,
                constraints=None, win_hist=None, win_cnt=None):
    """Run the full level loop; returns list of per-level (R,) root arrays.

    Regions with index >= num_regions must be padding (zero stats); their
    labels stay self and they never merge (no edges reference them).

    `constraints`: optional list of per-level (R,) int32 arrays of compact
    counterpart constraint ids over BASE regions (-1 free).  At level l all
    regions carrying the same constraints[l] id are force-merged, keeping
    hierarchy composition continuous across chunk-set seams
    (region_segmentation.cpp:143-197).
    """
    r = hist.shape[0]
    if win_hist is None:
        win_hist = np.zeros((0, r, hist.shape[1]), np.float32)
        win_cnt = np.zeros((0, r), np.float32)
    state = AggloState(jnp.arange(r, dtype=jnp.int32), jnp.asarray(hist),
                       jnp.asarray(flow_hist), jnp.asarray(flow_cnt),
                       jnp.asarray(sizes, jnp.float32),
                       jnp.asarray(win_hist), jnp.asarray(win_cnt))
    edges = jnp.asarray(edges, jnp.int32)
    evalid = jnp.ones(edges.shape[0], bool) if edges.size else \
        jnp.zeros(0, bool)
    use_flow_f = jnp.float32(1.0 if use_flow else 0.0)

    max_levels = 40  # hierarchies top out around 25-35 levels
    constr_stack = np.full((max_levels, r), -1, np.int32)
    if constraints is not None:
        for l in range(min(len(constraints), max_levels)):
            constr_stack[l] = constraints[l]

    labels_out, actives = _run_all_levels(
        state, edges, evalid, jnp.asarray(constr_stack),
        jnp.int32(max_region_num), jnp.int32(min_region_num),
        jnp.float32(cutoff_fraction), use_flow_f, jnp.float32(penalizer),
        max_subrounds, max_levels)
    labels_out = np.asarray(labels_out)
    actives = np.asarray(actives)

    import os
    levels = []
    active = num_regions
    for l in range(max_levels):
        if active <= min_region_num:
            break
        new_active = int(actives[l])
        if new_active == 0:
            break  # device loop terminated before this level
        if new_active >= active:
            break  # no progress (disconnected remainder)
        if os.environ.get("VST_VERBOSE"):
            import sys
            print(f"[stats] agglomeration level {l}: {active} -> "
                  f"{new_active} regions", file=sys.stderr)
        active = new_active
        levels.append(labels_out[l].copy())
    return levels
