"""Batched hierarchical region agglomeration (device).

Replaces the reference's sequential lowest-edge-first agglomeration with
budgeted parallel merge rounds (RegionAgglomerationGraph::SegmentGraph,
region_segmentation_graph.cpp:73-177):

- Edge weights: SquaredOR(appearance chi^2, flow chi^2) scaled by the region
  size penalizer, re-evaluated once per hierarchy level (the reference
  re-evaluates after every single merge; level-granular re-evaluation is the
  batched approximation).
- Each sub-round, every region proposes its minimum-weight incident edge;
  the globally smallest `budget` proposals are merged simultaneously
  (direction-parity hooking, pointer jumping), so the number of merges per
  level matches the reference's level cutoff (level size * (1 - cutoff),
  segmentation.cpp:305-389; level 0 cut to max_region_num).
- Region statistics (histograms, per-frame flow histograms/counts, sizes)
  are merged with segment-sums.

Returns per-level root assignments over the original region index space;
callers compose them into parent/child hierarchies and remapped rasters.
"""

from __future__ import annotations

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


@jax.jit
def _eval_distances(state: AggloState, edges, evalid, inv_median, use_flow,
                    penalizer):
    ra = state.label[edges[:, 0]]
    rb = state.label[edges[:, 1]]
    pairs = jnp.stack([ra, rb], axis=1)
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


@jax.jit
def _merge_subround(state: AggloState, edges, d, budget, up):
    r = state.label.shape[0]
    ra = state.label[edges[:, 0]]
    rb = state.label[edges[:, 1]]
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
    admit = (partner < _I32MAX) & (best <= kth) & (best < _I32MAX)

    slots = jnp.arange(r, dtype=jnp.int32)
    hook = admit & ((partner > slots) == up)
    parent = jnp.where(hook, partner, slots)
    root = cc.pointer_jump(parent)

    hist = jax.ops.segment_sum(state.hist, root, num_segments=r)
    fh = jax.vmap(lambda x: jax.ops.segment_sum(x, root, num_segments=r),
                  in_axes=0, out_axes=0)(state.flow_hist)
    fc = jax.vmap(lambda x: jax.ops.segment_sum(x, root, num_segments=r),
                  in_axes=0, out_axes=0)(state.flow_cnt)
    sizes = jax.ops.segment_sum(state.sizes, root, num_segments=r)
    label = root[state.label]
    moved = jnp.sum(root != slots)
    return AggloState(label, hist, fh, fc, sizes), moved


def agglomerate(hist, flow_hist, flow_cnt, sizes, edges, num_regions: int,
                *, min_region_num: int = 10, max_region_num: int = 10000,
                cutoff_fraction: float = 0.8, penalizer: float = 0.25,
                use_flow: bool = True, max_subrounds: int = 8):
    """Run the full level loop; returns list of per-level (R,) root arrays.

    Regions with index >= num_regions must be padding (zero stats); their
    labels stay self and they never merge (no edges reference them).
    """
    r = hist.shape[0]
    state = AggloState(jnp.arange(r, dtype=jnp.int32), jnp.asarray(hist),
                       jnp.asarray(flow_hist), jnp.asarray(flow_cnt),
                       jnp.asarray(sizes, jnp.float32))
    edges = jnp.asarray(edges, jnp.int32)
    evalid = jnp.ones(edges.shape[0], bool) if edges.size else \
        jnp.zeros(0, bool)
    use_flow_f = jnp.float32(1.0 if use_flow else 0.0)

    levels = []
    active = num_regions
    level = 0
    while active > min_region_num:
        if level == 0 and active > max_region_num:
            target = max_region_num
        else:
            target = max(min_region_num, int(active * cutoff_fraction))
        budget_total = active - target
        if budget_total <= 0:
            break

        sizes_np = np.asarray(state.sizes)
        lab_np = np.asarray(state.label)
        root_mask = lab_np == np.arange(r)
        act_sizes = sizes_np[root_mask & (sizes_np > 0)]
        median = np.median(act_sizes) if len(act_sizes) else 1.0
        inv_median = np.float32(1.0 / max(median, 1.0))

        d = _eval_distances(state, edges, evalid, inv_median, use_flow_f,
                            jnp.float32(penalizer))

        merged = 0
        for sub in range(max_subrounds):
            budget = budget_total - merged
            if budget <= 0:
                break
            state, moved = _merge_subround(state, edges, d,
                                           jnp.int32(budget),
                                           jnp.bool_(sub % 2 == 0))
            moved = int(moved)
            if moved == 0:
                break
            merged += moved
            # Internal edges collapse (ra==rb) and drop out; distances for
            # merged survivors stay cached until the next level's re-eval.
            ra = state.label[edges[:, 0]]
            rb = state.label[edges[:, 1]]
            d = jnp.where(ra != rb, d, jnp.inf)

        if merged == 0:
            break  # disconnected remainder
        active -= merged
        levels.append(np.asarray(state.label).copy())
        level += 1
    return levels
