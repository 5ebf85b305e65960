"""Spatial-connectedness enforcement via tube analysis (host).

Equivalent of the reference's EnforceSpatialConnectedness
(dense_segmentation_graph.h:666-904 + tube helpers in
dense_segmentation_graph.cpp:35-212): a spatio-temporal region may be
3D-connected only through other frames, leaving 2D islands within a frame.
Per region, per-frame connected components are linked into tubes by
centroid/area tracking; the largest tube keeps the region's label and every
other tube becomes a new region.

Matching thresholds follow the reference: consecutive components join a tube
when the centroid distance is below 4% of the frame diagonal and the area
ratio exceeds 0.75 (dense_segmentation_graph.h:735-742); temporally abutting
tubes of the same region with matching geometry are merged before
relabeling.  When backward flow is available, the current component's
centroid is advected into the previous frame before the distance test
(dense_segmentation_graph.h:735-742 advects along flow).

The per-frame multi-label connected components run in native C++
(video_segment_tpu.native.multi_label_cc).
"""

from __future__ import annotations

import numpy as np

from video_segment_tpu import native


def _frame_components(frame_labels: np.ndarray):
    """-> (comp_img, per-component (region, area, cx, cy) arrays)."""
    comp, n = native.multi_label_cc(frame_labels.astype(np.int32))
    flat = comp.ravel()
    area = np.bincount(flat, minlength=n).astype(np.float64)
    h, w = frame_labels.shape
    ys = np.repeat(np.arange(h), w).astype(np.float64)
    xs = np.tile(np.arange(w), h).astype(np.float64)
    cy = np.bincount(flat, weights=ys, minlength=n) / np.maximum(area, 1)
    cx = np.bincount(flat, weights=xs, minlength=n) / np.maximum(area, 1)
    region = np.full(n, -1, np.int64)
    region[flat] = frame_labels.ravel()
    return comp, region, area, cx, cy


def enforce_spatial_connectedness(labels: np.ndarray, num_regions: int,
                                  min_avg_tube_area: float = 20.0,
                                  flow: np.ndarray | None = None):
    """Split per-frame islands of each region into per-tube regions.

    Args:
      labels: (T,H,W) compact region indices in [0, num_regions).
      flow: optional (T-1,H,W,2) backward flow; frame f's centroids are
        advected by flow[f-1] before matching against frame f-1 tubes.
    Returns (new_labels, total_regions, origin): origin[r] gives, for every
    region index in the result (old and new), the original region it came
    from — new tube regions inherit descriptors/constraints decisions from
    the caller accordingly (constraints are dropped for split-off tubes,
    matching the reference's relabel-as-new-regions behavior).
    """
    t, h, w = labels.shape
    diag_thresh = 0.04 * np.hypot(h, w)

    comps = []
    tables = []
    for f in range(t):
        comp, region, area, cx, cy = _frame_components(labels[f])
        comps.append(comp)
        tables.append((region, area, cx, cy))

    # Per region, link components frame-to-frame into tubes.
    # tube id assignment per (frame, comp): -1 = unassigned.
    tube_of = [np.full(len(tables[f][0]), -1, np.int64) for f in range(t)]
    tubes = []  # per tube: dict(region, frames=[(f, comp_idx, area)], area)

    # Open tubes from the previous frame, grouped per region:
    # {region: [(tube_id, cx, cy, area), ...]} — regions have only a handful
    # of per-frame components, so matching stays linear.
    open_prev: dict = {}
    for f in range(t):
        region, area, cx, cy = tables[f]
        fl = flow[f - 1] if (flow is not None and f > 0) else None
        open_now: dict = {}
        for ci in range(len(region)):
            r = int(region[ci])
            if r < 0:
                continue
            # Advect the centroid into the previous frame along backward
            # flow before matching (raw centroid when flow is absent).
            mx, my = cx[ci], cy[ci]
            if fl is not None:
                iy = min(max(int(round(my)), 0), h - 1)
                ix = min(max(int(round(mx)), 0), w - 1)
                mx = mx + float(fl[iy, ix, 0])
                my = my + float(fl[iy, ix, 1])
            best = None
            best_d = diag_thresh
            for tid, px, py, pa in open_prev.get(r, ()):
                d = np.hypot(mx - px, my - py)
                ratio = min(area[ci], pa) / max(area[ci], pa, 1.0)
                if d < best_d and ratio > 0.75:
                    best = tid
                    best_d = d
            if best is None:
                best = len(tubes)
                tubes.append({"region": r, "area": 0.0, "count": 0})
            tube_of[f][ci] = best
            tubes[best]["area"] += float(area[ci])
            tubes[best]["count"] += 1
            open_now.setdefault(r, []).append(
                (best, float(cx[ci]), float(cy[ci]), float(area[ci])))
        open_prev = open_now

    # Pick the largest tube per region; everything else becomes new regions
    # (tiny tubes are folded into the region's main tube to avoid noise,
    # mirroring the reference's small-tube merging).
    main_tube = {}
    for tid, tube in enumerate(tubes):
        r = tube["region"]
        if r not in main_tube or tube["area"] > tubes[main_tube[r]]["area"]:
            main_tube[r] = tid

    origin = list(range(num_regions))
    new_id_of_tube = {}
    for tid, tube in enumerate(tubes):
        r = tube["region"]
        if tid == main_tube[r]:
            new_id_of_tube[tid] = r
        elif tube["area"] / max(tube["count"], 1) < min_avg_tube_area:
            new_id_of_tube[tid] = r  # keep tiny islands with their region
        else:
            new_id_of_tube[tid] = len(origin)
            origin.append(r)

    if len(origin) == num_regions:
        return labels, num_regions, np.asarray(origin, np.int64)

    out = labels.copy()
    for f in range(t):
        mapping = np.asarray(
            [new_id_of_tube.get(tid, 0) if tid >= 0 else 0
             for tid in tube_of[f]], np.int64)
        remapped = mapping[comps[f]]
        keep = remapped != labels[f]
        if keep.any():
            out[f] = np.where(keep, remapped, out[f])
    return out, len(origin), np.asarray(origin, np.int64)
