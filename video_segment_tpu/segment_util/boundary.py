"""Region boundary extraction and vectorization (host).

Equivalent of the reference's boundary computation
(segmentation/boundary.{h,cpp}: Freeman chain-code tracing + approxPolyDP
simplification with max_error 1.0, boundary.cpp:513-570, invoked from
segmentation.cpp:527-532) and of segment_util/segmentation_boundary.{h,cpp}
(per-region N4 boundary pixels).

Implementation: per-region contour tracing with cv2 on bounding-box crops
(outer contours + holes via RETR_CCOMP), simplified with cv2.approxPolyDP
and merged into a shared frame-level vertex pool (VectorMesh).  Unlike the
reference, shared boundary segments are traced per region rather than once
jointly; vertices common to both sides still coincide because simplification
error is bounded by 1 px.
"""

from __future__ import annotations

import cv2
import numpy as np

from video_segment_tpu import proto

MAX_POLY_ERROR = 1.0  # boundary.cpp approxPolyDP max_error
MIN_SEGMENT_LEN = 4


def region_boundary(label_img: np.ndarray, region_id: int) -> np.ndarray:
    """Inner N4 boundary pixel coordinates (y,x) of one region
    (GetBoundary, segmentation_boundary.h:69-81)."""
    mask = label_img == region_id
    er = np.zeros_like(mask)
    er[1:-1, 1:-1] = (mask[1:-1, 1:-1] & mask[:-2, 1:-1] & mask[2:, 1:-1]
                      & mask[1:-1, :-2] & mask[1:-1, 2:])
    yx = np.nonzero(mask & ~er)
    return np.stack(yx, axis=1)


def _region_bbox(mask_ys, mask_lxs, mask_rxs):
    return (int(mask_ys.min()), int(mask_lxs.min()),
            int(mask_ys.max()), int(mask_rxs.max()))


def compute_vectorization(label_img: np.ndarray, region_ids, interval_counts,
                          ys, lxs, rxs):
    """Vectorize all regions of one frame.

    Returns (mesh_coords float32 (M,2), {region_id: [(idx_array, hole)]}).
    Vertex indices reference x coordinates in the flattened mesh (the proto
    convention: coord_idx[N] -> coord[idx] = x, coord[idx+1] = y).
    """
    vertex_pool: dict[tuple[int, int], int] = {}
    coords: list[float] = []
    polys: dict[int, list[tuple[np.ndarray, bool]]] = {}

    def vid(pt) -> int:
        key = (int(pt[0]), int(pt[1]))
        idx = vertex_pool.get(key)
        if idx is None:
            idx = len(coords)
            vertex_pool[key] = idx
            coords.extend((float(key[0]), float(key[1])))
        return idx

    pos = 0
    for i, rid in enumerate(region_ids):
        cnt = int(interval_counts[i])
        if cnt == 0:
            polys[int(rid)] = []
            pos += cnt
            continue
        sy = ys[pos:pos + cnt]
        sl = lxs[pos:pos + cnt]
        sr = rxs[pos:pos + cnt]
        pos += cnt
        y0, x0, y1, x1 = _region_bbox(sy, sl, sr)
        crop = label_img[y0:y1 + 1, x0:x1 + 1]
        mask = (crop == rid).astype(np.uint8)
        contours, hier = cv2.findContours(mask, cv2.RETR_CCOMP,
                                          cv2.CHAIN_APPROX_NONE)
        plist = []
        if hier is not None:
            for c, hrow in zip(contours, hier[0]):
                if len(c) < MIN_SEGMENT_LEN:
                    continue
                simp = cv2.approxPolyDP(c, MAX_POLY_ERROR, closed=True)
                pts = simp.reshape(-1, 2) + np.array([x0, y0])
                if len(pts) < 3:
                    continue
                is_hole = hrow[3] >= 0
                plist.append(
                    (np.array([vid(p) for p in pts], np.int64), is_hole))
        polys[int(rid)] = plist
    mesh = np.asarray(coords, np.float32)
    return mesh, polys


def vectorization_to_proto(desc, mesh: np.ndarray, polys: dict,
                           remove_rasterization: bool = False):
    """Attach a frame vectorization to a parsed SegmentationDesc in place."""
    desc.vector_mesh.coord.extend(mesh.tolist())
    for r in desc.region:
        plist = polys.get(r.id, [])
        for idx, hole in plist:
            poly = r.vectorization.polygon.add()
            poly.coord_idx.extend((idx * 1).tolist())
            if hole:
                poly.hole = True
        if remove_rasterization:
            r.ClearField("raster")
    if remove_rasterization:
        desc.rasterization_removed = True


def scale_vectorization(desc, scale_x: float, scale_y: float):
    """Scale a frame's vector mesh (ScaleVectorization,
    segmentation_util.cpp:1248) — used when the video was downscaled for
    segmentation but output is emitted at original resolution."""
    coords = np.asarray(desc.vector_mesh.coord, np.float32)
    coords[0::2] *= scale_x
    coords[1::2] *= scale_y
    del desc.vector_mesh.coord[:]
    desc.vector_mesh.coord.extend(coords.tolist())
