"""Checkpoint / resume for the streaming drivers.

The reference has no mid-run checkpointing, but its chunk-incremental
design makes resume-at-chunk-boundary natural (SURVEY §5): the carried
state is small and explicit.  This module serializes it:

- DenseSegmentation: id counters, chunk bookkeeping, the previous-overlap
  global-id label planes, and the (smoothed) frame/flow buffers.
- RegionSegmentation: buffered chunk records (frames + cached descriptor
  tables), per-level previous-set assignments, window anchors, counters.

Everything is host-resident NumPy / dataclasses, so one pickle stream
suffices; device arrays in the dense buffer are converted to NumPy on
save and re-uploaded lazily on restore.  A `meta` block records frame
geometry and the number of frames already consumed so the caller can
re-seek its video source.
"""

from __future__ import annotations

import pickle

import numpy as np


_MAGIC = "vst-checkpoint-v1"


def _dense_state(ds) -> dict:
    import jax.numpy as jnp  # noqa: F401  (ensures arrays materialize)

    ds.join()  # settle any deferred tail (async_tail) before snapshotting
    return {
        "buffer": [np.asarray(b) for b in ds._buffer],
        "flow_buffer": [None if f is None else np.asarray(f)
                        for f in ds._flow_buffer],
        "has_flow": ds._has_flow,
        "chunk_start": ds._chunk_start,
        "chunk_id": ds._chunk_id,
        "max_region_id": ds._max_region_id,
        "num_output_frames": ds._num_output_frames,
        "overlap_gids": [np.asarray(g) for g in ds._overlap_gids],
    }


def _restore_dense(ds, st) -> None:
    import jax.numpy as jnp

    ds._buffer = [jnp.asarray(b) for b in st["buffer"]]
    ds._flow_buffer = list(st["flow_buffer"])
    ds._has_flow = st["has_flow"]
    ds._chunk_start = st["chunk_start"]
    ds._chunk_id = st["chunk_id"]
    ds._max_region_id = st["max_region_id"]
    ds._num_output_frames = st["num_output_frames"]
    ds._overlap_gids = list(st["overlap_gids"])


def _region_state(rs) -> dict:
    return {
        "features": rs._features,
        "frame_means": rs._frame_means,
        "chunks": rs._chunks,
        "open_frames": rs._open_frames,
        "set_id": rs._set_id,
        "has_flow": rs._has_flow,
        "window_anchor": rs._window_anchor,
        "prev_assign": rs._prev_assign,
    }


def _restore_region(rs, st) -> None:
    rs._features = st["features"]
    rs._frame_means = st["frame_means"]
    rs._chunks = st["chunks"]
    rs._open_frames = st["open_frames"]
    rs._set_id = st["set_id"]
    rs._has_flow = st["has_flow"]
    rs._window_anchor = st["window_anchor"]
    rs._prev_assign = st["prev_assign"]


def save(path: str, dense, region=None, frames_consumed: int = 0,
         extra: dict | None = None) -> None:
    """Write a checkpoint.  `frames_consumed` = frames already fed to the
    pipeline (the caller seeks its source there on resume)."""
    state = {
        "magic": _MAGIC,
        "frames_consumed": frames_consumed,
        "frame_width": dense.frame_width,
        "frame_height": dense.frame_height,
        "dense": _dense_state(dense),
        "region": None if region is None else _region_state(region),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_extra(path: str) -> dict:
    """Read only the caller-supplied `extra` block of a checkpoint (e.g.
    output-writer position for append-on-resume)."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    if state.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a video_segment_tpu checkpoint")
    return state.get("extra", {})


def restore(path: str, dense, region=None) -> int:
    """Restore driver state in place; returns frames_consumed."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    if state.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a video_segment_tpu checkpoint")
    if (state["frame_width"], state["frame_height"]) != (
            dense.frame_width, dense.frame_height):
        raise ValueError(
            f"checkpoint geometry {state['frame_width']}x"
            f"{state['frame_height']} does not match driver "
            f"{dense.frame_width}x{dense.frame_height}")
    _restore_dense(dense, state["dense"])
    if region is not None:
        if state["region"] is None:
            raise ValueError("checkpoint has no region-stage state")
        _restore_region(region, state["region"])
    return state["frames_consumed"]
