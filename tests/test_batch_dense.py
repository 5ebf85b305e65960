"""Fused multi-clip dense driver: lockstep batching equals per-clip runs."""

import numpy as np

from video_segment_tpu.core import batch, dense
from video_segment_tpu.core.options import DenseSegmentationOptions


def _clip(n_frames, seed, h=24, w=32):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 60, 3)
    frames = []
    for f in range(n_frames):
        img = np.full((h, w, 3), base, np.uint8)
        x0 = 2 + f + seed
        img[8:16, x0:x0 + 8] = 200 + seed * 5
        frames.append(img)
    return frames


def _opts(**kw):
    return DenseSegmentationOptions(chunk_size=5, presmoothing="gaussian",
                                    frac_min_region_size=0.05,
                                    async_tail=False, **kw)


def _run_single(frames):
    ds = dense.DenseSegmentation(_opts(), frames[0].shape[1],
                                 frames[0].shape[0])
    out = []
    for fr in frames:
        out += ds.process_frame(False, fr)
    out += ds.process_frame(True)
    return out


def _assert_frames_equal(a, b):
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        assert sa.frame_index == sb.frame_index
        np.testing.assert_array_equal(sa.region_ids, sb.region_ids)
        np.testing.assert_array_equal(sa.interval_counts, sb.interval_counts)
        np.testing.assert_array_equal(sa.ys, sb.ys)
        np.testing.assert_array_equal(sa.lxs, sb.lxs)
        np.testing.assert_array_equal(sa.rxs, sb.rxs)


def test_batch_matches_per_clip_over_chunks():
    """Two clips, multiple chunks (free + constrained): the fused batched
    solve must reproduce each clip's standalone streaming output."""
    clips = [_clip(12, 0), _clip(12, 3)]
    singles = [_run_single(c) for c in clips]

    bd = batch.BatchDenseSegmentation(_opts(), 32, 24, 2)
    outs = [[], []]
    for step in range(12):
        got = bd.process_frames(False, [clips[0][step], clips[1][step]])
        for i in range(2):
            outs[i] += got[i]
    got = bd.process_frames(True)
    for i in range(2):
        outs[i] += got[i]

    for i in range(2):
        _assert_frames_equal(outs[i], singles[i])


def test_batch_uneven_lengths_fall_back():
    """Clips of different lengths: the shorter clip flushes early through
    per-clip dispatch; outputs still match standalone runs."""
    clips = [_clip(12, 1), _clip(8, 4)]
    singles = [_run_single(c) for c in clips]

    bd = batch.BatchDenseSegmentation(_opts(), 32, 24, 2)
    outs = [[], []]
    for step in range(12):
        frames = [clips[0][step],
                  clips[1][step] if step < 8 else None]
        # Flush clip 1 exactly when its stream ends.
        if step == 8:
            got = bd.process_frames(False, frames)
            for i in range(2):
                outs[i] += got[i]
            outs[1] += bd.clips[1].process_frame(True)
            continue
        got = bd.process_frames(False, frames)
        for i in range(2):
            outs[i] += got[i]
    got = bd.process_frames(True)
    for i in range(2):
        outs[i] += got[i]

    for i in range(2):
        _assert_frames_equal(outs[i], singles[i])


def test_batch_banded_matches_per_clip():
    """Banded resolutions fuse too: the driver scales each clip's voxel
    budget down by the clip count, so the vmapped batch of per-band pixel
    phases fits the original budget (the round-4 driver refused banded
    shapes).  Fused banded == standalone streaming at the same bands."""
    clips = [_clip(12, 0), _clip(12, 3)]

    def run_single_banded(frames):
        ds = dense.DenseSegmentation(_opts(max_solve_voxels=4_500), 32, 24)
        assert ds._bands > 1
        out = []
        for fr in frames:
            out += ds.process_frame(False, fr)
        return out + ds.process_frame(True)

    singles = [run_single_banded(c) for c in clips]

    bd = batch.BatchDenseSegmentation(_opts(max_solve_voxels=9_000),
                                      32, 24, 2)
    assert bd.clips[0]._bands > 1        # the scaled budget forced bands
    outs = [[], []]
    for step in range(12):
        got = bd.process_frames(False, [clips[0][step], clips[1][step]])
        for i in range(2):
            outs[i] += got[i]
    got = bd.process_frames(True)
    for i in range(2):
        outs[i] += got[i]

    for i in range(2):
        _assert_frames_equal(outs[i], singles[i])
