"""High-level user API.

    import video_segment_tpu as vst
    from video_segment_tpu.api import segment_video, segment_frames

    segment_video("clip.mp4", "clip.pb")           # full pipeline
    for sf in segment_frames(frame_iter, w, h):    # streaming, in-process
        ...
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from video_segment_tpu.core import dense as dense_mod
from video_segment_tpu.core.options import (DenseSegmentationOptions,
                                            RegionSegmentationOptions)


def segment_frames(frames: Iterable[np.ndarray], frame_width: int,
                   frame_height: int, *,
                   use_flow: bool = True,
                   over_segment_only: bool = False,
                   dense_options: DenseSegmentationOptions | None = None,
                   region_options: RegionSegmentationOptions | None = None,
                   ) -> Iterator:
    """Stream BGR uint8 frames through the full segmentation pipeline,
    yielding SegFrame results (RLE regions + hierarchy on set starts)."""
    dense = dense_mod.DenseSegmentation(
        dense_options or DenseSegmentationOptions(), frame_width,
        frame_height)
    region = None
    if not over_segment_only:
        from video_segment_tpu.core import region as region_mod
        region = region_mod.RegionSegmentation(
            region_options or RegionSegmentationOptions(use_flow=use_flow),
            frame_width, frame_height)
    flow_eng = None
    if use_flow:
        from video_segment_tpu.core import flow as flow_mod
        flow_eng = flow_mod.FlowEngine(frame_width, frame_height)

    idx = 0
    for frame in frames:
        fl = flow_eng.compute(frame, idx) if flow_eng else None
        if region is not None:
            region.add_frame(idx, frame, fl)
        out = dense.process_frame(False, frame, fl)
        if region is not None:
            out = region.process_frames(False, out)
        yield from out
        idx += 1
    out = dense.process_frame(True)
    if region is not None:
        out = region.process_frames(True, out)
    yield from out


def segment_video(input_path: str, output_path: str | None = None, *,
                  use_flow: bool = True, over_segment_only: bool = False,
                  trim_to: int = 0, downscale_min_size: int = 0,
                  vectorize: bool = False,
                  dense_options: DenseSegmentationOptions | None = None,
                  region_options: RegionSegmentationOptions | None = None,
                  ) -> str:
    """Segment a video file end to end; writes and returns the .pb path."""
    from video_segment_tpu.dataio import emit, seg_io, video

    reader = video.VideoReader(
        input_path, downscale="to_min" if downscale_min_size else "none",
        downscale_size=downscale_min_size, trim_to=trim_to)
    out_path = output_path or (input_path + ".pb")
    writer = seg_io.SegmentationWriter(out_path)
    if not writer.open_file(header_flags=[1 if vectorize else 0, 1]):
        raise IOError(f"cannot open {out_path}")

    n = 0
    for sf in segment_frames(reader, reader.info.width, reader.info.height,
                             use_flow=use_flow,
                             over_segment_only=over_segment_only,
                             dense_options=dense_options,
                             region_options=region_options):
        if sf.hierarchy is not None and n > 0:
            writer.write_chunk()
        writer.add_to_chunk(emit.segframe_to_bytes(sf, vectorize=vectorize),
                            pts=reader.pts_of(sf.frame_index))
        n += 1
    writer.write_term_and_close()
    reader.close()
    return out_path
