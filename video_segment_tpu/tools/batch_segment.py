"""Batch throughput: segment multiple clips back to back.

The compiled device programs are shared across clips of the same
resolution (persistent compilation cache + in-process jit cache), so batch
throughput amortizes all compile cost; each clip's host stages overlap
through the threaded pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+", help="video files")
    p.add_argument("--output_dir", default="", help="where to put .pb files")
    p.add_argument("--flow", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--over_segment", action="store_true")
    p.add_argument("--trim_to", type=int, default=0)
    p.add_argument("--downscale_min_size", type=int, default=0)
    args = p.parse_args(argv)

    import os

    from video_segment_tpu.api import segment_video

    t0 = time.time()
    total_frames = 0
    for path in args.inputs:
        out = None
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            out = os.path.join(args.output_dir,
                               os.path.basename(path) + ".pb")
        t1 = time.time()
        pb = segment_video(path, out, use_flow=args.flow,
                           over_segment_only=args.over_segment,
                           trim_to=args.trim_to,
                           downscale_min_size=args.downscale_min_size)
        from video_segment_tpu.dataio import seg_io
        r = seg_io.SegmentationReader(pb)
        r.open_and_read_headers()
        n = r.num_frames
        r.close()
        total_frames += n
        print(f"{path}: {n} frames in {time.time() - t1:.1f}s -> {pb}")
    dt = time.time() - t0
    print(json.dumps({"clips": len(args.inputs), "frames": total_frames,
                      "seconds": round(dt, 2),
                      "fps": round(total_frames / max(dt, 1e-6), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
