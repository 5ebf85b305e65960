"""Batch throughput: segment multiple clips through one device.

Two modes:
- sequential (default --concurrent=1): clips run back to back; compiled
  device programs are shared across clips of the same resolution.
- interleaved (--concurrent=N): N clips' pipelines run at once — their
  device programs serialize on the chip, but each clip's host stages
  (decode, RLE/proto emission, native histogram accumulation, hierarchy
  assembly) fill the gaps left while other clips own the device, so the
  chip never idles on host work.  This is the batch-serving topology for
  one chip; multi-chip batch rides the mesh "data" axis instead
  (parallel.mesh).

For fusing clips into ONE device program (vmap over the clip axis,
rather than interleaving per-clip programs), the building block is
`parallel.mesh.fused_oversegment`; wiring it through the dense chunk
loop end-to-end is tracked in ROADMAP.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_one(path, args, idx=0):
    import os

    from video_segment_tpu.api import segment_video
    from video_segment_tpu.dataio import seg_io

    out = None
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        # Index-prefix when the same basename appears twice in the batch.
        base = os.path.basename(path)
        if sum(1 for p in args.inputs if os.path.basename(p) == base) > 1:
            base = f"{idx:03d}_{base}"
        out = os.path.join(args.output_dir, base + ".pb")
    t1 = time.time()
    pb = segment_video(path, out, use_flow=args.flow,
                       over_segment_only=args.over_segment,
                       trim_to=args.trim_to,
                       downscale_min_size=args.downscale_min_size)
    r = seg_io.SegmentationReader(pb)
    r.open_and_read_headers()
    n = r.num_frames
    r.close()
    print(f"{path}: {n} frames in {time.time() - t1:.1f}s -> {pb}")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+", help="video files")
    p.add_argument("--output_dir", default="", help="where to put .pb files")
    p.add_argument("--flow", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--over_segment", action="store_true")
    p.add_argument("--trim_to", type=int, default=0)
    p.add_argument("--downscale_min_size", type=int, default=0)
    p.add_argument("--concurrent", type=int, default=1,
                   help="clips interleaved through the device at once")
    args = p.parse_args(argv)

    t0 = time.time()
    total_frames = 0
    if args.concurrent > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.concurrent) as ex:
            for n in ex.map(lambda iv: _run_one(iv[1], args, iv[0]),
                            enumerate(args.inputs)):
                total_frames += n
    else:
        for i, path in enumerate(args.inputs):
            total_frames += _run_one(path, args, i)
    dt = time.time() - t0
    print(json.dumps({"clips": len(args.inputs), "frames": total_frames,
                      "seconds": round(dt, 2),
                      "fps": round(total_frames / max(dt, 1e-6), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
