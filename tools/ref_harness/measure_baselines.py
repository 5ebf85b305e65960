#!/usr/bin/env python
"""Measure the reference pipeline's fps at every BASELINE config resolution.

Runs the upstream C++ core (golden_driver, built by build.sh) on upscaled
versions of the test clip and records per-config fps into
BASELINE_MEASURED.json at the repo root, which bench.py uses as the
vs_baseline denominator per BENCH_CONFIG.

Flow-enabled configs: this OpenCV build has no DualTVL1 (opencv-contrib
absent), so the reference's own flow computation cannot be timed; the
reference consumes a precomputed flow file (--flow_file) and its fps
EXCLUDES flow computation, while our pipeline's flow-on fps INCLUDES the
TPU TV-L1 — a denominator conservative against us (documented in
BENCH_NOTES.md).

Usage: python tools/ref_harness/measure_baselines.py [--configs 2,3,4,5]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

VIDEO = "/root/reference/video_example/test_video.MOV"
BUILD = os.environ.get("REF_BUILD", "/tmp/refbuild")

# config -> (scale_to (w,h) or None, flow, n_frames)
CONFIGS = {
    "1": (None, False, 60),          # over-seg only uses same clip; the
    "2": (None, False, 60),          # full-pipeline number serves both
    "3": ((480, 854), True, 45),
    "4": ((720, 1280), False, 40),
    "5": ((1080, 1920), False, 40),
}


def dump_frames(scale_to, n_frames: int, out_dir: str) -> list[np.ndarray]:
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.unlink(os.path.join(out_dir, f))
    cap = cv2.VideoCapture(VIDEO)
    frames = []
    while len(frames) < n_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if scale_to:
            frame = cv2.resize(frame, scale_to,
                               interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(out_dir, f"frame_{len(frames):06d}.png"),
                    frame)
        frames.append(frame)
    cap.release()
    return frames


def compute_flow_file(frames, path: str) -> None:
    """TPU TV-L1 backward flow, written as raw float32 (H,W,2) per pair
    (the golden_driver --flow_file format)."""
    from video_segment_tpu.core import flow as flow_mod

    h, w = frames[0].shape[:2]
    eng = flow_mod.FlowEngine(w, h)
    out = open(path, "wb")
    n_written = 0

    def emit(ready):
        nonlocal n_written
        for idx, _f, fl in ready:
            if fl is not None:
                out.write(np.ascontiguousarray(fl, np.float32).tobytes())
                n_written += 1

    for i, f in enumerate(frames):
        emit(eng.push(f, i))
    emit(eng.flush())
    out.close()
    assert n_written == len(frames) - 1, n_written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="2,3,4,5")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    for cfg in args.configs.split(","):
        scale_to, use_flow, n_frames = CONFIGS[cfg]
        tag = f"cfg{cfg}_{scale_to[0] if scale_to else 'native'}"
        frames_dir = os.path.join(BUILD, f"frames_{tag}")
        print(f"== config {cfg}: scale={scale_to} flow={use_flow} "
              f"n={n_frames}", flush=True)
        frames = dump_frames(scale_to, n_frames, frames_dir)
        n = len(frames)
        cmd = [os.path.join(BUILD, "golden_driver"),
               f"--frames_dir={frames_dir}",
               f"--output={os.path.join(BUILD, f'golden_{tag}.pb')}"]
        if use_flow:
            flow_path = os.path.join(BUILD, f"flow_{tag}.bin")
            if not os.path.exists(flow_path):
                compute_flow_file(frames, flow_path)
            cmd.append(f"--flow_file={flow_path}")
        t0 = time.time()
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        dt = time.time() - t0
        sys.stdout.write(proc.stdout[-1500:])
        if proc.returncode != 0:
            print(f"config {cfg} FAILED rc={proc.returncode}")
            continue
        fps = n / dt
        print(f"config {cfg}: {n} frames in {dt:.1f}s = {fps:.3f} fps",
              flush=True)
        results[cfg] = {
            "fps": round(fps, 3), "n_frames": n,
            "resolution": (f"{scale_to[0]}x{scale_to[1]}" if scale_to
                           else "272x480"),
            "flow": use_flow,
            "note": ("flow consumed from precomputed file; reference flow "
                     "computation excluded" if use_flow else ""),
        }
        if cfg == "2":
            results["1"] = dict(results["2"])
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
