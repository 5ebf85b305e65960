#!/usr/bin/env python
"""Sweep solver params against the existing golden .pb and tabulate F.

Each configuration runs our seg_tree (via make_golden --skip-golden) with
--solver_param overrides and records boundary F at the standard levels.

Usage:
  python tools/ref_harness/sweep_fmeasure.py \
      --configs "preseg_fin_margin=1.0" "preseg_fin_margin=1.5" ...
Each --configs entry is a space-separated list of NAME=VALUE overrides
(empty string = shipped defaults).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
BUILD = os.environ.get("REF_BUILD", "/tmp/refbuild")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", required=True)
    ap.add_argument("--max-frames", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(BUILD, "sweep.json"))
    args = ap.parse_args()

    results = {}
    for cfg in args.configs:
        ours_args = " ".join(f"--solver_param {kv}" for kv in cfg.split())
        out_json = os.path.join(BUILD, "fmeasure_sweep_tmp.json")
        cmd = [sys.executable, os.path.join(HERE, "make_golden.py"),
               "--skip-golden", "--max-frames", str(args.max_frames),
               "--out-json", out_json]
        if ours_args:
            cmd += ["--ours-args", ours_args]
        print(f"=== sweep config: {cfg or '(defaults)'} ===", flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        if proc.returncode != 0:
            results[cfg or "(defaults)"] = {"error": proc.returncode}
            continue
        with open(out_json) as f:
            results[cfg or "(defaults)"] = json.load(f)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
