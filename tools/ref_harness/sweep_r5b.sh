#!/bin/bash
# Round-5 sweep B: chain-collapse / min-size fidelity knobs against the
# texture-recall diagnosis (BENCH_NOTES round-5: our level-0 boundaries are
# 80-90% precise but carry only ~2/3 of golden's boundary length; golden's
# texture cells are wiggly min-size mosaics, ours smoother blobs).
#
# Each config recompiles the solver (OversegParams is a static jit arg);
# run on the TPU with the compile cache warm where possible.
set -uo pipefail
cd "$(dirname "$0")/../.."
exec python tools/ref_harness/sweep_fmeasure.py \
  --out "${REF_BUILD:-/tmp/refbuild}/sweep_r5b.json" \
  --configs \
    "" \
    "preseg_pair_merge=1" \
    "pair_merge_minsize=1" \
    "preseg_pair_merge=1 pair_merge_minsize=1" \
    "min_size_interleave=1" \
    "preseg_pair_merge=1 pair_merge=1 pair_merge_minsize=1"
