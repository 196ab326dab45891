#!/bin/bash
# Round-5 TPU job queue #3: the remaining capability rows.
#   1. Square nut-assembly pipeline end-to-end (VERDICT r4 item 5) — the
#      last robosuite-task partial after Can clears in queue #1.
#   2. reference-scale recipe proof (VERDICT r4 item 7): reference-shape
#      VAE + [256,512,1024] DDPM-100 planner at batch 256, XLA-scan
#      sampler (above the fused-path VMEM budget by design).
# Square first: it converts a coverage row for ~1h; the ref-scale run is
# a capacity proof whose step budget can be trimmed via STEPS if the
# round clock gets tight.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

bash tools/run_square_pipeline.sh > logs/r5_square.log 2>&1 || true

STEPS=${REF_STEPS:-100000} bash tools/run_reference_scale.sh \
  > logs/r5_ref_scale.log 2>&1 || true

echo "round-5 queue #3 complete"
