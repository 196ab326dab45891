#!/bin/bash
# Round-5 master chip queue, post VM-restart rebuild.
#
# The mid-round VM restart wiped every untracked artifact (experiments/,
# datasets/, XLA caches); only git-tracked snapshots survived. This queue
# regenerates the full capability matrix from scratch, ordered by VERDICT
# r4 priority:
#   1. Lift pipeline  — prereq for baselines + ref-scale (datasets/lift,
#      experiments/pipeline3/vae); refreshes the bench flagship ckpt
#   2. ALOHA phys4    — the headline: corrected contact geometry + the
#      three diagnosed levers at a 200k budget (VERDICT item 2)
#   3. baselines      — DP / DPVAE / LDP-hier trained e2e (item 4b)
#   4. Can pipeline   — (item 4c)
#   5. Square         — (item 5)
#   6. insertion      — (item 8), trimmed budget: honest number > ceiling
#   7. ref-scale      — capacity proof (item 7), trimmed budget
#
# Per-stage timeouts bound a wedge to one stage; `|| true` keeps the queue
# draining. ONE instance only (queue discipline, ROADMAP): check
# /tmp/queue5.pid before launching.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
stamp() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a logs/r5_master.log; }

stamp "stage1 lift-pipeline start"
RUN=pipeline3 timeout 4500 bash tools/run_lift_pipeline.sh \
  > logs/r5_lift.log 2>&1 || true
python tools/snapshot_run.py experiments/pipeline3/vae \
  experiments/pipeline3/ldp >> logs/r5_lift.log 2>&1 || true

stamp "stage2 aloha-phys4 start"
timeout 14400 bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true

stamp "stage3 baselines start"
timeout 9000 bash tools/run_lift_baselines.sh > logs/r5_baselines.log 2>&1 || true

stamp "stage4 can start"
timeout 5400 bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true

stamp "stage5 square start"
timeout 5400 bash tools/run_square_pipeline.sh > logs/r5_square.log 2>&1 || true

stamp "stage6 insertion start"
STEPS=30000 timeout 6000 bash tools/run_aloha_insertion_pipeline.sh \
  > logs/r5_insertion.log 2>&1 || true

stamp "stage7 ref-scale start"
STEPS=40000 timeout 7200 bash tools/run_reference_scale.sh \
  > logs/r5_ref_scale.log 2>&1 || true

stamp "queue complete"
