#!/bin/bash
# Round-4 TPU job queue (VERDICT r3 priorities). Single chip — strictly
# sequential. Each stage is idempotent; rerunning the queue resumes cleanly.
#   1. (separate) tools/run_aloha_phys_pipeline.sh — wait for it
#   2. ALOHA checkpoint sweep at 256 episodes (VERDICT #1 protocol)
#   3. Lift pipeline rebuild (prereq artifacts for 4/6; refreshes assets/bench)
#   4. mixed-data study at 512-episode evals (VERDICT #2)
#   5. contact-physics Can pipeline (VERDICT #3)
#   6. baselines matrix DP/DPVAE/LDP-hier (VERDICT #4)
#   7. checkpoint round-trip rollout score (VERDICT #6)
set -e
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/aloha_phys.pid ]; then
  while kill -0 "$(cat /tmp/aloha_phys.pid)" 2>/dev/null; do sleep 60; done
fi

if [ -d experiments/aloha_phys2/ldp/ckpt ]; then
  python tools/eval_bc.py run_dir=experiments/aloha_phys2/ldp \
    n_eval_episodes=256 > logs/aloha_sweep.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys2/ldp
fi

RUN=pipeline3 bash tools/run_lift_pipeline.sh > logs/pipeline3_r4.log 2>&1
bash tools/run_lift_mixed_study.sh > logs/mixed_study_r4.log 2>&1
bash tools/run_can_pipeline.sh > logs/can_pipeline.log 2>&1
bash tools/run_lift_baselines.sh > logs/baselines_r4.log 2>&1
bash tools/run_roundtrip_check.sh > logs/roundtrip.log 2>&1
# 8. reference-scale recipe (VERDICT #10) — runs until done or round end;
#    a snapshotter loop persists its evidence every 10 min so a cut-off run
#    still leaves auditable curves
( while true; do sleep 600; python tools/snapshot_run.py \
    experiments/ref_scale/ldp 2>/dev/null || true; done ) &
SNAP_PID=$!
bash tools/run_reference_scale.sh > logs/ref_scale.log 2>&1
kill $SNAP_PID 2>/dev/null || true
echo "round-4 queue complete"
