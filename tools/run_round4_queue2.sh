#!/bin/bash
# Round-4 TPU job queue, revision 2 (mid-round re-plan after the aloha_phys2
# all-mixed training collapsed closed-loop reward — see
# tools/run_aloha_mixed_train.sh header). Single chip — strictly sequential;
# stages are idempotent so rerunning the queue resumes cleanly.
#   1. wait out the in-flight aloha_phys2 train_bc
#   2. record phys2 late-checkpoint evals at 256 eps (negative-result arm)
#   3. knob sweep on the CLEAN-demo run's best ckpt — the earlier sweep ran
#      before plan ensembling actually blended (pre-b457a01), so
#      plan_blend results were silently baseline
#   4. ALOHA split-stream mixed training (planner=clean, IDM=DART mixture)
#   5. eval + sweep the mixed run
#   6-10. pipeline3 -> mixed study -> can -> baselines -> roundtrip
#   11. reference-scale recipe until round end (periodic snapshots)
set -e
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/aloha_phys.pid ]; then
  while kill -0 "$(cat /tmp/aloha_phys.pid)" 2>/dev/null; do sleep 60; done
fi

if [ -d experiments/aloha_phys2/ldp/ckpt ]; then
  python tools/eval_bc.py run_dir=experiments/aloha_phys2/ldp \
    'ckpt_steps=[40000,50000,60000]' n_eval_episodes=256 \
    > logs/aloha_phys2_eval256.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys2/ldp || true
fi

if [ -d experiments/aloha_phys/ldp/ckpt ]; then
  RUN=aloha_phys CKPT_STEP=50000 N_EVAL=256 \
    bash tools/run_aloha_knob_sweep.sh > logs/aloha_phys_sweep2.log 2>&1 || true
fi

bash tools/run_aloha_mixed_train.sh > logs/aloha_mixed.log 2>&1

python tools/eval_bc.py run_dir=experiments/aloha_mixed/ldp \
  'ckpt_steps=[40000,50000,60000]' n_eval_episodes=256 \
  > logs/aloha_mixed_eval256.log 2>&1 || true
RUN=aloha_mixed CKPT_STEP=60000 N_EVAL=256 \
  bash tools/run_aloha_knob_sweep.sh > logs/aloha_mixed_sweep.log 2>&1 || true
python tools/snapshot_run.py experiments/aloha_mixed/ldp || true

RUN=pipeline3 bash tools/run_lift_pipeline.sh > logs/pipeline3_r4.log 2>&1
bash tools/run_lift_mixed_study.sh > logs/mixed_study_r4.log 2>&1
bash tools/run_can_pipeline.sh > logs/can_pipeline.log 2>&1
bash tools/run_lift_baselines.sh > logs/baselines_r4.log 2>&1
bash tools/run_roundtrip_check.sh > logs/roundtrip.log 2>&1
# reference-scale recipe (VERDICT #10) — runs until done or round end;
# a snapshotter loop persists its evidence every 10 min so a cut-off run
# still leaves auditable curves
( while true; do sleep 600; python tools/snapshot_run.py \
    experiments/ref_scale/ldp 2>/dev/null || true; done ) &
SNAP_PID=$!
bash tools/run_reference_scale.sh > logs/ref_scale.log 2>&1
kill $SNAP_PID 2>/dev/null || true
echo "round-4 queue v2 complete"
