#!/bin/bash
# Round-4 TPU job queue, revision 3 (after the phys3 data-fix pipeline).
# Single chip — strictly sequential; stages are idempotent so rerunning the
# queue resumes cleanly.
#   1. wait out the in-flight phys3 pipeline (tools/run_aloha_phys3.sh)
#   2. phys3 checkpoint sweep at 256 episodes (VERDICT #1 protocol)
#   3. Lift pipeline rebuild (prereq artifacts for 4/6/7)
#   4. mixed-data study at 512-episode evals + binomial CIs (VERDICT #2)
#   5. contact-physics Can pipeline (VERDICT #3)
#   6. baselines matrix DP/DPVAE/LDP-hier (VERDICT #4)
#   7. checkpoint round-trip rollout score (VERDICT #6)
# The reference-scale recipe (VERDICT #10) is launched separately so the
# ALOHA follow-up can take the chip first.
set -e
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/phys3.pid ]; then
  pid=$(cat /tmp/phys3.pid 2>/dev/null || echo "")
  while [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi

if [ -d experiments/aloha_phys3/ldp/ckpt ]; then
  python tools/eval_bc.py run_dir=experiments/aloha_phys3/ldp \
    n_eval_episodes=256 > logs/aloha_phys3_eval256.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys3/ldp || true
fi

RUN=pipeline3 bash tools/run_lift_pipeline.sh > logs/pipeline3_r4.log 2>&1
bash tools/run_lift_mixed_study.sh > logs/mixed_study_r4.log 2>&1
bash tools/run_can_pipeline.sh > logs/can_pipeline.log 2>&1
bash tools/run_lift_baselines.sh > logs/baselines_r4.log 2>&1
bash tools/run_roundtrip_check.sh > logs/roundtrip.log 2>&1
echo "queue3 deterministic stages complete"
