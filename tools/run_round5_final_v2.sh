#!/bin/bash
# Round-5 final queue, part 2: reordered remainder (phys4 BEFORE Can).
#
# Rationale: the corrected contact geometry (round-5 metric fix) invalidated
# every phys3 ALOHA number and the restart ate the phys3 checkpoints, so if
# phys4 never trains the flagship task ends round 5 with NO valid number at
# all. At the v1 ordering phys4 would start ~02:50 against a 03:15 deadline
# — it needs ~2.5 h. Can (one env partial) is the cheaper sacrifice; it
# stays last and artifact-guarded so any leftover time still converts it.
#
# Launch AFTER v1's stage4 (baselines pass 2) has banked; v1 is then killed
# at its stage-5 boundary. Stages remain idempotent.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/queue5.pid
DEADLINE=${DEADLINE:-0}

stamp() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a logs/r5_final.log; }
bank()  {
  shopt -s nullglob
  for d in experiments/*/*/; do python tools/snapshot_run.py "$d" \
    >> logs/r5_final.log 2>&1 || true; done
  shopt -u nullglob
  git add assets/runs logs/r5_*.log >> logs/r5_final.log 2>&1 || true
  git commit -m "$1" >> logs/r5_final.log 2>&1 || true
}
gate() {
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    stamp "deadline reached — stopping queue"; bank "Queue deadline bank"
    exit 0
  fi
}

stamp "v2 stage5 aloha phys4 (50k, corrected geometry + r4 levers)"
STEPS=50000 timeout 12600 bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true
bank "Round-5 queue: phys4 corrected-geometry ALOHA (oversample + gripper loss weights)"
gate

stamp "v2 stage6 can pipeline"
timeout 5400 bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true
bank "Round-5 queue: Can contact-physics pipeline end-to-end"
gate

stamp "v2 stage7 streamed-sampler TPU smoke (import fixed)"
timeout 900 python tools/smoke_streamed_sampler.py > logs/r5_streamsmoke2.log 2>&1 || true
git add logs/r5_streamsmoke2.log >> logs/r5_final.log 2>&1 || true
git commit -m "Round-5 queue: streamed fused-sampler real-TPU smoke" \
  >> logs/r5_final.log 2>&1 || true

stamp "v2 queue complete"
