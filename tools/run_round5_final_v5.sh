#!/bin/bash
# Round-5 final queue, part 5: takeover after the DP retrain hit the known
# tunnel-RPC deadlock mid-stage (stuck at step 23600, ~0 CPU, train.csv
# untouched 26 min — second occurrence this round; verify-skill signature).
# The v3 wrapper was killed PID-exactly with the hung python; this queue
# resumes the remainder under the extended window's deadline:
#   1. baselines  — DP resumes from 15000.ckpt (resume=true now set for
#                   DP/DPVAE), then DPVAE + LDP-hier
#   2. phys4      — corrected-geometry ALOHA (self-capping vs
#                   /tmp/round5_hard_deadline)
#   3. Can        — budget scaled to what remains
#   4. Square     — only on a free tail
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/queue5.pid
HARD=$(cat /tmp/round5_hard_deadline 2>/dev/null || echo 0)

stamp() { echo "=== v5 $1 $(date +%H:%M:%S) ===" | tee -a logs/r5_final.log; }
bank()  {
  shopt -s nullglob
  for d in experiments/*/*/; do python tools/snapshot_run.py "$d" \
    >> logs/r5_final.log 2>&1 || true; done
  shopt -u nullglob
  git add assets/runs logs/r5_*.log >> logs/r5_final.log 2>&1 || true
  git commit -m "$1" >> logs/r5_final.log 2>&1 || true
}
left() { echo $(( HARD - $(date +%s) )); }

stamp "stage1 baselines resume (left $(left)s)"
timeout $(( $(left) > 7200 ? 7200 : $(left) )) \
  bash tools/run_lift_baselines.sh >> logs/r5_baselines.log 2>&1 || true
bank "Round-5 queue: Lift baselines complete (DP / DPVAE / LDP-hier)"

if [ "$(left)" -gt 2400 ]; then
  stamp "stage2 aloha phys4 (self-capping, left $(left)s)"
  STEPS=50000 timeout $(( $(left) - 300 )) \
    bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true
  bank "Round-5 queue: phys4 corrected-geometry ALOHA (oversample + gripper loss weights)"
fi

L=$(left)
if   [ "$L" -ge 4200 ]; then CAN_STEPS=30000
elif [ "$L" -ge 3000 ]; then CAN_STEPS=20000
elif [ "$L" -ge 2100 ]; then CAN_STEPS=10000
else CAN_STEPS=0; fi
if [ "$CAN_STEPS" -gt 0 ]; then
  stamp "stage3 can pipeline (STEPS=$CAN_STEPS)"
  STEPS=$CAN_STEPS timeout $(( $(left) - 240 )) \
    bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true
  bank "Round-5 queue: Can contact-physics pipeline end-to-end"
fi

L=$(left)
if   [ "$L" -ge 3600 ]; then SQ_STEPS=20000
elif [ "$L" -ge 2400 ]; then SQ_STEPS=10000
else SQ_STEPS=0; fi
if [ "$SQ_STEPS" -gt 0 ]; then
  stamp "stage4 square pipeline (STEPS=$SQ_STEPS)"
  STEPS=$SQ_STEPS timeout $(( $(left) - 240 )) \
    bash tools/run_square_pipeline.sh > logs/r5_square.log 2>&1 || true
  bank "Round-5 queue: Square nut-assembly pipeline end-to-end"
fi

stamp "v5 queue complete (left $(left)s)"
