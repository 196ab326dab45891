#!/bin/bash
# Round-5 final queue, part 4: the post-phys4 tail for the extended window.
#
# v3 was launched with a 03:15 internal DEADLINE computed for the previous
# session's wall clock; this session runs ~3h longer, so v3's gate will
# stop it after phys4 and never reach Can. This script waits for the v3
# queue process to exit (ONE queue instance only — ROADMAP queue
# discipline), takes over the watchdog pidfile, and spends whatever chip
# time remains before the hard deadline on the Can pipeline (VERDICT r4
# next-step 4c), then Square (next-step 5) if a miracle window remains.
set -u
cd "$(dirname "$0")/.."

V3PID=${V3PID:?pass the running v3 queue PID}
HARD=$(cat /tmp/round5_hard_deadline 2>/dev/null || echo 0)

while kill -0 "$V3PID" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/queue5.pid
stamp() { echo "=== v4 $1 $(date +%H:%M:%S) ===" | tee -a logs/r5_final.log; }
bank()  {
  shopt -s nullglob
  for d in experiments/*/*/; do python tools/snapshot_run.py "$d" \
    >> logs/r5_final.log 2>&1 || true; done
  shopt -u nullglob
  git add assets/runs logs/r5_*.log >> logs/r5_final.log 2>&1 || true
  git commit -m "$1" >> logs/r5_final.log 2>&1 || true
}
left() { echo $(( HARD - $(date +%s) )); }

stamp "takeover after v3 exit (left $(left)s)"

# Can: full 30k fits in ~60 min; shrink the budget with the window.
L=$(left)
if   [ "$L" -ge 4200 ]; then CAN_STEPS=30000
elif [ "$L" -ge 3000 ]; then CAN_STEPS=20000
elif [ "$L" -ge 2100 ]; then CAN_STEPS=10000
else CAN_STEPS=0; fi
if [ "$CAN_STEPS" -gt 0 ]; then
  stamp "can pipeline (STEPS=$CAN_STEPS)"
  STEPS=$CAN_STEPS timeout $(( $(left) - 240 )) \
    bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true
  bank "Round-5 queue: Can contact-physics pipeline end-to-end"
fi

# Square: only on a genuinely free tail, budget scaled like Can.
L=$(left)
if   [ "$L" -ge 3600 ]; then SQ_STEPS=20000
elif [ "$L" -ge 2400 ]; then SQ_STEPS=10000
else SQ_STEPS=0; fi
if [ "$SQ_STEPS" -gt 0 ]; then
  stamp "square pipeline (STEPS=$SQ_STEPS)"
  STEPS=$SQ_STEPS timeout $(( $(left) - 240 )) \
    bash tools/run_square_pipeline.sh > logs/r5_square.log 2>&1 || true
  bank "Round-5 queue: Square nut-assembly pipeline end-to-end"
fi

stamp "v4 queue complete (left $(left)s)"
