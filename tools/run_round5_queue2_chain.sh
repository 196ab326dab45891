#!/bin/bash
# Round-5 chain: wait for queue #1 (Can pipeline) to release the chip, then
#   1. finish the ldp_hier baseline (crashed at the 15k offline eval on the
#      hier pred-length mismatch, now fixed in train/loop.py; resume=true
#      continues from the saved 15k snapshot)
#   2. run queue #2 (phys3 rescore on the corrected ladder, phys4 ALOHA
#      retrain with the three levers, insertion pipeline)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 30; done
fi

bash tools/run_lift_baselines.sh >> logs/r5_baselines.log 2>&1 || true

bash tools/run_round5_queue2.sh > logs/r5_queue2.log 2>&1 || true

echo "round-5 queue #2 chain complete"
