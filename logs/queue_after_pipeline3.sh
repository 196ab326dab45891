#!/bin/bash
# Waits for the pipeline3 process to exit, then chains the round-3 studies.
cd /root/repo
while kill -0 $(cat /tmp/pipeline3.pid) 2>/dev/null; do sleep 20; done
python tools/snapshot_run.py experiments/pipeline3/vae experiments/pipeline3/ldp || true
# the scientific-core study (VERDICT missing #3)
RUN=mixed_study bash tools/run_lift_mixed_study.sh > logs/mixed_study.log 2>&1
# baseline agents (VERDICT missing #5)
RUN=baselines bash tools/run_lift_baselines.sh > logs/baselines.log 2>&1
