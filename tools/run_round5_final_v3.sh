#!/bin/bash
# Round-5 final queue, part 3 (after the fused-sampler Mosaic fix).
#
# v1's stage2/4 DP runs died twice: first on the real bug (bcast_rows
# sub-128-lane reshape, fixed in ops/pallas/diffusion_unet1d.py), then on
# the known tunnel-RPC deadlock triggered by a concurrent CPU pytest (the
# .claude verify skill documents the hazard; the rerun honored it).
# Remainder, in completed-evidence-per-minute order:
#   1. baselines  — DP retrain + DPVAE + LDP-hier (artifact-guarded)
#   2. phys4      — corrected-geometry ALOHA, 50k (the flagship task)
#   3. Can        — if time remains
#   4. smoke      — streamed fused sampler on the real chip
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

stamp "v3 stage1 baselines (DP retrain + DPVAE + LDP-hier)"
timeout 7200 bash tools/run_lift_baselines.sh >> logs/r5_baselines.log 2>&1 || true
bank "Round-5 queue: Lift baselines pass (DP / DPVAE / LDP-hier eval.csv snapshots)"
gate

stamp "v3 stage2 aloha phys4 (50k, corrected geometry + r4 levers)"
STEPS=50000 timeout 12600 bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true
bank "Round-5 queue: phys4 corrected-geometry ALOHA (oversample + gripper loss weights)"
gate

stamp "v3 stage3 can pipeline"
timeout 5400 bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true
bank "Round-5 queue: Can contact-physics pipeline end-to-end"
gate

stamp "v3 stage4 streamed-sampler TPU smoke"
timeout 900 python tools/smoke_streamed_sampler.py > logs/r5_streamsmoke2.log 2>&1 || true
git add logs/r5_streamsmoke2.log >> logs/r5_final.log 2>&1 || true
git commit -m "Round-5 queue: streamed fused-sampler real-TPU smoke" \
  >> logs/r5_final.log 2>&1 || true

stamp "v3 queue complete"
