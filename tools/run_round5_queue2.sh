#!/bin/bash
# Round-5 TPU job queue #2: ALOHA on the corrected contact geometry.
#   1. retry the phys3 re-score on the corrected ladder (queue #1's attempt
#      wedged on a tunnel-RPC init hang and was killed; the number is only
#      a stale-policy baseline, so 256 episodes on the final ckpt suffices)
#   2. phys4: regenerate demos -> VAE -> latents -> 200k LDP with the three
#      round-4 levers -> 256-episode protocol sweep (VERDICT r4 item 2)
#   3. insertion pipeline end-to-end (VERDICT r4 item 8)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

# streamed fused-sampler TPU smoke: prove the Mosaic lowering on the real
# chip before the reference-scale run (queue #3) relies on it
timeout 900 python tools/smoke_streamed_sampler.py \
  > logs/r5_streamsmoke.log 2>&1 || true

if [ -d experiments/aloha_phys3/ldp/ckpt ]; then
  timeout 1800 python tools/eval_bc.py run_dir=experiments/aloha_phys3/ldp \
    'ckpt_steps=[60000]' n_eval_episodes=256 eval_action_horizon=1 \
    plan_blend=0.7 > logs/r5_phys3_rescore2.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys3/ldp || true
fi

bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true

bash tools/run_aloha_insertion_pipeline.sh > logs/r5_insertion.log 2>&1 || true

echo "round-5 queue #2 complete"
