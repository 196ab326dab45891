#!/bin/bash
# Round-5 FINAL chip queue (post VM-restart, deadline-aware).
#
# Replaces tools/run_round5_master.sh for the remaining wall clock: the
# restart ate ~40 min and the slow-tier revalidation had to run first, so
# the 14.4h master plan no longer fits. This ordering maximizes *completed
# evidence per minute*, exploiting two properties of the stage scripts:
#   - every training run evals+saves at STEPS/2, so even a killed run banks
#    an honest midpoint number (snapshot committed at shutdown);
#   - all stages are artifact-guarded/idempotent, so rerunning a script
#     skips finished work.
#
# Order (rationale):
#   1. lift demos            — prereq for everything (no VAE needed yet)
#   2. baselines pass 1      — trains DP-from-pixels, the reference's
#      DEFAULT agent (train_bc.yaml:2) and the single most valuable
#      "never trained e2e" partial; the script then dies at the dp_vae
#      stage (VAE missing) which is expected — `|| true`
#   3. pipeline3 VAE+latents — unlocks dp_vae/ldp_hier (NOT the LDP
#      retrain: the committed assets/bench ckpt already carries the bench
#      and must not be replaced by an unvetted retrain this late)
#   4. baselines pass 2      — DP guard skips, trains DPVAE then LDP-hier
#   5. Can pipeline          — converts the Can env partial
#   6. phys4 (trimmed 60k)   — corrected-geometry ALOHA retrain; 200k does
#      not fit, a 60k ladder/success point on the FIXED metric still
#      supersedes every phys3 number
#
# Evidence is snapshotted + committed after every stage so a mid-stage
# round end loses at most one stage's tail. ONE instance only
# (/tmp/queue5.pid).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/queue5.pid
mkdir -p logs datasets/lift
DEADLINE=${DEADLINE:-0}   # epoch seconds; 0 = no deadline gate

stamp() { echo "=== $1 $(date +%H:%M:%S) ===" | tee -a logs/r5_final.log; }
bank()  { # snapshot every run dir + commit the durable evidence
  shopt -s nullglob
  for d in experiments/*/*/; do python tools/snapshot_run.py "$d" \
    >> logs/r5_final.log 2>&1 || true; done
  shopt -u nullglob
  git add assets/runs logs/r5_*.log >> logs/r5_final.log 2>&1 || true
  git commit -m "$1" >> logs/r5_final.log 2>&1 || true
}
gate() { # skip remaining stages once past the deadline
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    stamp "deadline reached — stopping queue"; bank "Queue deadline bank"
    exit 0
  fi
}

stamp "stage0 streamed-sampler TPU smoke"
if [ ! -f logs/r5_streamsmoke.log ]; then
  timeout 900 python tools/smoke_streamed_sampler.py \
    > logs/r5_streamsmoke.log 2>&1 || true
fi

stamp "stage1 lift-demos"
if [ ! -f datasets/lift/demos.hdf5 ]; then
  timeout 1200 python tools/collect_demos.py n_episodes=256 episode_len=80 \
    out_path=datasets/lift/demos.hdf5 seed=0 > logs/r5_demos.log 2>&1 || true
fi
if [ ! -f datasets/lift/demos_eval.hdf5 ]; then
  # 32-episode eval shape triggers its own ~6 min XLA compile; 600 s killed
  # this run mid-compile and the missing file cascades through every later
  # stage (train eval_path, VAE eval set)
  timeout 1500 python tools/collect_demos.py n_episodes=32 episode_len=80 \
    out_path=datasets/lift/demos_eval.hdf5 seed=77 >> logs/r5_demos.log 2>&1 || true
fi
if [ ! -f datasets/lift/demos_eval.hdf5 ]; then
  stamp "FATAL: demos_eval.hdf5 still missing — aborting queue"
  exit 1
fi
gate

stamp "stage2 baselines pass1 (DP from pixels)"
timeout 3900 bash tools/run_lift_baselines.sh > logs/r5_baselines.log 2>&1 || true
bank "Round-5 queue: DP baseline trained e2e on Lift (pass 1)"
gate

stamp "stage3 pipeline3 VAE + latents"
if [ ! -d experiments/pipeline3/vae/ckpt/4000.ckpt ]; then
  timeout 2400 python tools/train_vae.py data=lift/img \
    data.train_path=datasets/lift/demos.hdf5 \
    data.eval_path=datasets/lift/demos_eval.hdf5 \
    'model.vae.block_out_channels=[64,128,128,128]' model.vae.patch_size=4 \
    model.vae.norm_groups=16 \
    batch_size=64 n_grad_steps=4000 warmup_steps=100 lr=3e-4 \
    eval_every=2000 save_every=2000 \
    experiment_folder=pipeline3 experiment_name=vae > logs/r5_vae.log 2>&1 || true
fi
if [ ! -f datasets/lift/demos_latent.hdf5 ]; then
  timeout 1200 python tools/process_latents.py \
    vae_snapshot_path=experiments/pipeline3/vae/ckpt/4000.ckpt \
    'vae.block_out_channels=[64,128,128,128]' vae.patch_size=4 vae.norm_groups=16 \
    'src_paths=[datasets/lift/demos.hdf5,datasets/lift/demos_eval.hdf5]' \
    'dst_paths=[datasets/lift/demos_latent.hdf5,datasets/lift/demos_eval_latent.hdf5]' \
    > logs/r5_latents.log 2>&1 || true
fi
bank "Round-5 queue: pipeline3 VAE + latent datasets rebuilt"
gate

stamp "stage4 baselines pass2 (DPVAE + LDP-hier)"
timeout 7200 bash tools/run_lift_baselines.sh >> logs/r5_baselines.log 2>&1 || true
bank "Round-5 queue: DPVAE + LDP-hier baselines trained e2e"
gate

stamp "stage5 can pipeline"
timeout 5400 bash tools/run_can_pipeline.sh > logs/r5_can.log 2>&1 || true
bank "Round-5 queue: Can contact-physics pipeline end-to-end"
gate

stamp "stage6 aloha phys4 (trimmed 60k)"
STEPS=60000 timeout 10800 bash tools/run_aloha_phys4.sh > logs/r5_phys4.log 2>&1 || true
bank "Round-5 queue: phys4 corrected-geometry ALOHA retrain (trimmed)"

stamp "queue complete"
