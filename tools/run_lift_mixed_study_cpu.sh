#!/bin/bash
# CPU-scale mixed/action-free study on physics Lift (the LDP scientific
# core, runnable without a TPU): tiny VAE + planner at 16px, same stream
# semantics as tools/run_lift_mixed_study.sh (planner <- data, IDM <-
# mixed_data; reference agent/ldp_agent.py:184-200). Produces experiments/
# artifacts for expert-N vs mixed-N vs actionfree-N.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
# persistent compile cache is safe+effective on CPU (the known hang is
# axon-tunnel-specific, utils/runtime.py) — arms 2-4 reuse arm 1's compiles
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache_cpu}
RUN=${RUN:-mixed_mini}
N_EXPERT=${N_EXPERT:-8}
STEPS=${STEPS:-4000}
DD=datasets/lift_mini

if [ ! -f $DD/demos.hdf5 ]; then
python tools/collect_demos.py env.image_size=16 env.episode_len=60 \
  episode_len=60 n_episodes=96 out_path=$DD/demos.hdf5 seed=0
python tools/collect_demos.py env.image_size=16 env.episode_len=60 \
  episode_len=60 n_episodes=28 max_demos=24 out_path=$DD/demos_eval.hdf5 seed=77
fi

VAE_ARGS="block_out_channels=[8,8,8] norm_groups=4 use_mid_attention=false"
if [ ! -f experiments/$RUN/vae/ckpt/1500.ckpt ]; then
python tools/train_vae.py data=lift/img \
  data.train_path=$DD/demos.hdf5 data.eval_path=$DD/demos_eval.hdf5 \
  'model.vae.block_out_channels=[8,8,8]' model.vae.norm_groups=4 \
  model.vae.use_mid_attention=false \
  batch_size=32 n_grad_steps=1500 warmup_steps=50 lr=3e-4 \
  eval_every=1500 save_every=1500 \
  experiment_folder=$RUN experiment_name=vae
fi

if [ ! -f $DD/demos_latent.hdf5 ]; then
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/1500.ckpt \
  'vae.block_out_channels=[8,8,8]' vae.norm_groups=4 vae.use_mid_attention=false \
  "src_paths=[$DD/demos.hdf5,$DD/demos_eval.hdf5]" \
  "dst_paths=[$DD/demos_latent.hdf5,$DD/demos_eval_latent.hdf5]"
fi

# tiny-agent + mini-dataset overrides shared by all arms
MINI="model_vae.block_out_channels=[8,8,8] model_vae.norm_groups=4
  model_vae.use_mid_attention=false
  agent.vae_pretrain_path=experiments/$RUN/vae/ckpt/1500.ckpt
  agent.vae_feature_dim=64
  agent.planner.down_dims=[16,32]
  agent.idm_net.n_blocks=1 agent.idm_net.hidden_dim=64
  agent.planner_n_diffusion_steps=20 agent.idm_n_diffusion_steps=20
  agent.planner_inference_steps=8 agent.idm_inference_steps=8
  agent.warmup_steps=100 agent.decay_steps=$STEPS
  data.meta.shape_meta.all_shapes.latent_agentview_image=[64]
  data.env_params.env.image_size=16 data.env_params.env.episode_len=60
  horizon=9 obs_horizon=1 action_horizon=4 pred_horizon=8 batch_size=64
  n_grad_steps=$STEPS warmup_steps=100 lr=3e-4 n_eval_episodes=16
  eval_every=$STEPS save_every=$STEPS experiment_folder=$RUN"
EXP="data.train_path=$DD/demos.hdf5 data.eval_path=$DD/demos_eval.hdf5
  data.train_latent_path=$DD/demos_latent.hdf5
  data.eval_latent_path=$DD/demos_eval_latent.hdf5"
MIX="mixed_data.train_paths=[$DD/demos.hdf5,$DD/suboptimal.hdf5]
  mixed_data.eval_paths=$DD/demos_eval.hdf5
  mixed_data.train_latent_paths=[$DD/demos_latent.hdf5,$DD/suboptimal_latent.hdf5]
  mixed_data.eval_latent_paths=$DD/demos_eval_latent.hdf5"
PMIX="data.train_paths=[$DD/demos.hdf5,$DD/suboptimal.hdf5]
  data.eval_paths=$DD/demos_eval.hdf5
  data.train_latent_paths=[$DD/demos_latent.hdf5,$DD/suboptimal_latent.hdf5]
  data.eval_latent_paths=$DD/demos_eval_latent.hdf5"

# 1. expert-only BC with N_EXPERT demos (the data-scarce baseline)
if [ ! -f experiments/$RUN/expert$N_EXPERT/eval.csv ]; then
python tools/train_bc.py agent=ldp_agent data=lift/latent_img $EXP \
  data.train_n_episode_overfit=$N_EXPERT $MINI experiment_name=expert$N_EXPERT
fi

# 2. suboptimal corpus from the expert-only policy + noise (reference
#    collect_data.yaml: unsuccessful_only)
if [ ! -f $DD/suboptimal.hdf5 ]; then
python tools/collect_data.py run_dir=experiments/$RUN/expert$N_EXPERT \
  n_episodes=96 episode_len=60 noise=0.3 unsuccessful_only=true \
  out_path=$DD/suboptimal.hdf5 seed=123
python tools/process_latents.py vae_snapshot_path=experiments/$RUN/vae/ckpt/1500.ckpt \
  'vae.block_out_channels=[8,8,8]' vae.norm_groups=4 vae.use_mid_attention=false \
  "src_paths=[$DD/suboptimal.hdf5]" "dst_paths=[$DD/suboptimal_latent.hdf5]"
fi

# 3. mixed: IDM additionally sees the suboptimal actions
if [ ! -f experiments/$RUN/mixed$N_EXPERT/eval.csv ]; then
python tools/train_mixed_bc.py data=lift/latent_img $EXP \
  data.train_n_episode_overfit=$N_EXPERT \
  mixed_data=lift/mixed_latent_img $MIX \
  "mixed_data.train_n_episode_overfit=[$N_EXPERT,null]" \
  "mixed_data.meta.shape_meta.all_shapes.latent_agentview_image=[64]" \
  $MINI experiment_name=mixed$N_EXPERT
fi

# 4. action-free: planner additionally sees suboptimal latent streams
if [ ! -f experiments/$RUN/actionfree$N_EXPERT/eval.csv ]; then
python tools/train_mixed_bc.py data=lift/mixed_latent_img $PMIX \
  "data.train_n_episode_overfit=[$N_EXPERT,null]" \
  "data.meta.shape_meta.all_shapes.latent_agentview_image=[64]" \
  mixed_data=lift/latent_img \
  mixed_data.train_path=$DD/demos.hdf5 mixed_data.eval_path=$DD/demos_eval.hdf5 \
  mixed_data.train_latent_path=$DD/demos_latent.hdf5 \
  mixed_data.eval_latent_path=$DD/demos_eval_latent.hdf5 \
  mixed_data.train_n_episode_overfit=$N_EXPERT \
  "mixed_data.meta.shape_meta.all_shapes.latent_agentview_image=[64]" \
  $MINI experiment_name=actionfree$N_EXPERT
fi

python - <<PYEOF
import csv, glob
print("== mixed-study ($RUN) results ==")
for f in sorted(glob.glob("experiments/$RUN/*/eval.csv")):
    rows = list(csv.DictReader(open(f)))
    if rows:
        r = rows[-1]
        print(f"{f.split('/')[-2]:>16}: success {r.get('success')} "
              f"@ step {r.get('step')}")
PYEOF
