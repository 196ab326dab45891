#!/bin/bash
# Round-4 FINAL queue (v2) — single chip, strictly sequential, deadline-aware.
# Rewritten after the phys3 result landed (3.1% @64 eps, mean reward 3.1/4.0:
# the policy climbs the whole contact-reward ladder and fails the last
# stage): mini knob-sweep + diagnosis evidence on phys3, then the VERDICT
# stages in value-per-minute order. Every stage is gated on remaining
# wall-clock and watchdog-killed at DEADLINE_TS so the chip is free for the
# driver's bench capture.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE_TS=${DEADLINE_TS:-1787131800}
left() { echo $(( DEADLINE_TS - $(date +%s) )); }
# notes tee into a dedicated file because stage stdout is redirected per-stage
note() { echo "[queue4 $(date +%H:%M:%S)] $*" | tee -a logs/queue_r4final.notes; }

# recursive kill: `timeout` alone would orphan the stage's python
# grandchildren on the chip — walk the tree leaves-first
kill_tree() {
  local c
  for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do kill_tree "$c"; done
  kill "$1" 2>/dev/null
}

# admit STAGE EST_SECONDS CMD... : run CMD iff the estimate fits, then
# watchdog it against DEADLINE_TS; a deadline kill still leaves
# checkpoints + per-arm snapshots behind.
admit() {
  local name=$1 est=$2; shift 2
  local rem; rem=$(left)
  if [ "$rem" -lt "$est" ]; then
    note "SKIP $name (needs ~${est}s, ${rem}s left)"
    return 1
  fi
  note "START $name (est ${est}s, ${rem}s left)"
  "$@" &
  local sp=$!
  while kill -0 "$sp" 2>/dev/null; do
    if [ "$(left)" -le 0 ]; then
      note "DEADLINE kill $name"
      kill_tree "$sp"
      break
    fi
    sleep 20
  done
  wait "$sp" 2>/dev/null
  note "END $name rc=$?"
  return 0
}

PHYS3=experiments/aloha_phys3/ldp

# ---- 1. phys3 at the VERDICT protocol: 256 eps on the 2 best ckpts ------
admit phys3_eval 420 python tools/eval_bc.py run_dir=$PHYS3 \
  'ckpt_steps=[50000,60000]' n_eval_episodes=256 \
  > logs/aloha_phys3_eval256.log 2>&1 || true

# ---- 2. mini knob-sweep: the 3 highest-value eval-time levers -----------
sweep_one() {
  local label=$1; shift
  python tools/eval_bc.py run_dir=$PHYS3 n_eval_episodes=256 \
    'ckpt_steps=[60000]' "$@" 2>&1 | grep -E "ckpt [0-9]+:" | sed "s/^/[$label] /"
}
mini_sweep() {
  sweep_one ddim50 agent.planner_inference_steps=50 agent.idm_inference_steps=50
  sweep_one ah8 eval_action_horizon=8
  sweep_one ah1_blend07 eval_action_horizon=1 plan_blend=0.7
}
admit phys3_minisweep 480 mini_sweep > logs/aloha_phys3_sweep.log 2>&1 || true
python tools/snapshot_run.py $PHYS3 || true

# ---- 3. last-stage diagnosis evidence (side-by-side vs the expert) ------
admit phys3_diag 360 python tools/diag_aloha.py run_dir=$PHYS3 \
  ckpt_step=60000 n_episodes=8 out_dir=assets/runs/aloha_phys3/diag \
  > logs/aloha_phys3_diag.log 2>&1 || true

# ---- 4. lift pipeline (prereq for 5/7; refreshes assets/bench) ----------
admit pipeline3 1500 env RUN=pipeline3 bash tools/run_lift_pipeline.sh \
  > logs/pipeline3_r4.log 2>&1 || true

if [ -d experiments/pipeline3/vae/ckpt/4000.ckpt ]; then
  # ---- 5. mixed-data study, 20k arms + 512-episode evals (VERDICT #2) --
  # (relative comparison between arms is the claim; 20k is past the round-2
  # 78%-success point on physics Lift, and the per-arm guards + watchdog
  # snapshots keep partial evidence if clamped)
  admit mixed_study 1500 env STEPS=20000 bash tools/run_lift_mixed_study.sh \
    > logs/mixed_study_r4.log 2>&1 || true
  # ---- 6. checkpoint round trip (VERDICT #6, cheap, completes fully) ----
  admit roundtrip 500 bash tools/run_roundtrip_check.sh \
    > logs/roundtrip.log 2>&1 || true
  # ---- 7. baselines matrix at 20k (VERDICT #4; DP arm first — the
  #         reference's default agent is the valuable one if clamped) -----
  admit baselines 600 env STEPS=20000 bash tools/run_lift_baselines.sh \
    > logs/baselines_r4.log 2>&1 || true
fi

# ---- 8. contact-physics Can pipeline (VERDICT #3, big window only) ------
admit can_pipeline 2600 bash tools/run_can_pipeline.sh \
  > logs/can_pipeline.log 2>&1 || true

# final sweep: persist whatever the deadline clamp cut off
for d in experiments/*/; do
  for r in "$d"*/; do
    [ -f "$r/config.yaml" ] && python tools/snapshot_run.py "$r" || true
  done
done
note "round-4 final queue complete ($(left)s before deadline)"
