#!/bin/bash
# Round-4 FINAL queue — single chip, strictly sequential, deadline-aware.
# Replaces queue2/queue3 (which would have double-run the same stages and
# collided with the in-flight phys3 pipeline on the chip).
#
# Every stage is gated on (a) its prerequisite artifacts and (b) enough
# wall-clock left before DEADLINE_TS; the last admitted stage is clamped
# with `timeout` so the chip is free when the driver's bench capture runs.
# Priority order = VERDICT r3: phys3 eval (#1) -> lift pipeline (prereq)
# -> mixed study (#2) -> roundtrip (#6, cheap) -> baselines (#4) -> can (#3,
# only if a large window remains).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE_TS=${DEADLINE_TS:-1787131500}
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

# ---- 0. wait out the in-flight phys3 pipeline --------------------------
if [ -f /tmp/phys3.pid ]; then
  pid=$(cat /tmp/phys3.pid 2>/dev/null || echo "")
  while [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
note "phys3 pipeline done"

# ---- 1. phys3 eval at the VERDICT protocol (256 eps) -------------------
if [ -d experiments/aloha_phys3/ldp/ckpt ]; then
  admit phys3_eval 600 python tools/eval_bc.py run_dir=experiments/aloha_phys3/ldp \
    'ckpt_steps=[30000,40000,50000,60000]' n_eval_episodes=256 \
    > logs/aloha_phys3_eval256.log 2>&1 || true
  python tools/snapshot_run.py experiments/aloha_phys3/ldp || true
  best=$(python - <<'PYEOF'
import csv
try:
    rows = list(csv.DictReader(
        open("experiments/aloha_phys3/ldp/eval_sweep/eval.csv")))
    print(max((float(r["success"]) for r in rows if r.get("success")), default=0.0))
except Exception:
    print(0.0)
PYEOF
)
  note "phys3 best success=$best"
  # partial success -> eval-knob sweep can push it over; total failure ->
  # record the diagnosis evidence instead and move on
  if python -c "exit(0 if 0.02 < $best < 0.5 else 1)"; then
    admit phys3_sweep 900 env RUN=aloha_phys3 CKPT_STEP=60000 N_EVAL=256 \
      bash tools/run_aloha_knob_sweep.sh > logs/aloha_phys3_sweep.log 2>&1 || true
    python tools/snapshot_run.py experiments/aloha_phys3/ldp || true
  fi
fi

# ---- 2. lift pipeline (prereq for 3/5; refreshes assets/bench) ----------
admit pipeline3 1700 env RUN=pipeline3 bash tools/run_lift_pipeline.sh \
  > logs/pipeline3_r4.log 2>&1 || true

if [ -d experiments/pipeline3/vae/ckpt/4000.ckpt ]; then
  # ---- 3. mixed-data study at 512-episode evals (VERDICT #2) -----------
  # est = subopt corpus + ~2 arms: the script is per-arm idempotent and the
  # timeout clamp snapshots partial evidence, so a clamped run still pays
  admit mixed_study 1800 bash tools/run_lift_mixed_study.sh \
    > logs/mixed_study_r4.log 2>&1 || true
  # ---- 4. checkpoint round trip (VERDICT #6, cheap) --------------------
  admit roundtrip 700 bash tools/run_roundtrip_check.sh \
    > logs/roundtrip.log 2>&1 || true
  # ---- 5. baselines matrix at a 20k budget (VERDICT #4) ----------------
  admit baselines 800 env STEPS=20000 bash tools/run_lift_baselines.sh \
    > logs/baselines_r4.log 2>&1 || true
fi

# ---- 6. contact-physics Can pipeline (VERDICT #3, big window only) -----
admit can_pipeline 2600 bash tools/run_can_pipeline.sh \
  > logs/can_pipeline.log 2>&1 || true

# final sweep: persist whatever the timeout clamp cut off
for d in experiments/*/; do
  for r in "$d"*/; do
    [ -f "$r/config.yaml" ] && python tools/snapshot_run.py "$r" || true
  done
done
note "round-4 final queue complete ($(left)s before deadline)"
