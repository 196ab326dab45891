#!/bin/bash
# Checkpoint-transfer round trip (VERDICT r3 #6): export the committed bench
# policy through the reference parameter naming, re-import it, and
# rollout-score original vs round-tripped on identical seeds. The rename
# maps are bijective, so the required <1pp delta is exactly 0 by
# construction — asserted at the param level AND at the rollout level.
set -e
cd "$(dirname "$0")/.."
DOWN_DIMS=$(python - <<'PYEOF'
import yaml
cfg = yaml.safe_load(open("assets/bench/config.yaml"))
print(str(list(cfg["agent"]["planner"]["down_dims"])).replace(" ", ""))
PYEOF
)
python tools/export_reference_ckpt.py src=assets/bench/agent.ckpt \
  dst=experiments/roundtrip/ref_format.ckpt "planner_down_dims=$DOWN_DIMS"
python tools/import_reference_ckpt.py src=experiments/roundtrip/ref_format.ckpt \
  dst=experiments/roundtrip/reimported.ckpt "planner_down_dims=$DOWN_DIMS"
mkdir -p assets/runs/roundtrip
python tools/roundtrip_eval.py reimported=experiments/roundtrip/reimported.ckpt \
  n_episodes=512 | tee assets/runs/roundtrip/result.json
