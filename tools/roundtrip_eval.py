#!/usr/bin/env python
"""Rollout-score the reference-naming checkpoint round trip (VERDICT r3 #6).

Loads the committed bench policy (assets/bench/), applies the
export→reference-naming→import round-tripped planner/IDM params on top, and
scores BOTH agents with the fused eval engine on identical seeds. The rename
maps are bijective (tests/test_transfer.py), so the success delta must be
exactly 0 — this closes the loop end-to-end at the *rollout* level, the
protocol a real reference checkpoint import would follow
(reference train_bc.py:210-240 restore semantics).

Usage: python tools/roundtrip_eval.py reimported=<ckpt> [n_episodes=512]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax
import numpy as np

import bench
from latent_diffusion_planning_tpu.rollout import engine
from latent_diffusion_planning_tpu.train.checkpoint import (
    Checkpointer, apply_params_snapshot)


def main(argv=None) -> None:
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    reimported = Path(args["reimported"])
    n_episodes = int(args.get("n_episodes", 512))
    episode_len = int(args.get("episode_len", 400))

    env, agent, keys, _ = bench.build_from_checkpoint(episode_len)
    snap = Checkpointer(reimported.parent).restore_raw(reimported)
    rt_agent = apply_params_snapshot(
        agent, snap, restore_keys=["planner_params", "idm_params"])

    # sanity: the round trip must be bit-exact on every param leaf
    for a, b in zip(jax.tree.leaves(agent.planner_state.params),
                    jax.tree.leaves(rt_agent.planner_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    results = {}
    for tag, pol in (("original", agent), ("roundtrip", rt_agent)):
        out = engine.run_batched_eval(
            env, pol, n_episodes, jax.random.PRNGKey(7),
            obs_horizon=int(pol.config.obs_horizon),
            action_horizon=int(pol.config.action_horizon),
            episode_len=episode_len, policy_obs_keys=keys)
        results[tag] = round(float(out["metrics"]["success"]), 4)
    results["delta_pp"] = round(
        abs(results["original"] - results["roundtrip"]) * 100, 2)
    results["n_episodes"] = n_episodes
    print(json.dumps(results))


if __name__ == "__main__":
    main()
