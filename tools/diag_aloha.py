#!/usr/bin/env python
"""Closed-loop failure diagnostics for the ALOHA transfer-cube policy.

Rolls the trained policy AND the scripted expert from identical resets
(engine.run_data_collection / run_scripted_collection share the reset rng
tree), then reports per-episode stage timelines (touch / lift / handoff /
success), cube motion, and gripper command traces, and writes wrist-camera
videos of both runs side by side. Usage:

    python tools/diag_aloha.py run_dir=experiments/aloha_phys2/ldp \
        ckpt_step=60000 n_episodes=16 out_dir=/tmp/diag_aloha
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from latent_diffusion_planning_tpu.utils.runtime import setup as _setup_runtime
_setup_runtime()

import jax
import numpy as np
import yaml

from latent_diffusion_planning_tpu.rollout import engine
from latent_diffusion_planning_tpu.train.checkpoint import (
    Checkpointer, apply_params_snapshot)
from latent_diffusion_planning_tpu.utils.config import (_configify,
                                                        _parse_value,
                                                        instantiate,
                                                        parse_cli, resolve)
from latent_diffusion_planning_tpu.utils.media import save_video


def stage_times(rewards: np.ndarray) -> dict:
    """First step index at which each reward stage is reached (-1 = never)."""
    out = {}
    for stage in (1, 2, 3, 4):
        hit = rewards >= stage
        out[f"t_stage{stage}"] = int(np.argmax(hit)) if hit.any() else -1
    return out


def main(argv=None) -> None:
    _, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    # seed default matches tools/eval_bc.py: the rollout rng below is
    # fold_in(PRNGKey(seed), ckpt_step), so these n_episodes ARE the first n
    # episodes of the protocol eval sweep at this checkpoint — diagnosis
    # evidence and protocol numbers line up (VERDICT r4 weak 4)
    cfg = _configify({"run_dir": "experiments/aloha_phys2/ldp",
                      "ckpt_step": 60000, "n_episodes": 16,
                      "video_eps": 4, "seed": 1111111,
                      "out_dir": "/tmp/diag_aloha"})
    for ov in overrides:
        k, v = ov.split("=", 1)
        cfg[k] = _parse_value(v)

    run_dir = Path(cfg.run_dir)
    run_cfg = _configify(yaml.safe_load((run_dir / "config.yaml").read_text()))
    resolve(run_cfg)

    data = instantiate(run_cfg.data)
    batch = next(data.train_dataloader())
    agent_cfg = dict(run_cfg.agent)
    agent_cfg.pop("vae_pretrain_path", None)
    if "obs_normalization" in agent_cfg:
        agent_cfg["obs_normalization"] = data.meta["obs_normalization"]
    agent = instantiate(agent_cfg, jax.random.PRNGKey(0), batch,
                        data.shape_meta)
    ckpt = Checkpointer(run_dir / "ckpt")
    agent = apply_params_snapshot(
        agent, ckpt.restore_raw(run_dir / "ckpt" / f"{cfg.ckpt_step}.ckpt"))

    env = instantiate(data.env_params["env"])
    meta = data.meta
    policy_keys = tuple(list(meta["lowdim_obs"]) + [
        (k[len("latent_"):] if k.startswith("latent_") else k)
        for k in meta["rgb_obs"] if k != "optimal"])

    n = int(cfg.n_episodes)
    rng = jax.random.fold_in(jax.random.PRNGKey(int(cfg.seed)),
                             int(cfg.ckpt_step))
    print(f"rolling policy ({n} episodes)...", flush=True)
    pol = engine.run_data_collection(
        env, agent, n, rng, obs_horizon=run_cfg.obs_horizon,
        action_horizon=run_cfg.action_horizon, policy_obs_keys=policy_keys,
        add_optimal="optimal" in meta["lowdim_obs"])
    print("rolling scripted expert (same resets)...", flush=True)
    exp = engine.run_scripted_collection(env, n, rng)

    out_dir = Path(cfg.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    hdr = (f"{'ep':>3} {'spawn_xy':>16} | "
           f"{'POL t1':>6} {'t2':>5} {'t3':>5} {'t4':>5} {'maxR':>4} "
           f"{'cube_dz':>8} {'disp_xy':>8} | {'EXP t1':>6} {'t4':>5}")
    print(hdr)
    rows = []
    for i in range(n):
        pr, er = pol["rewards"][i], exp["rewards"][i]
        pstg, estg = stage_times(pr), stage_times(er)
        cube = pol["obs"]["env_state"][i][:, :3]
        cube0 = exp["obs"]["env_state"][i][0, :3]
        dz = float(cube[:, 2].max() - cube[0, 2])
        dxy = float(np.linalg.norm(cube[-1, :2] - cube[0, :2]))
        row = dict(ep=i, spawn=cube0.tolist(), pol=pstg, exp=estg,
                   pol_max_r=float(pr.max()), cube_dz=dz, cube_dxy=dxy)
        rows.append(row)
        print(f"{i:>3} [{cube0[0]:+.3f},{cube0[1]:+.3f}] | "
              f"{pstg['t_stage1']:>6} {pstg['t_stage2']:>5} "
              f"{pstg['t_stage3']:>5} {pstg['t_stage4']:>5} "
              f"{pr.max():>4.0f} {dz:>8.3f} {dxy:>8.3f} | "
              f"{estg['t_stage1']:>6} {estg['t_stage4']:>5}")

    p_succ = np.mean([r["pol"]["t_stage4"] >= 0 for r in rows])
    e_succ = np.mean([r["exp"]["t_stage4"] >= 0 for r in rows])
    print(f"\npolicy success {p_succ:.1%} | expert success {e_succ:.1%}")

    # gripper command traces: right gripper action dim 13, qpos dim 13
    ga = pol["actions"][:, :, 13]
    gq = pol["obs"]["qpos"][:, :, 13]
    ega = exp["actions"][:, :, 13]
    np.savez(out_dir / "traces.npz",
             pol_rewards=pol["rewards"], exp_rewards=exp["rewards"],
             pol_cube=pol["obs"]["env_state"][:, :, :3],
             exp_cube=exp["obs"]["env_state"][:, :, :3],
             pol_qpos=pol["obs"]["qpos"], exp_qpos=exp["obs"]["qpos"],
             pol_actions=pol["actions"], exp_actions=exp["actions"])
    print(f"right-gripper cmd: policy mean {ga.mean():.3f} "
          f"(min {ga.min():.3f}) | expert mean {ega.mean():.3f}")
    print(f"right-gripper qpos: policy min {gq.min():.3f}")

    key = meta.get("rgb_viz", "wrist64_image")
    for i in range(min(int(cfg.video_eps), n)):
        both = np.concatenate([pol["obs"][key][i], exp["obs"][key][i]],
                              axis=2)  # side by side
        save_video(out_dir / f"ep{i}_pol_vs_exp.mp4", both, fps=25)
    print(f"videos + traces -> {out_dir}")


if __name__ == "__main__":
    main()
