"""Lift env + fused rollout engine tests (CPU, small sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs.lift import (LIFT_SHAPE_META, LiftEnv,
                                                     TABLE_Z)
from latent_diffusion_planning_tpu.rollout import engine

pytestmark = pytest.mark.slow  # compile-heavy: run with -m "not slow" for the fast tier


@pytest.fixture(scope="module")
def env():
    return LiftEnv(render_images=False, episode_len=80)


def test_reset_deterministic(env):
    s1, o1 = env.reset(jax.random.PRNGKey(5))
    s2, o2 = env.reset(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(s1.cube_pos), np.asarray(s2.cube_pos))
    s3, _ = env.reset(jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(s1.cube_pos), np.asarray(s3.cube_pos))
    assert o1["robot0_eef_pos"].shape == (3,)
    assert o1["object"].shape == (10,)


def test_step_moves_eef(env):
    state, _ = env.reset(jax.random.PRNGKey(0))
    a = jnp.asarray([1.0, 0.0, 0.0, 0, 0, 0, -1.0])
    new, obs, r, s = env.step(state, a)
    assert float(new.eef_pos[0]) > float(state.eef_pos[0])
    assert not bool(s)


def test_scripted_expert_succeeds(env):
    """The waypoint expert must solve Lift from random resets."""
    out = engine.run_scripted_collection(env, 8, jax.random.PRNGKey(1),
                                         episode_len=80)
    success_rate = float(np.asarray(out["success"]).any(axis=1).mean())
    assert success_rate == 1.0, f"scripted expert only {success_rate:.0%}"
    # cube ends well above the table
    assert out["actions"].shape == (8, 80, 7)


def test_vmapped_batch_step(env):
    rngs = jax.random.split(jax.random.PRNGKey(0), 16)
    states, obs = jax.vmap(env.reset)(rngs)
    assert obs["robot0_eef_pos"].shape == (16, 3)
    acts = jnp.zeros((16, 7))
    new_states, obs2, r, s = jax.vmap(env.step)(states, acts)
    assert r.shape == (16,) and s.shape == (16,)


def test_render_images():
    env = LiftEnv(render_images=True, episode_len=10, image_size=32)
    _, obs = env.reset(jax.random.PRNGKey(0))
    img = np.asarray(obs["agentview_image"])
    assert img.shape == (32, 32, 3)
    assert img.min() >= 0 and img.max() <= 255
    assert img.std() > 5  # not a constant frame
    # cube visible: red channel dominates somewhere
    redness = img[..., 0].astype(float) - img[..., 1].astype(float)
    assert redness.max() > 40, "red cube not visible in render"


def test_batched_eval_with_scripted_policy(env):
    """Engine semantics: early stop at success, sticky success, horizon."""

    def scripted_policy(agent, obs_window, rng):
        del agent, rng
        # decode task state from obs — replays the expert through the
        # *engine's* obs-window interface with 4-step action chunks
        eef = obs_window["robot0_eef_pos"][:, -1]
        obj = obs_window["object"][:, -1]
        grip0 = obs_window["robot0_gripper_qpos"][:, -1, 0]
        cube = obj[:, :3]
        dist = jnp.linalg.norm(cube - eef, axis=-1)
        closed = grip0 < 0.0296  # gripper fraction < 0.4
        grasped = (dist < 0.005) & closed
        above = cube + jnp.asarray([0.0, 0.0, 0.08])
        lift_to = cube.at[:, 2].set(TABLE_Z + 0.18)
        xy_near = jnp.linalg.norm(cube[:, :2] - eef[:, :2], axis=-1) < 0.01
        z_near = jnp.abs(cube[:, 2] - eef[:, 2]) < 0.012
        target = jnp.where(grasped[:, None], lift_to,
                           jnp.where(xy_near[:, None], cube, above))
        # spread the move over the 4-step chunk to avoid overshoot
        delta = jnp.clip((target - eef) / (0.05 * 4), -1, 1)
        close = jnp.where(grasped | (xy_near & z_near), 1.0, -1.0)
        act = jnp.concatenate([delta, jnp.zeros((delta.shape[0], 3)),
                               close[:, None]], axis=-1)
        return jnp.repeat(act[:, None], 4, axis=1)  # action chunk

    out = engine.run_batched_eval(env, agent=None, n_episodes=8,
                                  rng=jax.random.PRNGKey(2), obs_horizon=1,
                                  action_horizon=4, episode_len=80,
                                  policy=scripted_policy)
    m = out["metrics"]
    assert m["success"] == 1.0, m
    assert m["horizon"] < 80  # early termination at success
    assert m["reward"] > 0


def test_eval_deterministic_given_rng(env):
    def zero_policy(agent, obs, rng):
        B = obs["robot0_eef_pos"].shape[0]
        return jnp.zeros((B, 4, 7))

    o1 = engine.run_batched_eval(env, None, 4, jax.random.PRNGKey(3),
                                 action_horizon=4, episode_len=12,
                                 policy=zero_policy)
    o2 = engine.run_batched_eval(env, None, 4, jax.random.PRNGKey(3),
                                 action_horizon=4, episode_len=12,
                                 policy=zero_policy)
    np.testing.assert_array_equal(o1["per_episode"]["reward"],
                                  o2["per_episode"]["reward"])


def test_collection_shapes_and_writer(env, tmp_path):
    from latent_diffusion_planning_tpu.data import ingest
    from latent_diffusion_planning_tpu.data.writer import write_trajectories

    out = engine.run_scripted_collection(env, 4, jax.random.PRNGKey(4),
                                         episode_len=40)
    assert out["actions"].shape == (4, 40, 7)
    assert out["obs"]["robot0_eef_pos"].shape == (4, 40, 3)

    n = write_trajectories(tmp_path / "demos.hdf5", out,
                           env_meta={"env_name": "DeviceLift"},
                           successful_only=True)
    assert n >= 1
    w = ingest.load_robomimic(tmp_path / "demos.hdf5",
                              ["robot0_eef_pos", "object"])
    assert w.n_demos == n
    assert w.arrays["robot0_eef_pos"].shape == (n * 41, 3)
    assert w.env_meta["env_name"] == "DeviceLift"


def test_video_capture(env):
    def zero_policy(agent, obs, rng):
        B = obs["robot0_eef_pos"].shape[0]
        return jnp.zeros((B, 4, 7))

    venv = LiftEnv(render_images=True, episode_len=8, image_size=16)
    out = engine.run_batched_eval(venv, None, 4, jax.random.PRNGKey(0),
                                  action_horizon=4, episode_len=8,
                                  policy=zero_policy, video_envs=2)
    assert out["videos"].shape == (2, 8, 16, 16, 3)
    assert out["videos"].dtype == np.uint8


def test_blowup_containment():
    """Non-finite rewards terminate the episode (parity: the reference wraps
    env.step and treats physics blow-ups as termination,
    aloha_env_utils.py:112-116)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from latent_diffusion_planning_tpu.rollout import engine

    class BlowupEnv:
        obs_keys = ("x",)
        action_dim = 2
        episode_len = 20
        max_reward = 1.0

        def reset(self, rng):
            state = {"t": jnp.zeros((), jnp.int32)}
            return state, self.obs(state)

        def step(self, state, action):
            t = state["t"] + 1
            state = {"t": t}
            r = jnp.where(t >= 5, jnp.nan, 1.0)   # blow up at step 5
            return state, self.obs(state), r, jnp.zeros((), bool)

        def obs(self, state):
            return {"x": jnp.ones((2,)) * state["t"]}

    def policy(agent, obs_window, rng):
        B = obs_window["x"].shape[0]
        return jnp.zeros((B, 4, 2))

    out = engine.run_batched_eval(BlowupEnv(), None, 4, jax.random.PRNGKey(0),
                                  obs_horizon=1, action_horizon=4,
                                  episode_len=20, policy=policy)
    assert (np.asarray(out["per_episode"]["horizon"]) == 5).all()
    assert not np.asarray(out["per_episode"]["success"]).any()
    # rewards stop accumulating at the blow-up (4 finite steps of 1.0);
    # episode reward is the per-step MAX (reference stage convention),
    # reward_sum the pre-blow-up cumulative sum
    np.testing.assert_allclose(np.asarray(out["per_episode"]["reward"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(out["per_episode"]["reward_sum"]), 4.0)


def test_scripted_collection_hostloop_matches_scan():
    """host_loop=True consumes the same rng tree as the fused scan — byte-
    identical trajectories (the CPU-compile escape hatch must not change
    data)."""
    import numpy as np
    from latent_diffusion_planning_tpu.envs.lift import LiftEnv
    from latent_diffusion_planning_tpu.rollout import engine

    env = LiftEnv(image_size=16, render_images=True, episode_len=8)
    rng = jax.random.PRNGKey(5)
    a = engine.run_scripted_collection(env, 3, rng, episode_len=8,
                                       host_loop=False)
    b = engine.run_scripted_collection(env, 3, rng, episode_len=8,
                                       host_loop=True)
    for k in ("actions", "rewards", "success"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
    for k in a["obs"]:
        np.testing.assert_allclose(a["obs"][k], b["obs"][k], atol=1e-5,
                                   err_msg=k)


def test_data_collection_hostloop_matches_scan():
    """run_data_collection host loop consumes the same rng tree as the
    fused scan (policy + action-noise draws included)."""
    import numpy as np
    from latent_diffusion_planning_tpu.envs.lift import LiftEnv
    from latent_diffusion_planning_tpu.rollout import engine

    env = LiftEnv(image_size=16, render_images=False, episode_len=8)

    def policy(agent, view, rng):
        n = view["robot0_eef_pos"].shape[0]
        base = -view["robot0_eef_pos"][:, -1]  # drive toward origin
        acts = jnp.concatenate(
            [base, jnp.zeros((n, 4))], axis=-1)[:, None, :]
        return jnp.tile(acts, (1, 4, 1))

    kw = dict(obs_horizon=2, action_horizon=4, episode_len=8,
              action_noise=0.1, policy=policy)
    a = engine.run_data_collection(env, None, 3, jax.random.PRNGKey(7),
                                   host_loop=False, **kw)
    b = engine.run_data_collection(env, None, 3, jax.random.PRNGKey(7),
                                   host_loop=True, **kw)
    for k in ("actions", "rewards", "success"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
    for k in a["obs"]:
        np.testing.assert_allclose(a["obs"][k], b["obs"][k], atol=1e-5,
                                   err_msg=k)


def test_plan_blend_temporal_ensemble():
    """plan_blend executes (1-w)*new + w*previous-plan-tail on the overlap.

    With a policy that always emits plan[j] = j (j = 0..7) and
    action_horizon 4: decision 1 executes [0,1,2,3] unblended (no previous
    plan); decision 2's overlap-aligned previous tail is [4,5,6,7], so it
    executes (1-w)*[0,1,2,3] + w*[4,5,6,7].
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from latent_diffusion_planning_tpu.rollout import engine

    class RewardEchoEnv:
        obs_keys = ("x",)
        action_dim = 1
        episode_len = 8
        max_reward = 100.0

        def reset(self, rng):
            state = {"t": jnp.zeros((), jnp.int32)}
            return state, self.obs(state)

        def step(self, state, action):
            state = {"t": state["t"] + 1}
            return state, self.obs(state), action[0], jnp.zeros((), bool)

        def obs(self, state):
            return {"x": jnp.ones((2,))}

    def policy(agent, obs_window, rng):
        B = obs_window["x"].shape[0]
        return jnp.tile(jnp.arange(8.0)[None, :, None], (B, 1, 1))

    def total_reward(w):
        # reward_sum (not the stage-max "reward") probes every executed
        # action, which is what blending changes
        out = engine.run_batched_eval(
            RewardEchoEnv(), None, 3, jax.random.PRNGKey(0), obs_horizon=1,
            action_horizon=4, episode_len=8, plan_blend=w, policy=policy)
        return np.asarray(out["per_episode"]["reward_sum"])

    np.testing.assert_allclose(total_reward(0.0), 12.0)       # 6 + 6
    np.testing.assert_allclose(total_reward(0.5), 20.0)       # 6 + 3 + 11


def test_collection_step_rngs_block_structure():
    from latent_diffusion_planning_tpu.rollout.engine import (
        _collection_step_rngs)
    keys = _collection_step_rngs(jax.random.PRNGKey(0), 10, 4)
    assert keys.shape == (10, 2)
    k = np.asarray(keys)
    # held within blocks of 4, fresh draw at block boundaries
    assert (k[0] == k[3]).all() and (k[4] == k[7]).all()
    assert not (k[3] == k[4]).all()
    # hold=1 reproduces the plain per-step split bit-exactly
    k1 = np.asarray(_collection_step_rngs(jax.random.PRNGKey(0), 6, 1))
    ref = np.asarray(jax.random.split(jax.random.PRNGKey(0), 6))
    assert (k1 == ref).all()


def test_clean_labels_same_states_clean_actions():
    """clean_labels=True: identical executed trajectories (same rng tree),
    recorded actions are the expert's noise-free labels."""
    env = LiftEnv(render_images=False, episode_len=12)
    rng = jax.random.PRNGKey(7)
    noisy = engine.run_scripted_collection(env, 4, rng, episode_len=12,
                                           noise=0.05, noise_hold=3)
    clean = engine.run_scripted_collection(env, 4, rng, episode_len=12,
                                           noise=0.05, noise_hold=3,
                                           clean_labels=True)
    # same executed path -> same visited obs / rewards
    for k in clean["obs"]:
        np.testing.assert_allclose(np.asarray(clean["obs"][k]),
                                   np.asarray(noisy["obs"][k]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(clean["rewards"]),
                               np.asarray(noisy["rewards"]), atol=1e-6)
    # labels differ from the executed-noisy recording by the injected draw
    diff = np.asarray(noisy["actions"]) - np.asarray(clean["actions"])
    assert np.abs(diff).max() > 1e-3
    # the held draw is constant within noise_hold blocks
    np.testing.assert_allclose(diff[:, 0], diff[:, 1], atol=1e-6)
    np.testing.assert_allclose(diff[:, 0], diff[:, 2], atol=1e-6)
    assert np.abs(diff[:, 2] - diff[:, 3]).max() > 1e-4


def test_writer_trim_success_margin(env, tmp_path):
    from latent_diffusion_planning_tpu.data import ingest
    from latent_diffusion_planning_tpu.data.writer import write_trajectories

    out = engine.run_scripted_collection(env, 4, jax.random.PRNGKey(4),
                                         episode_len=60)
    succ = np.asarray(out["success"])
    assert succ.any(axis=1).all()
    first = succ.argmax(axis=1)
    n = write_trajectories(tmp_path / "trim.hdf5", out,
                           env_meta={"env_name": "DeviceLift"},
                           successful_only=True, trim_success_margin=5)
    import h5py
    with h5py.File(tmp_path / "trim.hdf5", "r") as f:
        for d, i in enumerate(np.nonzero(succ.any(axis=1))[0]):
            g = f["data"][f"demo_{d}"]
            want = min(60, int(first[i]) + 1 + 5)
            assert g.attrs["num_samples"] == want
            assert g["actions"].shape[0] == want
            assert g["obs/robot0_eef_pos"].shape[0] == want
    # variable-length demos weld fine
    w = ingest.load_robomimic(tmp_path / "trim.hdf5", ["robot0_eef_pos"])
    assert w.n_demos == n


def test_collection_episode_seed_addressability(env):
    """Episode i of a batch collection == a 1-episode collection with
    episode_seeds=[i] — the per-episode reset derivation shared with
    run_batched_eval (fold_in(reset_rng, seed))."""
    rng = jax.random.PRNGKey(9)
    full = engine.run_scripted_collection(env, 4, rng, episode_len=6)
    one = engine.run_scripted_collection(env, 1, rng, episode_len=6,
                                         episode_seeds=[2])
    np.testing.assert_array_equal(full["first_obs"]["robot0_eef_pos"][2],
                                  one["first_obs"]["robot0_eef_pos"][0])
    np.testing.assert_allclose(full["obs"]["object"][2, 0],
                               one["obs"]["object"][0, 0], atol=1e-6)


def test_collection_resets_match_eval_protocol(env):
    """run_data_collection draws the SAME spawns as run_batched_eval from
    the same rng (VERDICT r4 weak 4: diagnosis evidence must line up with
    protocol evals): both split off reset_rng then fold in the default
    arange episode seeds — reconstruct the eval derivation explicitly and
    pin the collection's first_obs to it."""
    def zero_policy(agent, obs, rng):
        B = obs["robot0_eef_pos"].shape[0]
        return jnp.zeros((B, 4, 7))

    rng = jax.random.PRNGKey(11)
    col = engine.run_data_collection(env, None, 4, rng, action_horizon=4,
                                     episode_len=12, policy=zero_policy)
    reset_rng, _ = jax.random.split(rng)
    _, obs = jax.vmap(env.reset)(
        engine._reset_rngs(reset_rng, jnp.arange(4, dtype=jnp.int32)))
    np.testing.assert_allclose(np.asarray(obs["robot0_eef_pos"]),
                               col["first_obs"]["robot0_eef_pos"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs["object"]),
                               col["first_obs"]["object"], atol=1e-6)


def test_multi_ckpt_eval_matches_single(env):
    """run_batched_eval_multi (vmapped K-checkpoint sweep) reproduces the
    per-checkpoint run_batched_eval results for the same (agent, rng)."""
    import flax.struct

    class Toy(flax.struct.PyTreeNode):
        scale: jnp.ndarray

    def policy(agent, obs, rng):
        B = obs["robot0_eef_pos"].shape[0]
        return jnp.ones((B, 4, 7)) * agent.scale

    agents = [Toy(scale=jnp.asarray(0.05)), Toy(scale=jnp.asarray(-0.05))]
    rngs = [jax.random.PRNGKey(1), jax.random.PRNGKey(2)]
    multi = engine.run_batched_eval_multi(env, agents, 3, rngs,
                                          action_horizon=4, episode_len=8,
                                          policy=policy)
    for agent, rng, m in zip(agents, rngs, multi):
        single = engine.run_batched_eval(env, agent, 3, rng,
                                         action_horizon=4, episode_len=8,
                                         policy=policy)
        np.testing.assert_allclose(m["per_episode"]["reward"],
                                   single["per_episode"]["reward"],
                                   atol=1e-5)
        np.testing.assert_allclose(m["per_episode"]["horizon"],
                                   single["per_episode"]["horizon"])
