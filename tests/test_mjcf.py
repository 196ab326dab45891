"""MJCF importer: synthetic-fixture parser tests + reference-asset
integration (the latter runs only where the reference repo is mounted)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_planning_tpu.envs import mjcf
from latent_diffusion_planning_tpu.envs.physics import kinematics as K

REF_XML = Path("/root/reference/envs/assets/bimanual_viperx_transfer_cube.xml")

SYNTH = """
<mujoco>
  <worldbody>
    <body name="table" pos="0 0.6 0">
      <geom type="box" size="0.6 0.6 0.02" pos="0 0 0" rgba="0.2 0.2 0.2 1"
            name="table_top"/>
    </body>
    <body name="arm" pos="0.1 0.2 0">
      <body name="link1" pos="0 0 0.1">
        <joint name="j1" type="hinge" axis="0 0 1" range="-1.0 1.0"/>
        <body name="link2" pos="0.2 0 0" euler="1.5707963 0 0">
          <joint name="j2" type="hinge" axis="0 1 0" range="-2.0 0.5"/>
          <body name="finger" pos="0.1 0 0">
            <joint name="f1" type="slide" axis="0 1 0" range="0.0 0.05"/>
            <geom type="box" size="0.01 0.01 0.02"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="j1" kp="100" ctrlrange="-0.9 0.9"/>
    <position joint="j2" kp="50" ctrlrange="-1.8 0.4"/>
  </actuator>
  <keyframe><key qpos="0 -0.5 0.01"/></keyframe>
</mujoco>
"""


@pytest.fixture()
def synth_model(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(SYNTH)
    return mjcf.parse_mjcf(p)


def test_parse_bodies_joints_geoms(synth_model):
    m = synth_model
    assert set(m.root_bodies) == {"table", "arm"}
    assert m.bodies["link1"].joints[0].type == "hinge"
    assert m.bodies["finger"].joints[0].type == "slide"
    np.testing.assert_allclose(m.bodies["link2"].pos, [0.2, 0, 0])
    # euler → quat: 90° about x
    np.testing.assert_allclose(m.bodies["link2"].quat,
                               [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0],
                               atol=1e-6)
    assert len(m.keyframes) == 1 and m.keyframes[0].shape == (3,)


def test_chain_from_synth(synth_model):
    chain = mjcf.chain_from_mjcf(synth_model, "arm",
                                 tip_offset=[0.05, 0.0, 0.0])
    assert chain.axes.shape == (2, 3)   # slide finger ends the chain
    # FK at the keyframe pose stays finite and respects the base offset
    pos, quat = K.eef_pose(chain, jnp.asarray([0.0, -0.5]))
    assert np.isfinite(np.asarray(pos)).all()
    lo, hi = mjcf.chain_joint_limits(synth_model, "arm")
    np.testing.assert_allclose(lo, [-0.9, -1.8])
    np.testing.assert_allclose(hi, [0.9, 0.4])


def test_static_scene_prims(synth_model):
    prims = mjcf.static_scene_prims(synth_model)
    assert len(prims) == 1
    np.testing.assert_allclose(prims[0]["pos"], [0, 0.6, 0])
    np.testing.assert_allclose(prims[0]["half"], [0.6, 0.6, 0.02])


@pytest.mark.skipif(not REF_XML.exists(),
                    reason="reference assets not mounted")
class TestReferenceAssets:
    """The transcribed ALOHA constants must match the actual MJCF assets."""

    @pytest.fixture(scope="class")
    def model(self):
        return mjcf.parse_mjcf(REF_XML)

    def test_viperx_chain_matches_transcription(self, model):
        from latent_diffusion_planning_tpu.envs import aloha_base as B

        chain = mjcf.chain_from_mjcf(model, "vx300s_left",
                                     tip_offset=[0.112, 0, 0])
        np.testing.assert_allclose(np.asarray(chain.offsets),
                                   np.asarray(B.LEFT_CHAIN.offsets), atol=1e-6)
        np.testing.assert_allclose(np.asarray(chain.axes),
                                   np.asarray(B.LEFT_CHAIN.axes), atol=1e-6)
        np.testing.assert_allclose(np.asarray(chain.base_pos),
                                   np.asarray(B.LEFT_CHAIN.base_pos),
                                   atol=1e-6)
        # FK through the imported chain matches the transcribed one at the
        # start pose (link_quats are identity in these assets)
        from latent_diffusion_planning_tpu.envs import aloha_constants as C
        p0, _ = K.eef_pose(chain, C.START_ARM_QPOS)
        p1, _ = K.eef_pose(B.LEFT_CHAIN, C.START_ARM_QPOS)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)

    def test_actuator_kp_and_limits(self, model):
        from latent_diffusion_planning_tpu.envs import aloha_constants as C

        lo, hi = mjcf.chain_joint_limits(model, "vx300s_left")
        np.testing.assert_allclose(lo, np.asarray(C.ARM_JOINT_LO), atol=1e-5)
        np.testing.assert_allclose(hi, np.asarray(C.ARM_JOINT_HI), atol=1e-5)
        kps = [a.kp for a in model.actuators
               if a.joint and a.joint.startswith("vx300s_left")][:6]
        np.testing.assert_allclose(kps, np.asarray(C.ARM_KP))

    def test_keyframe_matches_start_pose(self, model):
        from latent_diffusion_planning_tpu.envs import aloha_constants as C

        key = model.keyframes[0]
        np.testing.assert_allclose(key[:6], np.asarray(C.START_ARM_QPOS),
                                   atol=1e-6)

    def test_mesh_bboxes_and_cube(self, model):
        box = model.bodies["box"].geoms[0]
        np.testing.assert_allclose(box.size, [0.02, 0.02, 0.02])
        assert "vx300s_1_base" in model.meshes
        center, half = model.meshes["vx300s_1_base"]
        assert (half > 0).all() and (half < 0.2).all()

    def test_wrist64_camera(self, model):
        cams = {c.name: c for b in model.bodies.values() for c in b.cameras}
        assert "wrist64" in cams
        np.testing.assert_allclose(cams["wrist64"].pos, [-0.1, 0, 0.15])
        assert cams["wrist64"].fovy == 78.0
