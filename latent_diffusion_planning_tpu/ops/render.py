"""On-device analytic renderer: batched 64×64 camera frames from primitives.

TPU-native replacement for the reference's offscreen EGL/MuJoCo rendering
(envs/robosuite_env.py:42-48 render plumbing; envs/alohasim_env.py:102-114
multi-camera get_observation). Instead of a GL rasterizer on the host, scenes
are described as oriented box/sphere/plane primitives and rendered by analytic
ray casting — per pixel a closed-form slab/quadric intersection against every
primitive, nearest hit wins, Lambert shading with directional lights. That is
pure fused element-wise math + a tiny reduction over primitives: ideal VPU
work, trivially vmapped over envs, and it lives inside the same jitted
rollout step as physics and policy (zero host round-trips).

Conventions: right-handed world, +z up; camera looks along -z of its frame;
images returned HWC float32 in [0, 255] (uint8-compatible range, matching the
reference datasets' 0-255 pixel statistics).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

BIG = 1e9


class Scene(flax.struct.PyTreeNode):
    """Batched primitive soup (leading axis = primitive index).

    kind: 0 = box (half-extents in size), 1 = sphere (radius in size[0]),
    2 = convex polytope (body-frame half-spaces in ``planes``; mesh-accurate
    rendering — k-DOPs fitted to the reference STL vertices, envs/mjcf.py).
    The ground plane is implicit (z = plane_z).

    ``planes`` is None for primitive-only scenes, else (P, K, 4) rows
    (nx, ny, nz, d) meaning inside ⇔ n·x ≤ d in the body frame. Padding rows
    are (0, 0, 0, 1): always satisfied, constrain nothing. Rows are ignored
    for kind ≠ 2 primitives.
    """

    pos: jnp.ndarray        # (P, 3)
    rot: jnp.ndarray        # (P, 3, 3) world-from-body
    size: jnp.ndarray       # (P, 3)
    color: jnp.ndarray      # (P, 3) in [0, 1]
    kind: jnp.ndarray       # (P,) int32
    plane_z: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros(()))
    plane_color: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.asarray([0.45, 0.45, 0.5]))
    planes: jnp.ndarray | None = None   # (P, K, 4) body-frame half-spaces


class Camera(NamedTuple):
    pos: jnp.ndarray        # (3,)
    lookat: jnp.ndarray     # (3,)
    up: jnp.ndarray         # (3,)
    fov_deg: float          # vertical field of view


def look_at(pos, lookat, up=(0.0, 0.0, 1.0)) -> Camera:
    return Camera(jnp.asarray(pos, jnp.float32), jnp.asarray(lookat, jnp.float32),
                  jnp.asarray(up, jnp.float32), 45.0)


def _camera_rays(cam: Camera, height: int, width: int):
    fwd = cam.lookat - cam.pos
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, cam.up)
    # degenerate look-at (view direction parallel to up, e.g. a straight-down
    # overhead camera): fall back to the world axis LEAST aligned with fwd —
    # a fixed +y hint is itself degenerate for ±y view directions (ADVICE r4)
    axis = jnp.argmin(jnp.abs(fwd))
    alt = jnp.cross(fwd, jax.nn.one_hot(axis, 3, dtype=fwd.dtype))
    right = jnp.where(jnp.linalg.norm(right) > 1e-6, right, alt)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)

    half_h = jnp.tan(jnp.deg2rad(cam.fov_deg) / 2.0)
    half_w = half_h * (width / height)
    ys = jnp.linspace(-half_h, half_h, height)
    xs = jnp.linspace(-half_w, half_w, width)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    dirs = (fwd[None, None] + xx[..., None] * right[None, None]
            + yy[..., None] * down[None, None])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs  # (H, W, 3)


def _ray_box(origin, direction, pos, rot, half):
    """Slab test in box frame → (t_hit, normal_world); misses get t=BIG."""
    o = (origin - pos) @ rot           # to body frame
    d = direction @ rot
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-4)
    t_hit = jnp.where(t_near > 1e-4, t_near, t_far)
    t_hit = jnp.where(hit, t_hit, BIG)
    # normal: axis of the entering slab
    axis = jnp.argmax(tmin, axis=-1)
    n_body = -jnp.sign(d) * jax.nn.one_hot(axis, 3, dtype=origin.dtype)
    n_world = n_body @ rot.T
    return t_hit, n_world


def _ray_convex(origin, direction, pos, rot, planes):
    """Ray vs convex polytope given as body-frame half-spaces n·x ≤ d.

    The generalized slab test: every half-space clips the ray parameter to
    [t_k, ∞) (entering, n·dir < 0) or (-∞, t_k] (exiting, n·dir > 0); the
    intersection interval is [max entering, min exiting]. Padding rows
    (0,0,0,1) constrain nothing. Misses get t = BIG. Pure fused VPU math,
    K× the box slab cost — mesh-accurate silhouettes for ~9 ops/plane.
    """
    o = (origin - pos) @ rot            # to body frame
    d = direction @ rot
    n = planes[..., :3]                                  # (K, 3)
    off = planes[..., 3]                                 # (K,)
    ndotd = jnp.einsum("...c,kc->...k", d, n)            # (H, W, K)
    ndoto = jnp.einsum("...c,kc->...k", o, n)
    para = jnp.abs(ndotd) < 1e-9
    t_k = (off - ndoto) / jnp.where(para, 1e-9, ndotd)
    entering = ndotd < 0
    t_near = jnp.max(jnp.where(entering & ~para, t_k, -BIG), axis=-1)
    t_far = jnp.min(jnp.where(~entering & ~para, t_k, BIG), axis=-1)
    # a ray parallel to a violated half-space misses outright
    outside_para = jnp.any(para & (ndoto > off), axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-4) & ~outside_para
    t_hit = jnp.where(t_near > 1e-4, t_near, t_far)
    t_hit = jnp.where(hit, t_hit, BIG)
    # normal: the tightest entering half-space
    k_best = jnp.argmax(jnp.where(entering & ~para, t_k, -BIG), axis=-1)
    n_body = n[k_best]                                   # (H, W, 3)
    n_world = n_body @ rot.T
    return t_hit, n_world


def _ray_sphere(origin, direction, pos, radius):
    oc = origin - pos
    b = jnp.sum(oc * direction, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - c
    sq = jnp.sqrt(jnp.clip(disc, 0.0, None))
    t0 = -b - sq
    t1 = -b + sq
    t_hit = jnp.where(t0 > 1e-4, t0, t1)
    t_hit = jnp.where((disc > 0) & (t_hit > 1e-4), t_hit, BIG)
    p = origin + direction * t_hit[..., None]
    n = (p - pos) / jnp.maximum(radius, 1e-9)
    return t_hit, n


LIGHT_DIRS = jnp.asarray([[0.4, 0.2, -0.9], [-0.5, -0.3, -0.8],
                          [0.1, 0.6, -0.8]], jnp.float32)
LIGHT_COLORS = jnp.asarray([0.55, 0.35, 0.25], jnp.float32)
AMBIENT = 0.35


def render(scene: Scene, cam: Camera, height: int = 64,
           width: int = 64) -> jnp.ndarray:
    """Render one scene → (H, W, 3) float32 in [0, 255]."""
    dirs = _camera_rays(cam, height, width)          # (H, W, 3)
    origin = jnp.broadcast_to(cam.pos, dirs.shape)

    if scene.planes is None:
        def per_prim(pos, rot, size, color, kind):
            t_box, n_box = _ray_box(origin, dirs, pos, rot, size)
            t_sph, n_sph = _ray_sphere(origin, dirs, pos, size[0])
            is_box = (kind == 0)
            t = jnp.where(is_box, t_box, t_sph)
            n = jnp.where(is_box, n_box, n_sph)
            return t, n, color

        ts, ns, colors = jax.vmap(per_prim)(
            scene.pos, scene.rot, scene.size, scene.color,
            scene.kind)  # (P, H, W)
    else:
        def per_prim(pos, rot, size, color, kind, planes):
            t_box, n_box = _ray_box(origin, dirs, pos, rot, size)
            t_sph, n_sph = _ray_sphere(origin, dirs, pos, size[0])
            t_cvx, n_cvx = _ray_convex(origin, dirs, pos, rot, planes)
            # kind is a per-prim scalar under vmap — broadcasts over (H, W)
            t = jnp.where(kind == 0, t_box,
                          jnp.where(kind == 1, t_sph, t_cvx))
            n = jnp.where(kind == 0, n_box,
                          jnp.where(kind == 1, n_sph, n_cvx))
            return t, n, color

        ts, ns, colors = jax.vmap(per_prim)(
            scene.pos, scene.rot, scene.size, scene.color,
            scene.kind, scene.planes)  # (P, H, W)

    # implicit ground plane
    dz = dirs[..., 2]
    t_plane = (scene.plane_z - origin[..., 2]) / jnp.where(
        jnp.abs(dz) < 1e-9, -1e-9, dz)
    t_plane = jnp.where(t_plane > 1e-4, t_plane, BIG)
    # checkerboard tint for spatial cues
    p_hit = origin + dirs * t_plane[..., None]
    checker = (jnp.floor(p_hit[..., 0] / 0.2)
               + jnp.floor(p_hit[..., 1] / 0.2)) % 2.0
    plane_color = scene.plane_color * (0.85 + 0.15 * checker)[..., None]

    ts_all = jnp.concatenate([ts, t_plane[None]], axis=0)        # (P+1, H, W)
    plane_n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ns.shape[1:])
    ns_all = jnp.concatenate([ns, plane_n[None]], axis=0)

    best = jnp.argmin(ts_all, axis=0)                            # (H, W)
    t_best = jnp.min(ts_all, axis=0)
    hit_mask = t_best < BIG * 0.5

    def gather_best(stack):
        return jnp.take_along_axis(
            stack, best[None, ..., None], axis=0)[0]

    n_best = gather_best(ns_all)
    prim_colors = jnp.broadcast_to(colors[:, None, None, :],
                                   (colors.shape[0],) + dirs.shape)
    col_stack = jnp.concatenate([prim_colors, plane_color[None]], axis=0)
    c_best = gather_best(col_stack)

    light_dirs = LIGHT_DIRS / jnp.linalg.norm(LIGHT_DIRS, axis=-1, keepdims=True)
    diffuse = jnp.einsum("hwc,lc->hwl", n_best, -light_dirs)
    diffuse = jnp.clip(diffuse, 0.0, None) @ LIGHT_COLORS
    shade = AMBIENT + diffuse[..., None]

    sky = jnp.asarray([0.7, 0.8, 0.9]) * (
        0.6 + 0.4 * jnp.clip(dirs[..., 2:3], 0, 1))
    rgb = jnp.where(hit_mask[..., None], c_best * shade, sky)
    return jnp.clip(rgb, 0.0, 1.0) * 255.0


def render_batch(scenes: Scene, cam: Camera, height: int = 64,
                 width: int = 64) -> jnp.ndarray:
    """vmap over a batch of scenes (leading axis on every Scene field)."""
    return jax.vmap(lambda s: render(s, cam, height, width))(scenes)


def render_scene(scene: Scene, cam: Camera, height: int = 64,
                 width: int = 64, backend: str = "xla",
                 n_convex: int = 0) -> jnp.ndarray:
    """Dispatch to the XLA renderer or the Pallas kernel (ops/pallas/raycast,
    measured ~29x faster at 64x64 on a v5e chip).

    ``n_convex`` (static) tells the Pallas kernel how many leading prims are
    convex polytopes (kind 2, mesh-accurate k-DOPs); the XLA path reads the
    per-prim ``kind`` directly and ignores it."""
    if backend == "pallas":
        from .pallas.raycast import render_pallas
        # interpret off-TPU so `renderer="pallas"` configs run (slowly but
        # correctly) on CPU — tests and golden-render fixtures included
        return render_pallas(scene, cam, height, width,
                             interpret=jax.default_backend() != "tpu",
                             n_convex=n_convex)
    return render(scene, cam, height, width)


def euler_z(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +z (most objects here only yaw)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)
