"""Pallas TPU kernel: tiled analytic ray-cast rendering.

The hand-scheduled counterpart of ops/render.py (the BASELINE "Pallas tiled
rasterizer"): each grid program renders one (TILE_H × W) pixel band of one
environment's camera frame. Ray directions are precomputed once per camera
(host side); per-tile the kernel loops over the scene's primitives (a static,
small count), evaluating slab/quadric intersections and Lambert shading as
pure VPU math on (TILE_H·W)-wide vectors held in VMEM.

Rationale: the XLA version materializes (P, H, W) intersection tensors in HBM
between fusions; the kernel keeps the per-tile working set (rays + running
nearest-hit state) entirely in VMEM and writes each output pixel once —
HBM traffic is exactly rays-in + rgb-out.

Scene layout matches ops/render.Scene (pos/rot/size/color/kind + plane), but
flattened into a single (P, 22) parameter matrix so one ref covers the scene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import render as R

BIG = 1e9
TILE_H = 8  # pixel rows per program; W stays whole (lane dim 64/128-friendly)

import numpy as _np

_ld = _np.asarray(R.LIGHT_DIRS)
_ld = _ld / _np.linalg.norm(_ld, axis=-1, keepdims=True)
_LIGHT_DIRS_NORM = [tuple(float(v) for v in row) for row in _ld]
_LIGHT_COLORS = [float(c) for c in _np.asarray(R.LIGHT_COLORS)]


def _pack_scene(scene: R.Scene) -> jnp.ndarray:
    """Scene → (P, 22): pos(3) rot(9) size(3) color(3) kind(1) pad(3)."""
    P = scene.pos.shape[0]
    flat = jnp.concatenate([
        scene.pos, scene.rot.reshape(P, 9), scene.size, scene.color,
        scene.kind.astype(jnp.float32)[:, None], jnp.zeros((P, 3)),
    ], axis=-1)
    return flat.astype(jnp.float32)


def _render_kernel(n_prims: int, n_convex: int, n_planes: int,
                   plane_params_ref, scene_ref, origin_ref,
                   dirs_ref, *hs_and_out):
    """One pixel band, channels-first: dirs (3, TILE_H, W) → rgb (3, T, W).

    Prims [0, n_convex) are convex polytopes (mesh-accurate k-DOPs): their
    body-frame half-spaces arrive as an extra (P, n_planes*4) input ref and
    replace the slab/quadric test with a generalized slab loop. pallas_call
    binds ALL input refs before the output ref, so the trailing args are
    (hs_ref, out_ref) in convex mode and (out_ref,) otherwise.
    """
    hs_ref = hs_and_out[0] if n_convex else None
    out_ref = hs_and_out[-1]
    dx = dirs_ref[0, :, :]
    dy = dirs_ref[1, :, :]
    dz = dirs_ref[2, :, :]
    ox = origin_ref[0, 0]
    oy = origin_ref[0, 1]
    oz = origin_ref[0, 2]

    plane_z = plane_params_ref[0, 0]
    pr = plane_params_ref[0, 1]
    pg = plane_params_ref[0, 2]
    pb = plane_params_ref[0, 3]

    # implicit ground plane as the initial nearest hit
    safe_dz = jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
    t_plane = (plane_z - oz) / safe_dz
    t_plane = jnp.where(t_plane > 1e-4, t_plane, BIG)
    px = ox + dx * t_plane
    py = oy + dy * t_plane
    checker = (jnp.floor(px / 0.2) + jnp.floor(py / 0.2)) % 2.0
    tint = 0.85 + 0.15 * checker

    best_t = t_plane
    best_nx = jnp.zeros_like(dx)
    best_ny = jnp.zeros_like(dx)
    best_nz = jnp.ones_like(dx)
    best_r = pr * tint
    best_g = pg * tint
    best_b = pb * tint

    for p in range(n_prims):  # static small prim count — unrolled
        row = scene_ref[p, :]
        cx, cy, cz = row[0], row[1], row[2]
        rot = row[3:12].reshape(3, 3)
        sx, sy, sz = row[12], row[13], row[14]
        cr, cg, cb = row[15], row[16], row[17]
        is_box = row[18] < 0.5

        # ray into body frame: o' = Rᵀ(o - c), d' = Rᵀ d
        relx, rely, relz = ox - cx, oy - cy, oz - cz
        o_b = [rot[0, 0] * relx + rot[1, 0] * rely + rot[2, 0] * relz,
               rot[0, 1] * relx + rot[1, 1] * rely + rot[2, 1] * relz,
               rot[0, 2] * relx + rot[1, 2] * rely + rot[2, 2] * relz]
        d_b = [rot[0, 0] * dx + rot[1, 0] * dy + rot[2, 0] * dz,
               rot[0, 1] * dx + rot[1, 1] * dy + rot[2, 1] * dz,
               rot[0, 2] * dx + rot[1, 2] * dy + rot[2, 2] * dz]

        if p < n_convex:
            # generalized slab test over the prim's k-DOP half-spaces;
            # o_b is a scalar triple, d_b a vector triple → t_k is a vector
            hs = hs_ref[p, :]
            t_near = jnp.full_like(dx, -BIG)
            t_far = jnp.full_like(dx, BIG)
            n_best = [jnp.zeros_like(dx), jnp.zeros_like(dx),
                      jnp.zeros_like(dx)]
            for k in range(n_planes):
                nx_k, ny_k, nz_k = hs[4 * k], hs[4 * k + 1], hs[4 * k + 2]
                off_k = hs[4 * k + 3]
                ndotd = nx_k * d_b[0] + ny_k * d_b[1] + nz_k * d_b[2]
                ndoto = nx_k * o_b[0] + ny_k * o_b[1] + nz_k * o_b[2]
                para = jnp.abs(ndotd) < 1e-9
                t_k = (off_k - ndoto) / jnp.where(para, 1e-9, ndotd)
                entering = (ndotd < 0) & ~para
                take = entering & (t_k > t_near)
                n_best = [jnp.where(take, c, n) for c, n in
                          zip((nx_k, ny_k, nz_k), n_best)]
                t_near = jnp.where(take, t_k, t_near)
                t_far = jnp.where(~entering & ~para,
                                  jnp.minimum(t_far, t_k), t_far)
                # parallel outside a half-space → no intersection
                t_near = jnp.where(para & (ndoto > off_k), BIG, t_near)
            hit_c = (t_near <= t_far) & (t_far > 1e-4)
            t_p = jnp.where(t_near > 1e-4, t_near, t_far)
            t_p = jnp.where(hit_c, t_p, BIG)
            # body normal → world
            n_p = [rot[0, 0] * n_best[0] + rot[0, 1] * n_best[1]
                   + rot[0, 2] * n_best[2],
                   rot[1, 0] * n_best[0] + rot[1, 1] * n_best[1]
                   + rot[1, 2] * n_best[2],
                   rot[2, 0] * n_best[0] + rot[2, 1] * n_best[1]
                   + rot[2, 2] * n_best[2]]
            closer = t_p < best_t
            best_t = jnp.where(closer, t_p, best_t)
            best_nx = jnp.where(closer, n_p[0], best_nx)
            best_ny = jnp.where(closer, n_p[1], best_ny)
            best_nz = jnp.where(closer, n_p[2], best_nz)
            best_r = jnp.where(closer, cr, best_r)
            best_g = jnp.where(closer, cg, best_g)
            best_b = jnp.where(closer, cb, best_b)
            continue

        # box slab test
        t_near = jnp.full_like(dx, -BIG)
        t_far = jnp.full_like(dx, BIG)
        axes_n = [jnp.zeros_like(dx), jnp.zeros_like(dx), jnp.zeros_like(dx)]
        half = [sx, sy, sz]
        near_ax = jnp.zeros_like(dx)
        for ax in range(3):
            d_ax = d_b[ax]
            inv = 1.0 / jnp.where(jnp.abs(d_ax) < 1e-9,
                                  jnp.where(d_ax >= 0, 1e-9, -1e-9), d_ax)
            t1 = (-half[ax] - o_b[ax]) * inv
            t2 = (half[ax] - o_b[ax]) * inv
            tmin = jnp.minimum(t1, t2)
            tmax = jnp.maximum(t1, t2)
            near_ax = jnp.where(tmin > t_near, float(ax), near_ax)
            t_near = jnp.maximum(t_near, tmin)
            t_far = jnp.minimum(t_far, tmax)
        hit_box = (t_near <= t_far) & (t_far > 1e-4)
        t_box = jnp.where(t_near > 1e-4, t_near, t_far)
        t_box = jnp.where(hit_box, t_box, BIG)
        # body-frame normal from the entering slab axis
        nb = [jnp.where(near_ax == float(ax),
                        -jnp.sign(d_b[ax]), 0.0) for ax in range(3)]
        # to world: n = R nb
        n_box = [rot[0, 0] * nb[0] + rot[0, 1] * nb[1] + rot[0, 2] * nb[2],
                 rot[1, 0] * nb[0] + rot[1, 1] * nb[1] + rot[1, 2] * nb[2],
                 rot[2, 0] * nb[0] + rot[2, 1] * nb[1] + rot[2, 2] * nb[2]]

        # sphere (radius sx)
        b_half = (ox - cx) * dx + (oy - cy) * dy + (oz - cz) * dz
        c_term = ((ox - cx) ** 2 + (oy - cy) ** 2 + (oz - cz) ** 2) - sx * sx
        disc = b_half * b_half - c_term
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b_half - sq
        t1s = -b_half + sq
        t_sph = jnp.where(t0 > 1e-4, t0, t1s)
        t_sph = jnp.where((disc > 0) & (t_sph > 1e-4), t_sph, BIG)
        inv_r = 1.0 / jnp.maximum(sx, 1e-9)
        n_sph = [((ox + dx * t_sph) - cx) * inv_r,
                 ((oy + dy * t_sph) - cy) * inv_r,
                 ((oz + dz * t_sph) - cz) * inv_r]

        t_p = jnp.where(is_box, t_box, t_sph)
        n_p = [jnp.where(is_box, n_box[i], n_sph[i]) for i in range(3)]

        closer = t_p < best_t
        best_t = jnp.where(closer, t_p, best_t)
        best_nx = jnp.where(closer, n_p[0], best_nx)
        best_ny = jnp.where(closer, n_p[1], best_ny)
        best_nz = jnp.where(closer, n_p[2], best_nz)
        best_r = jnp.where(closer, cr, best_r)
        best_g = jnp.where(closer, cg, best_g)
        best_b = jnp.where(closer, cb, best_b)

    # Lambert shading with the shared light rig (python-float constants —
    # pallas kernels may not capture traced arrays)
    diffuse = jnp.zeros_like(dx)
    for (lx, ly, lz), lc in zip(_LIGHT_DIRS_NORM, _LIGHT_COLORS):
        d_l = best_nx * (-lx) + best_ny * (-ly) + best_nz * (-lz)
        diffuse = diffuse + jnp.maximum(d_l, 0.0) * lc
    shade = R.AMBIENT + diffuse

    hit = best_t < BIG * 0.5
    sky_scale = 0.6 + 0.4 * jnp.clip(dz, 0.0, 1.0)
    out_r = jnp.where(hit, best_r * shade, 0.7 * sky_scale)
    out_g = jnp.where(hit, best_g * shade, 0.8 * sky_scale)
    out_b = jnp.where(hit, best_b * shade, 0.9 * sky_scale)
    out_ref[0, :, :] = jnp.clip(out_r, 0.0, 1.0) * 255.0
    out_ref[1, :, :] = jnp.clip(out_g, 0.0, 1.0) * 255.0
    out_ref[2, :, :] = jnp.clip(out_b, 0.0, 1.0) * 255.0


def render_pallas(scene: R.Scene, cam: R.Camera, height: int = 64,
                  width: int = 64, interpret: bool = False,
                  n_convex: int = 0) -> jnp.ndarray:
    """Render one scene with the tiled kernel → (H, W, 3) float32 [0, 255].

    ``n_convex`` (static) marks prims [0, n_convex) as convex polytopes whose
    half-spaces come from ``scene.planes`` (mesh-accurate mode). The caller
    must order convex prims first; remaining prims dispatch box/sphere on
    ``kind`` as before.
    """
    dirs = R._camera_rays(cam, height, width).astype(jnp.float32)
    dirs = jnp.moveaxis(dirs, -1, 0)           # (3, H, W) channels-first
    origin = jnp.broadcast_to(cam.pos.astype(jnp.float32), (1, 3))
    packed = _pack_scene(scene)
    plane = jnp.concatenate([scene.plane_z.reshape(1),
                             scene.plane_color.reshape(3)])[None].astype(
                                 jnp.float32)
    n_prims = packed.shape[0]
    n_tiles = height // TILE_H
    assert height % TILE_H == 0

    extra = []
    n_planes = 0
    if n_convex:
        assert scene.planes is not None, "n_convex > 0 needs scene.planes"
        n_planes = scene.planes.shape[1]
        extra = [scene.planes.reshape(n_prims, n_planes * 4).astype(
            jnp.float32)]

    in_specs = [
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_prims, 22), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3, TILE_H, width), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((n_prims, n_planes * 4), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for _ in extra
    ]
    kernel = functools.partial(_render_kernel, n_prims, n_convex, n_planes)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, TILE_H, width), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, height, width), jnp.float32),
        interpret=interpret,
    )(plane, packed, origin, dirs, *extra)
    # back to HWC for obs-surface parity
    return jnp.moveaxis(out, 0, -1)


def render_batch_pallas(scenes: R.Scene, cam: R.Camera, height: int = 64,
                        width: int = 64, interpret: bool = False,
                        n_convex: int = 0) -> jnp.ndarray:
    return jax.vmap(lambda s: render_pallas(s, cam, height, width,
                                            interpret, n_convex))(scenes)
