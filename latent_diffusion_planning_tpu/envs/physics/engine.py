"""MJX-style rigid-body physics core: batched, differentiable, jit-native.

The on-device replacement for the capability the reference outsources to
MuJoCo's C engine (robosuite/dm_control `physics.step()`,
envs/robosuite_env.py:122-140, envs/alohasim_env.py:52-100): free rigid
bodies (6-DoF) interacting with a static world and kinematically-driven
"mocap" bodies (grippers), with soft penalty contacts and Coulomb friction —
the same soft-constraint contact philosophy as MuJoCo, specialized to the
manipulation scenes these tasks need (plane + boxes + spheres).

Design:
- everything is struct-of-arrays over bodies/geoms: one ``step`` is pure
  fused element-wise math + tiny reductions → vmaps to thousands of envs,
- contacts are generated analytically each step for a *static* set of pairs
  (sphere-plane, box-plane via corner tests, sphere-box, sphere-sphere,
  box-box via corner-in-box tests both ways) — fixed shapes, no dynamic
  counts, XLA-friendly,
- forces: Baumgarte-stabilized penalty springs (kn·penetration − cn·v_n)
  with a friction-cone clamp on the tangential force (μ·|Fn|),
- integration: semi-implicit Euler with exponential-map quaternion update.

Joint-chain (generalized-coordinate) dynamics for the ViperX arms are the
next layer on top of this core (ROADMAP item 1); the free-body + mocap subset
already upgrades cube/gripper interaction from kinematic attachment to
force-based grasping.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from ...ops import rotations as rot

GEOM_SPHERE = 0
GEOM_BOX = 1

_CORNER_SIGNS = jnp.asarray(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)])  # (8, 3)


class PhysicsParams(NamedTuple):
    dt: float = 0.002
    gravity: float = -9.81
    kn: float = 8000.0        # contact normal stiffness (N/m per unit mass)
    cn: float = 60.0          # contact normal damping
    mu: float = 1.0           # Coulomb friction coefficient
    kt: float = 400.0         # tangential (stiction) velocity gain
    angular_damping: float = 0.05
    linear_damping: float = 0.01


class Geom(flax.struct.PyTreeNode):
    """Collision geometry attached to a body (or the static world).

    body_id −1 = static world geometry; mocap bodies are regular bodies whose
    state is overwritten each step by the controller.
    """

    kind: jnp.ndarray        # (G,) int32
    size: jnp.ndarray        # (G, 3): box half-extents / sphere radius in [0]
    offset: jnp.ndarray      # (G, 3) position in body frame
    body_id: jnp.ndarray     # (G,) int32


class RigidBody(flax.struct.PyTreeNode):
    """Batched dynamic-body state (leading axis = body index)."""

    pos: jnp.ndarray         # (NB, 3)
    quat: jnp.ndarray        # (NB, 4) wxyz
    linvel: jnp.ndarray      # (NB, 3)
    angvel: jnp.ndarray      # (NB, 3) body frame

    @classmethod
    def create(cls, pos, quat=None, linvel=None, angvel=None) -> "RigidBody":
        pos = jnp.atleast_2d(jnp.asarray(pos, jnp.float32))
        nb = pos.shape[0]
        return cls(
            pos=pos,
            quat=(jnp.asarray(quat, jnp.float32) if quat is not None
                  else jnp.tile(rot.quat_identity(), (nb, 1))),
            linvel=(jnp.asarray(linvel, jnp.float32) if linvel is not None
                    else jnp.zeros((nb, 3))),
            angvel=(jnp.asarray(angvel, jnp.float32) if angvel is not None
                    else jnp.zeros((nb, 3))))


class World(flax.struct.PyTreeNode):
    """Static model: masses/inertias per body + geom soup + ground plane.

    ``geom_kinds``/``geom_body_ids`` are static (hashable) copies used for
    python-level contact-pair planning — the jnp arrays become tracers inside
    scan/jit, but the pair structure must stay static.
    """

    mass: jnp.ndarray            # (NB,)
    inertia: jnp.ndarray         # (NB, 3) body-frame diagonal
    geoms: Geom
    plane_z: jnp.ndarray
    kinematic: jnp.ndarray       # (NB,) bool — mocap bodies (infinite mass)
    geom_kinds: tuple = flax.struct.field(pytree_node=False, default=())
    geom_body_ids: tuple = flax.struct.field(pytree_node=False, default=())

    @classmethod
    def create(cls, mass, inertia, geoms: Geom, plane_z=0.0,
               kinematic=None) -> "World":
        import numpy as _np
        mass = jnp.asarray(mass, jnp.float32)
        return cls(mass=mass, inertia=jnp.asarray(inertia, jnp.float32),
                   geoms=geoms, plane_z=jnp.asarray(plane_z, jnp.float32),
                   kinematic=(jnp.asarray(kinematic, bool)
                              if kinematic is not None
                              else jnp.zeros((mass.shape[0],), bool)),
                   geom_kinds=tuple(int(k) for k in _np.asarray(geoms.kind)),
                   geom_body_ids=tuple(int(b) for b in
                                       _np.asarray(geoms.body_id)))

    @property
    def n_bodies(self) -> int:
        return self.mass.shape[0]


def make_box_geom(half_extents, body_id: int, offset=(0, 0, 0)) -> dict:
    return dict(kind=GEOM_BOX, size=jnp.asarray(half_extents, jnp.float32),
                offset=jnp.asarray(offset, jnp.float32), body_id=body_id)


def make_sphere_geom(radius: float, body_id: int, offset=(0, 0, 0)) -> dict:
    return dict(kind=GEOM_SPHERE,
                size=jnp.asarray([radius, 0.0, 0.0], jnp.float32),
                offset=jnp.asarray(offset, jnp.float32), body_id=body_id)


def build_geoms(specs: list[dict]) -> Geom:
    return Geom(kind=jnp.asarray([s["kind"] for s in specs], jnp.int32),
                size=jnp.stack([s["size"] for s in specs]),
                offset=jnp.stack([s["offset"] for s in specs]),
                body_id=jnp.asarray([s["body_id"] for s in specs], jnp.int32))


# ---------------------------------------------------------------------------
# contact generation
# ---------------------------------------------------------------------------

class Contact(NamedTuple):
    point: jnp.ndarray       # (..., 3) world
    normal: jnp.ndarray      # (..., 3) pointing from B into A
    depth: jnp.ndarray       # (...,)  >0 when penetrating
    body_a: jnp.ndarray      # int32 (−1 static)
    body_b: jnp.ndarray


def _geom_world_pose(geom_idx: int, geoms: Geom, body: RigidBody):
    bid = geoms.body_id[geom_idx]
    static = bid < 0
    safe = jnp.maximum(bid, 0)
    pos = jnp.where(static, geoms.offset[geom_idx],
                    body.pos[safe] + rot.quat_rotate(body.quat[safe],
                                                     geoms.offset[geom_idx]))
    quat = jnp.where(static, rot.quat_identity(), body.quat[safe])
    return pos, quat, bid


def _plane_contacts_for_geom(g: int, geoms: Geom, body: RigidBody,
                             plane_z) -> Contact:
    """Up to 8 contact points of geom g against the ground plane."""
    pos, quat, bid = _geom_world_pose(g, geoms, body)
    is_box = geoms.kind[g] == GEOM_BOX
    # box: 8 corners; sphere: bottom point replicated
    corners_body = _CORNER_SIGNS * geoms.size[g]
    corners = pos + rot.quat_rotate(jnp.broadcast_to(quat, (8, 4)), corners_body)
    sphere_pt = pos - jnp.asarray([0.0, 0.0, 1.0]) * geoms.size[g, 0]
    pts = jnp.where(is_box, corners, jnp.broadcast_to(sphere_pt, (8, 3)))
    depth = plane_z - pts[:, 2]
    # sphere contributes one contact only: mask the other 7
    mask = jnp.where(is_box, jnp.ones(8, bool),
                     jnp.arange(8) == 0)
    depth = jnp.where(mask, depth, -1.0)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8, 3))
    return Contact(pts, normal, depth,
                   jnp.broadcast_to(bid, (8,)),
                   jnp.full((8,), -1, jnp.int32))


def _sphere_box_contact(sg: int, bg: int, geoms: Geom,
                        body: RigidBody) -> Contact:
    """Sphere geom sg vs box geom bg (one contact)."""
    sp, _, s_bid = _geom_world_pose(sg, geoms, body)
    bp, bq, b_bid = _geom_world_pose(bg, geoms, body)
    r = geoms.size[sg, 0]
    half = geoms.size[bg]
    local = rot.quat_rotate(rot.quat_conj(bq), sp - bp)
    closest = jnp.clip(local, -half, half)
    delta = local - closest
    dist = jnp.linalg.norm(delta)
    outside = dist > 1e-9
    # if center inside the box, push out along min-penetration face
    face_pen = half - jnp.abs(local)
    axis = jnp.argmin(face_pen)
    inside_n = jnp.sign(local[axis]) * jax.nn.one_hot(axis, 3)
    n_local = jnp.where(outside, delta / jnp.maximum(dist, 1e-9), inside_n)
    depth = jnp.where(outside, r - dist, r + face_pen[axis])
    normal = rot.quat_rotate(bq, n_local)          # points from box into sphere
    point = sp - normal * r
    return Contact(point[None], normal[None], depth[None],
                   s_bid[None].astype(jnp.int32), b_bid[None].astype(jnp.int32))


def _box_box_corner_contacts(ga: int, gb: int, geoms: Geom,
                             body: RigidBody) -> Contact:
    """Corners of box ga inside box gb (8 candidate contacts)."""
    ap, aq, a_bid = _geom_world_pose(ga, geoms, body)
    bp, bq, b_bid = _geom_world_pose(gb, geoms, body)
    corners = ap + rot.quat_rotate(jnp.broadcast_to(aq, (8, 4)),
                                   _CORNER_SIGNS * geoms.size[ga])
    local = rot.quat_rotate(jnp.broadcast_to(rot.quat_conj(bq), (8, 4)),
                            corners - bp)
    face_pen = geoms.size[gb] - jnp.abs(local)      # (8, 3)
    inside = jnp.all(face_pen > 0, axis=-1)
    axis = jnp.argmin(face_pen, axis=-1)
    depth = jnp.where(inside, jnp.take_along_axis(face_pen, axis[:, None],
                                                  axis=-1)[:, 0], -1.0)
    n_local = (jnp.sign(jnp.take_along_axis(local, axis[:, None], axis=-1))
               * jax.nn.one_hot(axis, 3))
    normal = rot.quat_rotate(jnp.broadcast_to(bq, (8, 4)), n_local)
    return Contact(corners, normal, depth,
                   jnp.broadcast_to(a_bid, (8,)).astype(jnp.int32),
                   jnp.broadcast_to(b_bid, (8,)).astype(jnp.int32))


def generate_contacts(world: World, body: RigidBody) -> Contact:
    """All candidate contacts (fixed count) for the scene."""
    G = world.geoms.kind.shape[0]
    assert len(world.geom_kinds) == G, "build World via World.create"
    parts: list[Contact] = []
    for g in range(G):
        if world.geom_body_ids[g] >= 0:  # dynamic/mocap geoms hit plane
            parts.append(_plane_contacts_for_geom(g, world.geoms, body,
                                                  world.plane_z))
    for a in range(G):
        for b in range(G):
            if a == b:
                continue
            bid_a = world.geom_body_ids[a]
            bid_b = world.geom_body_ids[b]
            if bid_a == bid_b:
                continue
            if bid_a < 0:   # static-vs-x handled from the dynamic side
                continue
            ka = world.geom_kinds[a]
            kb = world.geom_kinds[b]
            if ka == GEOM_SPHERE and kb == GEOM_BOX:
                parts.append(_sphere_box_contact(a, b, world.geoms, body))
            elif ka == GEOM_BOX and kb == GEOM_SPHERE and bid_b < 0:
                parts.append(_sphere_box_contact(b, a, world.geoms, body))
            elif ka == GEOM_BOX and kb == GEOM_BOX and a < b:
                parts.append(_box_box_corner_contacts(a, b, world.geoms, body))
                parts.append(_box_box_corner_contacts(b, a, world.geoms, body))
            elif ka == GEOM_SPHERE and kb == GEOM_SPHERE and a < b:
                pa, _, ba_ = _geom_world_pose(a, world.geoms, body)
                pb, _, bb_ = _geom_world_pose(b, world.geoms, body)
                d = pa - pb
                dist = jnp.linalg.norm(d)
                n = d / jnp.maximum(dist, 1e-9)
                depth = world.geoms.size[a, 0] + world.geoms.size[b, 0] - dist
                mid = pb + n * (world.geoms.size[b, 0] - depth / 2)
                parts.append(Contact(mid[None], n[None], depth[None],
                                     ba_[None].astype(jnp.int32),
                                     bb_[None].astype(jnp.int32)))
    if not parts:
        z3 = jnp.zeros((1, 3))
        return Contact(z3, z3, -jnp.ones((1,)),
                       -jnp.ones((1,), jnp.int32), -jnp.ones((1,), jnp.int32))
    return Contact(*[jnp.concatenate([getattr(p, f) for p in parts], axis=0)
                     for f in Contact._fields])


# ---------------------------------------------------------------------------
# forces + integration
# ---------------------------------------------------------------------------

def _point_velocity(body: RigidBody, bid: jnp.ndarray,
                    point: jnp.ndarray) -> jnp.ndarray:
    """World velocity of a material point on body bid (0 for static)."""
    safe = jnp.maximum(bid, 0)
    w_world = rot.quat_rotate(body.quat[safe], body.angvel[safe])
    v = body.linvel[safe] + jnp.cross(w_world, point - body.pos[safe])
    return jnp.where((bid < 0)[..., None], 0.0, v)


def contact_forces(world: World, body: RigidBody, contacts: Contact,
                   params: PhysicsParams):
    """Per-contact penalty force with impulse-level stabilization.

    Raw stiff springs add energy when k·dt/m is large; both the normal and
    friction forces are therefore clamped by the impulse that would exactly
    cancel the relevant relative velocity (plus, for the normal, exit the
    penetration over ``contact_tau`` seconds) — the standard penalty
    stabilization, equivalent to a Baumgarte velocity bias.
    """
    active = contacts.depth > 0.0
    va = _point_velocity(body, contacts.body_a, contacts.point)
    vb = _point_velocity(body, contacts.body_b, contacts.point)
    rel = va - vb
    vn = jnp.sum(rel * contacts.normal, axis=-1)
    vt = rel - vn[..., None] * contacts.normal

    def eff_mass(bid):
        safe = jnp.maximum(bid, 0)
        inv = jnp.where(bid < 0, 0.0, 1.0 / world.mass[safe])
        inv = jnp.where(bid >= 0, jnp.where(world.kinematic[safe], 0.0, inv),
                        inv)
        return inv

    inv_mass = eff_mass(contacts.body_a) + eff_mass(contacts.body_b)
    m_eff = 1.0 / jnp.maximum(inv_mass, 1e-6)

    # impulse caps are per-body budgets: split them across that body's
    # simultaneously-active contacts (a resting box has 4-8 corner contacts)
    nb = world.n_bodies
    counts = jnp.zeros((nb,))
    for bid in (contacts.body_a, contacts.body_b):
        counts = counts.at[jnp.maximum(bid, 0)].add(
            jnp.where(bid >= 0, active.astype(jnp.float32), 0.0))
    n_active = jnp.maximum(
        jnp.maximum(counts[jnp.maximum(contacts.body_a, 0)],
                    counts[jnp.maximum(contacts.body_b, 0)]), 1.0)
    m_eff = m_eff / n_active

    # normal: spring-damper, clamped by the impulse that exits the
    # penetration over contact_tau and cancels the approach velocity
    fn_mag = params.kn * contacts.depth - params.cn * vn
    tau = jnp.maximum(4.0 * params.dt, 1e-6)
    fn_cap = m_eff * (jnp.maximum(-vn, 0.0) / params.dt
                      + contacts.depth / (tau * params.dt))
    fn_mag = jnp.clip(fn_mag, 0.0, fn_cap)
    fn_mag = jnp.where(active, fn_mag, 0.0)
    fn = fn_mag[..., None] * contacts.normal

    # friction: viscous model clamped by the Coulomb cone AND the impulse
    # that stops the tangential slip in one step plus a gravity feedforward
    # *projected onto the tangent plane* — without it a held object slips at
    # g·dt per step and slides out of a grasp (no stiction); projecting keeps
    # floor contacts (gravity ∥ normal) free of overshoot
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    g_vec = jnp.asarray([0.0, 0.0, params.gravity])
    g_n = jnp.sum(g_vec * contacts.normal, axis=-1)
    g_tan = jnp.linalg.norm(g_vec - g_n[..., None] * contacts.normal, axis=-1)
    ft_mag = jnp.minimum(params.kt * vt_norm,
                         jnp.minimum(params.mu * fn_mag,
                                     m_eff * (vt_norm / params.dt + g_tan)))
    ft = -ft_mag[..., None] * vt / jnp.maximum(vt_norm, 1e-9)[..., None]
    ft = jnp.where(active[..., None], ft, 0.0)

    f = fn + ft                                            # on body_a; −f on b

    nb = world.n_bodies
    force = jnp.zeros((nb, 3))
    torque = jnp.zeros((nb, 3))

    def accumulate(force, torque, bid, f_c, point):
        safe = jnp.maximum(bid, 0)
        valid = (bid >= 0)[..., None]
        force = force.at[safe].add(jnp.where(valid, f_c, 0.0))
        arm = point - body.pos[safe]
        torque = torque.at[safe].add(jnp.where(valid, jnp.cross(arm, f_c), 0.0))
        return force, torque

    force, torque = accumulate(force, torque, contacts.body_a, f,
                               contacts.point)
    force, torque = accumulate(force, torque, contacts.body_b, -f,
                               contacts.point)
    return force, torque


def free_body_step(world: World, body: RigidBody, params: PhysicsParams,
                   ext_force: jnp.ndarray | None = None,
                   ext_torque: jnp.ndarray | None = None) -> RigidBody:
    """One semi-implicit Euler step of all dynamic bodies.

    Kinematic (mocap) bodies keep their state — the caller sets their
    pos/quat/vel explicitly (gripper servo).
    """
    contacts = generate_contacts(world, body)
    force, torque = contact_forces(world, body, contacts, params)
    if ext_force is not None:
        force = force + ext_force
    if ext_torque is not None:
        torque = torque + ext_torque

    g = jnp.asarray([0.0, 0.0, params.gravity])
    acc = force / world.mass[:, None] + g
    new_linvel = (body.linvel + params.dt * acc) * (1.0 - params.linear_damping)

    torque_body = rot.quat_rotate(rot.quat_conj(body.quat), torque)
    ang_acc = torque_body / world.inertia
    new_angvel = (body.angvel + params.dt * ang_acc) * (
        1.0 - params.angular_damping)

    new_pos = body.pos + params.dt * new_linvel
    new_quat = rot.quat_integrate(body.quat, new_angvel, params.dt)

    kin = world.kinematic[:, None]
    return RigidBody(
        pos=jnp.where(kin, body.pos, new_pos),
        quat=jnp.where(kin, body.quat, new_quat),
        linvel=jnp.where(kin, body.linvel, new_linvel),
        angvel=jnp.where(kin, body.angvel, new_angvel))


def pair_in_contact(contacts: Contact, body_i: int,
                    body_j: int) -> jnp.ndarray:
    """() bool — any active contact between bodies i and j (−1 = world/plane).

    The on-device analogue of the reference's MuJoCo geom-contact-pair scans
    (envs/alohasim_env.py:145-156: ``touch_right_gripper`` etc. iterate
    ``physics.data.contact`` for named geom pairs) — task rewards key off
    *physical contact events*, not distance proxies.
    """
    ij = (contacts.body_a == body_i) & (contacts.body_b == body_j)
    ji = (contacts.body_a == body_j) & (contacts.body_b == body_i)
    return jnp.any((ij | ji) & (contacts.depth > 0.0))


def multi_step(world: World, body: RigidBody, params: PhysicsParams,
               n: int) -> RigidBody:
    """n physics substeps under lax.scan (control_dt = n * params.dt)."""
    def f(b, _):
        return free_body_step(world, b, params), None
    out, _ = jax.lax.scan(f, body, None, length=n)
    return out
