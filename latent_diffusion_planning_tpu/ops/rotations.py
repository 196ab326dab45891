"""Quaternion / rotation math, fully batched and jit-friendly.

Covers the reference's rotation needs (utils/data_utils.py:84-110
quat2axisangle_batch over robosuite (x, y, z, w) quaternions; pyquaternion
usage in collect_aloha_scripted_demos.py) plus the kinematics primitives the
physics core builds on (hamilton products, frame transforms, exponential-map
integration).

Convention: quaternions are (w, x, y, z) unless suffixed ``_xyzw``.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def quat_identity() -> jnp.ndarray:
    return jnp.asarray([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), EPS)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (wxyz)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q."""
    qv = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,), v.dtype), v], axis=-1)
    return quat_mul(quat_mul(q, qv), quat_conj(q))[..., 1:]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz → (…, 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) → (…, 4) wxyz (numerically-stable branch-free variant)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.clip(1.0 + tr, EPS, None)) / 2.0
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, EPS, None)) / 2.0
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, EPS, None)) / 2.0
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, EPS, None)) / 2.0
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    return quat_normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def axis_angle_to_quat(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Exponential coordinates (…, 3) → quaternion (…, 4) wxyz."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe = jnp.maximum(angle, EPS)
    axis = axis_angle / safe
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_from_unit_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a *known unit* axis and an angle.

    Unlike ``axis_angle_to_quat`` this is smooth at angle = 0 (no norm of the
    input), so gradients through revolute-joint kinematics stay finite.
    """
    angle = jnp.asarray(angle)[..., None]
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (…, 4) wxyz → exponential coordinates (…, 3).

    Matches the reference's quat2axisangle semantics
    (utils/data_utils.py:84-110, which takes xyzw; see
    ``quat_to_axis_angle_xyzw``): zero rotation maps to the zero vector.
    """
    q = quat_normalize(q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    den = jnp.sqrt(jnp.clip(1.0 - w * w, 0.0, None))
    angle = 2.0 * jnp.arccos(w)
    scale = jnp.where(den < 1e-6, 0.0, angle / jnp.maximum(den, EPS))
    return q[..., 1:] * scale


def quat_to_axis_angle_xyzw(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """robosuite-convention (x, y, z, w) wrapper (data_utils.py:84-110)."""
    q = jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., :3]], axis=-1)
    return quat_to_axis_angle(q)


def quat_wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """Internal (w, x, y, z) → robosuite/robomimic observable (x, y, z, w).

    Every quaternion a robomimic dataset records (robot0_eef_quat, the
    object-state quats — envs/robosuite_env.py:142-170 via robosuite
    observables) is xyzw; envs emit obs through this so a real robomimic
    HDF5 and a device-collected one are byte-layout interchangeable.
    """
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Integrate orientation by body-frame angular velocity over dt
    (exponential map — exact for constant omega)."""
    return quat_normalize(quat_mul(q, axis_angle_to_quat(omega * dt)))


def euler_zyx_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """Roll-pitch-yaw (…, 3) → quaternion wxyz."""
    r, p, y = jnp.moveaxis(rpy / 2.0, -1, 0)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)
