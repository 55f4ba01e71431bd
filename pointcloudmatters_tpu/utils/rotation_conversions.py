"""Rotation conversions in JAX.

API-parity with the reference's PyTorch3D-derived module
(`src/utils/rotation_conversions.py:41,102,556,580`): quaternions are
``(w, x, y, z)`` scalar-first, matrices are ``(..., 3, 3)``, 6D rotations are
the first two matrix rows flattened (Zhou et al.). All functions are pure,
jittable, and batched over leading dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quaternion_multiply",
    "quaternion_raw_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "standardize_quaternion",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "random_quaternions",
    "random_rotations",
]


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x=0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz. Numerically-stable branch selection by
    the largest quaternion component (same scheme as the reference)."""
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )  # (..., 4, 4)

    flr = 0.1
    quat_candidates = quat_by_rijk / (
        2.0 * jnp.maximum(q_abs[..., None], flr * jnp.ones_like(q_abs[..., None]))
    )
    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return standardize_quaternion(out)


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Force nonnegative real part."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jax.Array) -> jax.Array:
    return quaternion * jnp.asarray([1.0, -1.0, -1.0, -1.0], quaternion.dtype)


def quaternion_apply(quaternion: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate (..., 3) points by (..., 4) quaternions."""
    real = jnp.zeros(point.shape[:-1] + (1,), point.dtype)
    point_q = jnp.concatenate([real, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_q),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # taylor: sin(x/2)/x ~ 1/2 - x^2/48
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def _axis_angle_rotation(axis: str, angle: jax.Array) -> jax.Array:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str) -> jax.Array:
    """(..., 3) angles + convention like "XYZ" -> (..., 3, 3)."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"Invalid convention {convention}.")
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: jax.Array, horizontal: bool, tait_bryan: bool
) -> jax.Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jax.Array, convention: str) -> jax.Array:
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"Invalid convention {convention}.")
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0),
                     -1.0, 1.0)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. 2019),
    reference `rotation_conversions.py:556-579`."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows flattened
    (`rotation_conversions.py:580-596`)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def random_quaternions(n: int, key: jax.Array, dtype=jnp.float32) -> jax.Array:
    q = jax.random.normal(key, (n, 4), dtype)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def random_rotations(n: int, key: jax.Array, dtype=jnp.float32) -> jax.Array:
    return quaternion_to_matrix(random_quaternions(n, key, dtype))
