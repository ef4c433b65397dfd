"""Quaternion / SE(3) / pinhole-camera primitives.

Replaces the Eigen Quat/Vec3 and sibling-repo CameraPinhole usage of the
reference's direct method (reference: direct_method_tracker.cpp:119,145).
Quaternions are ``[..., 4]`` arrays in (w, x, y, z) order, matching Eigen's
constructor convention. All functions broadcast and are jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors ``[..., 3]`` by unit quaternions ``[..., 4]``."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_small_angle(dtheta):
    """Eigen-style Quat(1, d/2).normalized() used by the direct method's
    pose update (reference: direct_method_tracker.cpp:184)."""
    q = jnp.concatenate([jnp.ones_like(dtheta[..., :1]), 0.5 * dtheta],
                        axis=-1)
    return quat_normalize(q)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def pinhole_project(norm_xy, k4):
    """Normalized-plane -> image-plane: (fx*x + cx, fy*y + cy).

    ``k4 = (fx, fy, cx, cy)`` as in the reference demos
    (reference: test_direct_method.cpp / CameraPinhole)."""
    fx, fy, cx, cy = k4[..., 0], k4[..., 1], k4[..., 2], k4[..., 3]
    return jnp.stack([fx * norm_xy[..., 0] + cx, fy * norm_xy[..., 1] + cy],
                     axis=-1)
