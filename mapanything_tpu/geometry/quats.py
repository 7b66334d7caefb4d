"""Quaternion math (scalar-last xyzw convention), pure jnp.

Semantics match the reference implementation in
mapanything/utils/geometry.py:601-855 (quaternion_to_rotation_matrix,
rotation_matrix_to_quaternion, quaternion_inverse, quaternion_multiply,
transform_pose_using_quats_and_trans_2_to_1) but are written
batch-polymorphic over arbitrary leading dims and jit/grad friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_rotation_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions (..., 4) [xyzw] to rotation matrices (..., 3, 3).

    Ref: geometry.py:601.
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    x, y, z, w = jnp.moveaxis(quat, -1, 0)

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    rot = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def standardize_quaternion(quat: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real (w) part is non-negative. Ref: geometry.py:728."""
    return jnp.where(quat[..., 3:4] < 0, -quat, quat)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x == 0. Ref: geometry.py:716."""
    positive = x > 0
    # Guard the sqrt input so the gradient of sqrt(0) never produces NaN.
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def rotation_matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> standardized quaternions (..., 4) [xyzw].

    Numerically stable branch-free variant (selects the best-conditioned of the
    four candidate quaternions). Ref: geometry.py:655.
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions (wxyz order), each scaled by one of {r, i, j, k}.
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]

    # wxyz -> xyzw
    out = out[..., jnp.array([1, 2, 3, 0])]
    return standardize_quaternion(out)


def quaternion_inverse(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse, (..., 4) [xyzw]. Ref: geometry.py:745."""
    conj = quat * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=quat.dtype)
    norm_sq = jnp.sum(quat * quat, axis=-1, keepdims=True)
    return conj / norm_sq


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two xyzw quaternions (..., 4). Ref: geometry.py:775."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def transform_pose_using_quats_and_trans_2_to_1(
    quats1: jnp.ndarray,
    trans1: jnp.ndarray,
    quats2: jnp.ndarray,
    trans2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Express pose2 (cam2->world) relative to pose1 (cam1->world): cam2->cam1.

    Ref: geometry.py:814.
    """
    inv_q1 = quaternion_inverse(quats1)
    r1_inv = quaternion_to_rotation_matrix(inv_q1)
    t1_inv = -jnp.einsum("...ij,...j->...i", r1_inv, trans1, precision="highest")
    quats = quaternion_multiply(inv_q1, quats2)
    trans = jnp.einsum("...ij,...j->...i", r1_inv, trans2, precision="highest") + t1_inv
    return quats, trans


def pose_quats_trans_to_matrix(
    quats: jnp.ndarray, trans: jnp.ndarray
) -> jnp.ndarray:
    """(..., 4) quats + (..., 3) trans -> (..., 4, 4) SE3 matrices."""
    rot = quaternion_to_rotation_matrix(quats)
    batch = rot.shape[:-2]
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quaternion_slerp(q1: jnp.ndarray, q2: jnp.ndarray,
                     alpha) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (..., 4) [xyzw].

    Shortest-path (sign-corrected); falls back to normalized lerp when the
    quaternions are nearly parallel. alpha=0 -> q1, alpha=1 -> q2.
    Used by WAI pose interpolation (reference wai/camera.py:117 SLERP)."""
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)  # shortest path
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-5
    w1 = jnp.where(near, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta)
                   / jnp.where(near, 1.0, sin_theta))
    w2 = jnp.where(near, alpha, jnp.sin(alpha * theta)
                   / jnp.where(near, 1.0, sin_theta))
    out = w1 * q1 + w2 * q2
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
