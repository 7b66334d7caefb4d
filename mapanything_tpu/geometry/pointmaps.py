"""Pointmap recombination + SE3 helpers, pure jnp.

Mirrors mapanything/utils/geometry.py
(convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap:855, geotrf:964,
inv:1040, closed_form_pose_inverse:1051).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quats import quaternion_to_rotation_matrix


def convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap(
    ray_directions: jnp.ndarray,
    depth_along_ray: jnp.ndarray,
    pose_trans: jnp.ndarray,
    pose_quats: jnp.ndarray,
) -> jnp.ndarray:
    """The factored-geometry recombination: pts_world = R(q) @ (d * dirs) + t.

    Args:
        ray_directions: (..., H, W, 3)
        depth_along_ray: (..., H, W, 1)
        pose_trans: (..., 3)  cam2world translation
        pose_quats: (..., 4)  cam2world rotation, xyzw

    Ref: geometry.py:855.
    """
    pose_quats = pose_quats / jnp.linalg.norm(pose_quats, axis=-1, keepdims=True)
    rot = quaternion_to_rotation_matrix(pose_quats)  # (..., 3, 3)
    pts3d_local = depth_along_ray * ray_directions  # (..., H, W, 3)
    pts3d_world = (
        jnp.einsum("...ij,...hwj->...hwi", rot, pts3d_local, precision="highest")
        + pose_trans[..., None, None, :]
    )
    return pts3d_world


def geotrf(trf: jnp.ndarray, pts: jnp.ndarray, ncol: int | None = None) -> jnp.ndarray:
    """Apply a (..., d, d) or (..., d+1, d+1) transform to (..., *, d) points.

    Simplified jnp version of geometry.py:964 covering the homogeneous and
    linear cases with broadcasting over leading dims.
    """
    d = pts.shape[-1]
    ncol = ncol or d
    if trf.shape[-1] == d:
        out = jnp.einsum("...ij,...j->...i", _expand(trf, pts), pts,
                         precision="highest")
    elif trf.shape[-1] == d + 1:
        lin = _expand(trf[..., :d, :d], pts)
        t = _expand(trf[..., :d, d], pts, mat=False)
        out = jnp.einsum("...ij,...j->...i", lin, pts, precision="highest") + t
    else:
        raise ValueError(f"bad transform shape {trf.shape} for points {pts.shape}")
    return out[..., :ncol]


def _expand(trf: jnp.ndarray, pts: jnp.ndarray, mat: bool = True) -> jnp.ndarray:
    """Insert singleton dims so trf broadcasts against the point dims of pts."""
    trailing = 2 if mat else 1
    n_extra = (pts.ndim - 1) - (trf.ndim - trailing)
    if n_extra <= 0:
        return trf
    shape = trf.shape[: trf.ndim - trailing] + (1,) * n_extra + trf.shape[trf.ndim - trailing:]
    return trf.reshape(shape)


def inv(mat: jnp.ndarray) -> jnp.ndarray:
    """Matrix inverse. Ref: geometry.py:1040."""
    return jnp.linalg.inv(mat)


def closed_form_pose_inverse(
    pose_matrices: jnp.ndarray,
    rotation_matrices: jnp.ndarray | None = None,
    translation_vectors: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Closed-form inverse of SE3 matrices (..., 4, 4): [R^T, -R^T t].

    Ref: geometry.py:1051.
    """
    if rotation_matrices is None:
        rotation_matrices = pose_matrices[..., :3, :3]
    if translation_vectors is None:
        translation_vectors = pose_matrices[..., :3, 3:]
    rot_t = jnp.swapaxes(rotation_matrices, -1, -2)
    new_t = -jnp.matmul(rot_t, translation_vectors, precision="highest")
    top = jnp.concatenate([rot_t, new_t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose_matrices.dtype),
        pose_matrices.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def angle_diff_vec3(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Angle between 3D vectors (..., 3) in radians. Ref: geometry.py:1692.

    Uses a zero-subgradient norm: for exactly parallel vectors (e.g. a
    prediction that is a scaled copy of the GT) the cross product is 0 and
    jnp.linalg.norm would inject NaN into the backward pass."""
    from .norm import safe_norm

    cross_norm = safe_norm(jnp.cross(v1, v2), axis=-1) + eps
    dot = jnp.sum(v1 * v2, axis=-1)
    return jnp.arctan2(cross_norm, dot)


def rigid_points_registration(
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = False,
):
    """Weighted Kabsch/Umeyama: the rigid transform (R, t[, s]) minimizing
    sum_i w_i || s*R @ a_i + t - b_i ||^2.

    The on-device equivalent of roma.rigid_points_registration used by the
    reference's DUSt3R-lineage pose recovery (e.g. reference
    mapanything/models/external/must3r/__init__.py pose head) — closed form
    via a 3x3 SVD, jit/vmap friendly.

    Args:
        pts_a, pts_b: (..., N, 3)
        weights: optional (..., N) nonnegative
        with_scale: also estimate a uniform scale.

    Returns:
        (R (..., 3, 3), t (..., 3)) or (R, t, s (...,)).
    """
    if weights is None:
        weights = jnp.ones(pts_a.shape[:-1], pts_a.dtype)
    w = weights / jnp.clip(
        jnp.sum(weights, axis=-1, keepdims=True), 1e-12, None
    )
    mu_a = jnp.sum(pts_a * w[..., None], axis=-2)  # (..., 3)
    mu_b = jnp.sum(pts_b * w[..., None], axis=-2)
    ac = pts_a - mu_a[..., None, :]
    bc = pts_b - mu_b[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", bc * w[..., None], ac)
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.concatenate(
        [jnp.ones((*det.shape, 2), cov.dtype), det[..., None]], axis=-1
    )
    r = jnp.einsum("...ij,...j,...jk->...ik", u, d, vt)
    if with_scale:
        var_a = jnp.sum(w * jnp.sum(ac * ac, axis=-1), axis=-1)
        scale = jnp.sum(s * d, axis=-1) / jnp.clip(var_a, 1e-12, None)
        t = mu_b - scale[..., None] * jnp.einsum("...ij,...j->...i", r, mu_a)
        return r, t, scale
    t = mu_b - jnp.einsum("...ij,...j->...i", r, mu_a)
    return r, t


def transform_pts3d(pts3d: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a homogeneous 4x4 (or batched ...x4x4) transform to a pointmap.

    Args:
        pts3d: (..., H, W, 3)
        transformation: (..., 4, 4)

    Ref: geometry.py:117."""
    r = transformation[..., :3, :3]
    t = transformation[..., :3, 3]
    return (
        jnp.einsum("...ik,...hwk->...hwi", r, pts3d, precision="highest")
        + t[..., None, None, :]
    )


def relative_pose_transformation(
    trans_01: jnp.ndarray, trans_02: jnp.ndarray
) -> jnp.ndarray:
    """Relative homogeneous transform T_1^2 = (T_0^1)^-1 @ T_0^2.

    Args:
        trans_01, trans_02: (..., 4, 4)

    Ref: geometry.py:1106."""
    return jnp.einsum(
        "...ij,...jk->...ik", inv(trans_01), trans_02, precision="highest"
    )


def convert_raymap_z_depth_quats_to_pointmap(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth: jnp.ndarray,
    quats: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel raymap + z-depth + per-pixel unit quats -> world pointmap.

    Args:
        ray_origins, ray_directions: (..., H, W, 3)
        depth: (..., H, W, 1)
        quats: (..., H, W, 4) xyzw per-pixel rotations

    Ref: geometry.py:532."""
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    rot = quaternion_to_rotation_matrix(quats)  # (..., H, W, 3, 3)
    pts_local = depth * ray_directions
    rotated = jnp.einsum(
        "...ik,...k->...i", rot, pts_local, precision="highest"
    )
    return ray_origins + rotated
