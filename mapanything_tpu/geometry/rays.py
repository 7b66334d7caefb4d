"""Pixel-grid / ray / intrinsics math, pure jnp, batch-polymorphic.

Semantics mirror mapanything/utils/geometry.py (get_rays_in_camera_frame:186,
recover_pinhole_intrinsics_from_ray_directions:304, transform_rays:450,
convert_z_depth_to_depth_along_ray:496, depthmap_to_camera_frame:24,
depthmap_to_world_frame:76, project_pts3d_to_image:152) rebuilt for
static-shape XLA compilation: all branching is on static shapes only.
"""

from __future__ import annotations

import jax.numpy as jnp


def xy_grid(width: int, height: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coordinate grids (H, W) each: x[j, i] = i, y[j, i] = j."""
    x = jnp.arange(width, dtype=dtype)[None, :].repeat(height, axis=0)
    y = jnp.arange(height, dtype=dtype)[:, None].repeat(width, axis=1)
    return x, y


def _k_params(intrinsics: jnp.ndarray):
    """Extract fx, fy, cx, cy from (..., 3, 3), each shaped (..., 1, 1)."""
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    return fx, fy, cx, cy


def depthmap_to_camera_frame(
    depthmap: jnp.ndarray, intrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth (..., H, W) + K (..., 3, 3) -> camera-frame pointmap (..., H, W, 3), valid mask.

    Ref: geometry.py:24.
    """
    height, width = depthmap.shape[-2:]
    x, y = xy_grid(width, height, dtype=depthmap.dtype)
    fx, fy, cx, cy = _k_params(intrinsics)
    xx = (x - cx) * depthmap / fx
    yy = (y - cy) * depthmap / fy
    pts3d_cam = jnp.stack([xx, yy, depthmap], axis=-1)
    valid_mask = depthmap > 0.0
    return pts3d_cam, valid_mask


def depthmap_to_world_frame(
    depthmap: jnp.ndarray,
    intrinsics: jnp.ndarray,
    camera_pose: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth + K (+ optional cam2world 4x4) -> world-frame pointmap. Ref: geometry.py:76."""
    pts3d_cam, valid_mask = depthmap_to_camera_frame(depthmap, intrinsics)
    if camera_pose is None:
        return pts3d_cam, valid_mask
    rot = camera_pose[..., :3, :3]
    t = camera_pose[..., :3, 3]
    pts3d_world = (
        jnp.einsum("...ij,...hwj->...hwi", rot, pts3d_cam, precision="highest") + t[..., None, None, :]
    )
    return pts3d_world, valid_mask


def project_pts3d_to_image(
    pts3d: jnp.ndarray, intrinsics: jnp.ndarray, return_z_dim: bool
) -> jnp.ndarray:
    """Project camera-frame points (..., H, W, 3) with K (..., 3, 3). Ref: geometry.py:152."""
    proj = jnp.einsum("...ik,...hwk->...hwi", intrinsics, pts3d, precision="highest")
    z = jnp.clip(proj[..., 2:3], 1e-6, None)
    xy = proj[..., :2] / z
    if return_z_dim:
        return jnp.concatenate([xy, proj[..., 2:3]], axis=-1)
    return xy


def get_rays_in_camera_frame(
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    normalize_to_unit_sphere: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """K (..., 3, 3) -> ray origins (zeros) + directions (..., H, W, 3).

    Ref: geometry.py:186.
    """
    x, y = xy_grid(width, height, dtype=intrinsics.dtype)
    fx, fy, cx, cy = _k_params(intrinsics)
    xx = (x - cx) / fx
    yy = (y - cy) / fy
    dirs = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    if normalize_to_unit_sphere:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.zeros(intrinsics.shape[:-2] + (height, width, 3), dtype=intrinsics.dtype)
    return origins, dirs


def get_rays_in_world_frame(
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    normalize_to_unit_sphere: bool,
    camera_pose: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays in camera frame, optionally moved to world frame. Ref: geometry.py:244."""
    origins, dirs = get_rays_in_camera_frame(
        intrinsics, height, width, normalize_to_unit_sphere
    )
    if camera_pose is None:
        return origins, dirs
    return transform_rays(origins, dirs, camera_pose)


def transform_rays(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    transformation: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply SE3 (..., 4, 4) to (..., H, W, 3) origins (points) + dirs (vectors).

    Ref: geometry.py:450.
    """
    rot = transformation[..., :3, :3]
    t = transformation[..., :3, 3]
    new_origins = jnp.einsum("...ij,...hwj->...hwi", rot, ray_origins, precision="highest") + t[..., None, None, :]
    new_dirs = jnp.einsum("...ij,...hwj->...hwi", rot, ray_directions, precision="highest")
    return new_origins, new_dirs


def convert_z_depth_to_depth_along_ray(
    z_depth: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Z-depth (..., H, W) + K -> Euclidean depth along the pixel ray (..., H, W).

    Ref: geometry.py:496.
    """
    pts3d_cam, _ = depthmap_to_camera_frame(z_depth, intrinsics)
    return jnp.linalg.norm(pts3d_cam, axis=-1)


def depth_along_ray_from_z_depth_and_rays(
    depth_z: jnp.ndarray, ray_directions: jnp.ndarray
) -> jnp.ndarray:
    """Z-depth (..., H, W, 1) + unit rays (..., H, W, 3) -> depth along ray (..., H, W, 1).

    Matches inference.py:244-252: scale rays to the unit z plane then take the norm.
    """
    rays_unit_plane = ray_directions / ray_directions[..., 2:3]
    pts3d_cam = depth_z * rays_unit_plane
    return jnp.linalg.norm(pts3d_cam, axis=-1, keepdims=True)


def recover_pinhole_intrinsics_from_ray_directions(
    ray_directions: jnp.ndarray, use_geometric_calculation: bool = False
) -> jnp.ndarray:
    """Least-squares recovery of pinhole K from unit ray directions (..., H, W, 3).

    Solves x = cx + fx * (dx/dz) (and same for y) with 2x2 normal equations over
    a subsampled pixel grid (step = max(1, dim // 50)), matching the reference
    regression branch; for >1MP inputs or on request, uses the direct geometric
    5-point calculation. Ref: geometry.py:304.
    """
    batch_shape = ray_directions.shape[:-3]
    height, width, _ = ray_directions.shape[-3:]
    dirs = ray_directions.reshape((-1, height, width, 3))
    bsz = dirs.shape[0]
    dtype = dirs.dtype

    is_high_res = height * width > 1_000_000
    if is_high_res or use_geometric_calculation:
        ch, cw = height // 2, width // 2
        qw, tqw = width // 4, 3 * width // 4
        qh, tqh = height // 4, 3 * height // 4
        center = dirs[:, ch, cw, :]
        left = dirs[:, ch, qw, :]
        right = dirs[:, ch, tqw, :]
        top = dirs[:, qh, cw, :]
        bottom = dirs[:, tqh, cw, :]
        center = center / center[:, 2:3]
        left = left / left[:, 2:3]
        right = right / right[:, 2:3]
        top = top / top[:, 2:3]
        bottom = bottom / bottom[:, 2:3]
        fx_left = (qw - cw) / (left[:, 0] - center[:, 0])
        fx_right = (tqw - cw) / (right[:, 0] - center[:, 0])
        fx = (fx_left + fx_right) / 2
        cx = cw - fx * center[:, 0]
        fy_top = (qh - ch) / (top[:, 1] - center[:, 1])
        fy_bottom = (tqh - ch) / (bottom[:, 1] - center[:, 1])
        fy = (fy_top + fy_bottom) / 2
        cy = ch - fy * center[:, 1]
    else:
        step_h = max(1, height // 50)
        step_w = max(1, width // 50)
        h_idx = jnp.arange(0, height, step_h)
        w_idx = jnp.arange(0, width, step_w)
        x, y = xy_grid(width, height, dtype=dtype)
        x_s = x[h_idx[:, None], w_idx[None, :]].reshape(-1)
        y_s = y[h_idx[:, None], w_idx[None, :]].reshape(-1)
        rays_s = dirs[:, h_idx[:, None], w_idx[None, :], :].reshape(bsz, -1, 3)

        dx, dy, dz = rays_s[..., 0], rays_s[..., 1], rays_s[..., 2]
        ratio_x = dx / dz
        ratio_y = dy / dz

        def solve_axis(ratio, coord):
            # Normal equations for coord = c + f * ratio  (A = [1, ratio]).
            # ratio: (B, N); coord: (N,) pixel coordinates shared across batch.
            n = ratio.shape[-1]
            s_r = jnp.sum(ratio, axis=-1)
            s_rr = jnp.sum(ratio * ratio, axis=-1)
            s_c = jnp.sum(coord)
            s_rc = jnp.sum(ratio * coord[None, :], axis=-1)
            det = n * s_rr - s_r * s_r
            c = (s_rr * s_c - s_r * s_rc) / det
            f = (n * s_rc - s_r * s_c) / det
            return c, f

        cx, fx = solve_axis(ratio_x, x_s)
        cy, fy = solve_axis(ratio_y, y_s)

    k = jnp.zeros((bsz, 3, 3), dtype=dtype)
    k = k.at[:, 0, 0].set(fx)
    k = k.at[:, 1, 1].set(fy)
    k = k.at[:, 0, 2].set(cx)
    k = k.at[:, 1, 2].set(cy)
    k = k.at[:, 2, 2].set(1.0)
    return k.reshape(batch_shape + (3, 3))


def colmap_to_opencv_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Shift principal point by -0.5 px (COLMAP -> OpenCV convention). Ref: geometry.py:1495."""
    offset = jnp.zeros_like(K).at[..., 0, 2].set(0.5).at[..., 1, 2].set(0.5)
    return K - offset


def opencv_to_colmap_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Shift principal point by +0.5 px (OpenCV -> COLMAP convention). Ref: geometry.py:1509."""
    offset = jnp.zeros_like(K).at[..., 0, 2].set(0.5).at[..., 1, 2].set(0.5)
    return K + offset
