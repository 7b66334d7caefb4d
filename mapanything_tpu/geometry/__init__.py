"""Pure-jnp geometry math core (the TPU-native rebuild of
mapanything/utils/geometry.py, ~50 functions, see SURVEY.md §2.4)."""

from .edges import (
    depth_edge,
    max_pool_2d,
    normals_edge,
    points_to_normals,
)
from .norm import (
    apply_log_to_norm,
    normalize_depth_using_non_zero_pixels,
    normalize_multiple_pointclouds,
    normalize_pose_translations,
    safe_norm,
)
from .pointmaps import (
    angle_diff_vec3,
    rigid_points_registration,
    closed_form_pose_inverse,
    convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap,
    geotrf,
    inv,
)
from .quats import (
    pose_quats_trans_to_matrix,
    quaternion_inverse,
    quaternion_multiply,
    quaternion_to_rotation_matrix,
    rotation_matrix_to_quaternion,
    standardize_quaternion,
    transform_pose_using_quats_and_trans_2_to_1,
)
from .rays import (
    colmap_to_opencv_intrinsics,
    convert_z_depth_to_depth_along_ray,
    depth_along_ray_from_z_depth_and_rays,
    depthmap_to_camera_frame,
    depthmap_to_world_frame,
    get_rays_in_camera_frame,
    get_rays_in_world_frame,
    opencv_to_colmap_intrinsics,
    project_pts3d_to_image,
    recover_pinhole_intrinsics_from_ray_directions,
    transform_rays,
    xy_grid,
)

__all__ = [
    "apply_log_to_norm",
    "safe_norm",
    "angle_diff_vec3",
    "closed_form_pose_inverse",
    "colmap_to_opencv_intrinsics",
    "convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap",
    "convert_z_depth_to_depth_along_ray",
    "depth_along_ray_from_z_depth_and_rays",
    "depth_edge",
    "depthmap_to_camera_frame",
    "depthmap_to_world_frame",
    "geotrf",
    "rigid_points_registration",
    "get_rays_in_camera_frame",
    "get_rays_in_world_frame",
    "inv",
    "max_pool_2d",
    "normalize_depth_using_non_zero_pixels",
    "normalize_multiple_pointclouds",
    "normalize_pose_translations",
    "normals_edge",
    "opencv_to_colmap_intrinsics",
    "points_to_normals",
    "pose_quats_trans_to_matrix",
    "project_pts3d_to_image",
    "quaternion_inverse",
    "quaternion_multiply",
    "quaternion_to_rotation_matrix",
    "recover_pinhole_intrinsics_from_ray_directions",
    "rotation_matrix_to_quaternion",
    "standardize_quaternion",
    "transform_pose_using_quats_and_trans_2_to_1",
    "transform_rays",
    "xy_grid",
]
