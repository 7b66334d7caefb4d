"""Synthetic multi-view batches with geometrically-consistent GT.

Used by tests, the multi-chip dryrun, and train-step benchmarks: random
smooth depth + known intrinsics/poses are converted to the exact GT fields
the loss stack expects (pointmaps, rays, depth-along-ray, validity masks) —
the same derivation the reference datasets do on the host
(base_dataset.py:454-620 via geometry.get_absolute_pointmaps_and_rays_info).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from .. import geometry as G


def make_synthetic_batch(
    batch_size: int = 1,
    num_views: int = 2,
    height: int = 28,
    width: int = 42,
    seed: int = 0,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build {"views": model inputs, "gt": supervision} with consistent geometry."""
    rng = np.random.default_rng(seed)
    b, v, h, w = batch_size, num_views, height, width

    f = 0.8 * max(h, w)
    K = np.zeros((b, v, 3, 3), np.float32)
    K[..., 0, 0] = f
    K[..., 1, 1] = f
    K[..., 0, 2] = w / 2
    K[..., 1, 2] = h / 2
    K[..., 2, 2] = 1

    # smooth positive depth
    base = rng.uniform(2.0, 4.0, size=(b, v, 1, 1)).astype(np.float32)
    ramp = np.linspace(0, 1, h, dtype=np.float32)[None, None, :, None]
    depth_z = base + ramp + 0.1 * rng.standard_normal((b, v, h, w)).astype(np.float32) ** 2

    # small random poses (cam2world)
    quats = rng.normal(size=(b, v, 4)).astype(np.float32) * np.array(
        [0.05, 0.05, 0.05, 1.0], np.float32
    )
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    trans = 0.2 * rng.standard_normal((b, v, 3)).astype(np.float32)

    Kj = jnp.asarray(K)
    dz = jnp.asarray(depth_z)
    qj = jnp.asarray(quats)
    tj = jnp.asarray(trans)
    poses = G.pose_quats_trans_to_matrix(qj, tj)

    pts3d, valid = G.depthmap_to_world_frame(dz, Kj, poses)
    pts3d_cam, _ = G.depthmap_to_camera_frame(dz, Kj)
    _, rays = G.get_rays_in_camera_frame(Kj, h, w, normalize_to_unit_sphere=True)
    depth_along_ray = jnp.linalg.norm(pts3d_cam, axis=-1, keepdims=True)

    imgs = jnp.asarray(
        rng.normal(size=(b, v, h, w, 3)).astype(np.float32) * 0.5
    )

    views = {
        "img": imgs,
        "ray_directions_cam": rays,
        "depth_along_ray": depth_along_ray,
        "camera_pose_quats": qj,
        "camera_pose_trans": tj,
        "is_metric_scale": jnp.ones((b, v), dtype=bool),
    }
    gt = {
        "pts3d": pts3d,
        "pts3d_cam": pts3d_cam,
        "ray_directions_cam": rays,
        "depth_along_ray": depth_along_ray,
        "camera_pose_quats": qj,
        "camera_pose_trans": tj,
        "valid_mask": valid,
        "non_ambiguous_mask": jnp.ones((b, v, h, w), dtype=bool),
        "is_metric_scale": jnp.ones((b,), dtype=bool),
        "is_synthetic": jnp.zeros((b,), dtype=bool),
    }
    return {"views": views, "gt": gt}
