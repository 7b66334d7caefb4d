"""Mesh -> depth/normal rendering on device (no nvdiffrast/pyrender).

The WAI rendering stage (reference
data_processing/wai_processing/scripts/run_rendering.py:38-455) bakes
GT depth from scene meshes with nvdiffrast or pyrender — GPU
rasterizers that don't exist here. The TPU-native redesign ray-casts
instead: every pixel's ray is intersected with every triangle
(Moller-Trumbore) under a two-level scan — pixels chunked so the
(pixel, triangle) intersection block stays in VMEM-friendly sizes,
triangles chunked with a running z-min carry. No polygon clipping, no
raster state: triangles behind the camera simply never intersect
forward rays, and the z-buffer is a jnp.minimum reduction.

FLOP shape: a 480x360 render against a 100k-triangle mesh is ~5e11
multiply-adds — well under a second of MXU-free VPU work on one chip,
and embarrassingly parallel over both axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("hw", "pixel_chunk",
                                             "tri_chunk"))
def _raycast_depth(verts, tris, K, cam2world, hw,
                   pixel_chunk=8192, tri_chunk=1024):
    h, w = hw
    w2c = jnp.linalg.inv(cam2world)
    v_cam = verts @ w2c[:3, :3].T + w2c[:3, 3]  # (N, 3)
    a = v_cam[tris[:, 0]]  # (T, 3)
    e1 = v_cam[tris[:, 1]] - a
    e2 = v_cam[tris[:, 2]] - a

    # pixel rays scaled so the intersection parameter t IS z-depth
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dirs = jnp.stack([
        (xs - K[0, 2]) / K[0, 0],
        (ys - K[1, 2]) / K[1, 1],
        jnp.ones_like(xs),
    ], axis=-1).reshape(-1, 3)  # (P, 3), z-component 1

    n_pix = dirs.shape[0]
    pad_pix = (-n_pix) % pixel_chunk
    dirs = jnp.pad(dirs, ((0, pad_pix), (0, 0)),
                   constant_values=1.0)
    n_tri = a.shape[0]
    pad_tri = (-n_tri) % tri_chunk
    # padded triangles are degenerate (e1 = e2 = 0): det==0 -> no hit
    a_p = jnp.pad(a, ((0, pad_tri), (0, 0)))
    e1_p = jnp.pad(e1, ((0, pad_tri), (0, 0)))
    e2_p = jnp.pad(e2, ((0, pad_tri), (0, 0)))

    def pixel_block(d_blk):
        # d_blk: (C, 3)
        def tri_step(zmin, tri_blk):
            ta, te1, te2 = tri_blk  # (Tc, 3) each
            # Moller-Trumbore, batched (C, Tc)
            pvec = jnp.cross(d_blk[:, None, :], te2[None, :, :])
            det = jnp.sum(te1[None] * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = -ta[None, :, :]  # ray origin is the camera center
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, te1[None, :, :])
            v = jnp.sum(d_blk[:, None, :] * qvec, axis=-1) * inv_det
            t = jnp.sum(te2[None] * qvec, axis=-1) * inv_det
            # epsilon-padded inside test: rays crossing exactly on a
            # shared edge must hit at least one of the two triangles
            # (strict tests leak single-pixel holes along mesh seams)
            eps = 1e-5
            hit = ((jnp.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps)
                   & (u + v <= 1 + eps) & (t > 1e-6))
            t = jnp.where(hit, t, jnp.inf)
            return jnp.minimum(zmin, t.min(axis=1)), None

        tri_blocks = (
            a_p.reshape(-1, tri_chunk, 3),
            e1_p.reshape(-1, tri_chunk, 3),
            e2_p.reshape(-1, tri_chunk, 3),
        )
        z0 = jnp.full((d_blk.shape[0],), jnp.inf)
        z, _ = jax.lax.scan(tri_step, z0, tri_blocks)
        return z

    z = jax.lax.map(pixel_block, dirs.reshape(-1, pixel_chunk, 3))
    z = z.reshape(-1)[:n_pix].reshape(h, w)
    return jnp.where(jnp.isfinite(z), z, 0.0)


def render_mesh_depth(
    vertices: np.ndarray,
    faces: np.ndarray,
    intrinsics: np.ndarray,
    cam2world: np.ndarray,
    hw,
    pixel_chunk: int = 8192,
    tri_chunk: int = 1024,
) -> np.ndarray:
    """z-depth render of a triangle mesh from a pinhole camera.

    Args:
        vertices: (N, 3) world-frame positions.
        faces: (T, 3) int vertex indices.
        intrinsics: (3, 3) K; cam2world: (4, 4) opencv pose.
        hw: (height, width) of the output.

    Returns:
        (H, W) float32 z-depth, 0 where no surface is hit.
    """
    return np.asarray(_raycast_depth(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(intrinsics, jnp.float32),
        jnp.asarray(cam2world, jnp.float32),
        (int(hw[0]), int(hw[1])),
        pixel_chunk=pixel_chunk, tri_chunk=tri_chunk,
    ))


def render_scene_depths(
    vertices: np.ndarray,
    faces: np.ndarray,
    intrinsics: np.ndarray,
    cam2worlds: np.ndarray,
    hw,
    **kwargs,
) -> np.ndarray:
    """Render every frame of a scene: (F, H, W) depths from (F, 3, 3) /
    (F, 4, 4) cameras against one shared mesh (the reference stage's
    per-scene loop, run_rendering.py:213-455)."""
    out = [
        render_mesh_depth(vertices, faces, intrinsics[i], cam2worlds[i],
                          hw, **kwargs)
        for i in range(len(cam2worlds))
    ]
    return np.stack(out)
