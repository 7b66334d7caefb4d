"""Pairwise covisibility computation, jitted jax.

Rebuild of the reference's offline covisibility stage
(data_processing/wai_processing/scripts/covisibility.py:32-140 +
configs/covisibility/covisibility_gt_depth.yaml): for every source frame,
unproject its depth to world points, reproject into every other frame,
compare the expected depth against the target's depth map, and score the
fraction of consistent pixels. The output is the NxN matrix the samplers'
covisibility random walk consumes (base_dataset.py).

TPU-native shape: one jit, lax.map over source frames (bounds memory to
F x H x W per step), everything inside vmapped — no host loop per pair.
Depths are nearest-downsampled to `target_size` long side first, like the
reference's 224 default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _downsample(depths: np.ndarray, intrinsics: np.ndarray, target: int):
    f, h, w = depths.shape
    scale = target / max(h, w)
    if scale >= 1.0:
        return depths, intrinsics
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    ri = np.clip((np.arange(nh) + 0.5) * h / nh, 0, h - 1).astype(np.int64)
    ci = np.clip((np.arange(nw) + 0.5) * w / nw, 0, w - 1).astype(np.int64)
    d = depths[:, ri][:, :, ci]
    K = intrinsics.copy().astype(np.float32)
    K[:, 0, :] *= nw / w
    K[:, 1, :] *= nh / h
    return d, K


def _unproject_world(depths, intrinsics, cam2world):
    """(F,h,w,3) world points from per-frame z-depth + K + cam2world."""
    f, h, w = depths.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (h,w)
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]
    z = depths
    x_c = (gx[None] - cx) * z / fx
    y_c = (gy[None] - cy) * z / fy
    pts_cam = jnp.stack([x_c, y_c, z], axis=-1)
    rot = cam2world[:, :3, :3]
    return jnp.einsum("fij,fhwj->fhwi", rot, pts_cam) \
        + cam2world[:, :3, 3][:, None, None, :]


@functools.partial(jax.jit, static_argnames=("denominator_mode",))
def _covis_core(depths, intrinsics, cam2world,
                thres, temp, rel_thres, denominator_mode):
    f, h, w = depths.shape
    w2c = jnp.linalg.inv(cam2world)  # (F,4,4)
    world = _unproject_world(depths, intrinsics, cam2world)
    valid_depth = depths > 0  # (F,h,w)
    n_valid = jnp.maximum(valid_depth.sum(axis=(1, 2)), 1)  # (F,)

    def one_source(i):
        wp = world[i]              # (h,w,3)
        src_valid = valid_depth[i]

        def to_target(j):
            pc = jnp.einsum("ij,hwj->hwi", w2c[j, :3, :3], wp) \
                + w2c[j, :3, 3]
            zt = pc[..., 2]
            u = intrinsics[j, 0, 0] * pc[..., 0] / jnp.maximum(zt, 1e-6) \
                + intrinsics[j, 0, 2]
            v = intrinsics[j, 1, 1] * pc[..., 1] / jnp.maximum(zt, 1e-6) \
                + intrinsics[j, 1, 2]
            ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
            in_img = (u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) \
                & (v <= h - 0.5)
            valid = src_valid & (zt > 0) & in_img
            depth_lu = depths[j][vi, ui]  # nearest depth lookup
            err = jnp.abs(zt - depth_lu)
            # reference threshold: abs + rel*expected - log(0.5)*temp
            assoc = thres + rel_thres * zt + 0.6931471805599453 * temp
            ok = valid & (err < assoc) & (depth_lu > 0)
            count = ok.sum()
            if denominator_mode == "valid_target_depth":
                return jnp.clip(count / n_valid[j], 0.0, 1.0)
            return count / (h * w)

        return jax.vmap(to_target)(jnp.arange(f))

    return jax.lax.map(one_source, jnp.arange(f))


def compute_pairwise_covisibility(
    depths: np.ndarray,
    intrinsics: np.ndarray,
    cam2world: np.ndarray,
    target_size: int = 224,
    depth_assoc_error_thres: float = 0.1,
    depth_assoc_error_temp: float = 0.1,
    depth_assoc_rel_error_thres: float = 0.005,
    denominator_mode: str = "valid_target_depth",
) -> np.ndarray:
    """Pairwise covisibility (F, F) in [0, 1].

    Args:
        depths: (F, H, W) z-depth, 0 = invalid.
        intrinsics: (F, 3, 3) pinhole K.
        cam2world: (F, 4, 4) opencv cam2world poses.
        target_size: depths are nearest-downsampled to this long side first
            (covisibility_gt_depth.yaml:16).
        denominator_mode: "valid_target_depth" | "full"
            (covisibility.py:117-131).
    """
    d, K = _downsample(np.asarray(depths, np.float32),
                       np.asarray(intrinsics, np.float32), target_size)
    out = _covis_core(
        jnp.asarray(d), jnp.asarray(K),
        jnp.asarray(np.asarray(cam2world, np.float32)),
        float(depth_assoc_error_thres), float(depth_assoc_error_temp),
        float(depth_assoc_rel_error_thres), denominator_mode,
    )
    return np.asarray(out)


@jax.jit
def _conf_core(depths, intrinsics, cam2world, overlap,
               abs_thres, rel_thres):
    f, h, w = depths.shape
    w2c = jnp.linalg.inv(cam2world)
    world = _unproject_world(depths, intrinsics, cam2world)
    valid_depth = depths > 0

    def one_source(i):
        wp = world[i]  # (h,w,3)
        src_valid = valid_depth[i]

        def to_target(j):
            pc = jnp.einsum("ij,hwj->hwi", w2c[j, :3, :3], wp) + w2c[j, :3, 3]
            zt = pc[..., 2]
            zsafe = jnp.where(zt > 0.04, zt, 1.0)
            u = intrinsics[j, 0, 0] * pc[..., 0] / zsafe \
                + intrinsics[j, 0, 2]
            v = intrinsics[j, 1, 1] * pc[..., 1] / zsafe \
                + intrinsics[j, 1, 2]
            # reference in_image (m_ops.py in_image: coords >= 0 and
            # strictly < size, z > 0.04) gated by the source's valid depth
            valid = (src_valid & (zt > 0.04)
                     & (u >= 0) & (v >= 0) & (u < w) & (v < h)
                     & overlap[i, j])
            # nearest depth lookup = grid_sample(nearest, align_corners)
            # with clamped coords: round then clamp to the border
            ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
            err = jnp.abs(zt - depths[j][vi, ui])
            thr = abs_thres + rel_thres * zt
            # strict <: a projection into an invalid (0-depth) target
            # pixel reads err == zt > thr and counts as an outlier — the
            # reference behaves the same (its valid_mask never checks the
            # TARGET depth, depth_consistency_confidence.py:112-139)
            inl = (valid & (err < thr)).astype(jnp.int32)
            outl = (valid & (err > thr)).astype(jnp.int32)
            return inl, outl

        inl, outl = jax.vmap(to_target)(jnp.arange(f))  # (F,h,w)
        ni = inl.sum(axis=0).astype(jnp.float32)
        no = outl.sum(axis=0).astype(jnp.float32)
        return ni / (ni + no + 1e-10)

    return jax.lax.map(one_source, jnp.arange(f))


def compute_depth_consistency_confidence(
    depths: np.ndarray,
    intrinsics: np.ndarray,
    cam2world: np.ndarray,
    target_size: int = 360,
    depth_assoc_error_thres: float = 0.02,
    depth_assoc_rel_error_thres: float = 0.02,
    overlap: "np.ndarray | None" = None,
) -> np.ndarray:
    """Per-pixel depth-consistency confidence in [0, 1] for every frame.

    Rebuild of the reference's pseudo-depth filtering stage
    (data_processing/wai_processing/scripts/depth_consistency_confidence.py
    :36-158 + depth_consistency_confidence_mvsa.yaml defaults): each
    frame's depth unprojects to world points, reprojects into every other
    frame, and each pixel scores inliers / (inliers + outliers) of the
    depth-association test err < abs + rel * expected. Runs as one jit
    (lax.map over source frames, vmap over targets) instead of the
    reference's per-frame torch loop.

    Args:
        depths: (F, H, W) z-depth, 0 = invalid.
        intrinsics: (F, 3, 3); cam2world: (F, 4, 4) opencv.
        target_size: long-side working resolution (yaml: 360).
        overlap: optional (F, F) bool gate — the reference's frustum
            intersection check; None tests every pair (self included,
            matching the reference's ungated ov_inds).

    Returns:
        (F, h, w) confidence maps at the working resolution.
    """
    d, K = _downsample(np.asarray(depths, np.float32),
                       np.asarray(intrinsics, np.float32), target_size)
    f = d.shape[0]
    ov = (np.ones((f, f), bool) if overlap is None
          else np.asarray(overlap, bool))
    out = _conf_core(
        jnp.asarray(d), jnp.asarray(K),
        jnp.asarray(np.asarray(cam2world, np.float32)), jnp.asarray(ov),
        float(depth_assoc_error_thres), float(depth_assoc_rel_error_thres),
    )
    return np.asarray(out)
