"""Normalization helpers used by the geometric-prior encoders and losses.

Mirrors mapanything/utils/geometry.py
(normalize_depth_using_non_zero_pixels:1523, normalize_pose_translations:1558,
normalize_multiple_pointclouds:1598, apply_log_to_norm:1666) — rewritten for
stacked-view tensors (B, V, ...) instead of Python lists.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a ZERO subgradient at x == 0 (torch's convention).

    jnp.linalg.norm has a NaN gradient at exactly-zero vectors — which is
    precisely what masked-out pixels are (pts * valid). Any training loss
    normalizing masked pointclouds through it silently poisons the whole
    gradient with NaNs; torch.norm defines the subgradient 0 there, so the
    reference never sees this."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    zero = sq == 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))


def normalize_depth_using_non_zero_pixels(
    depth: jnp.ndarray, return_norm_factor: bool = False
):
    """Normalize depth (..., H, W, 1) by the mean of its non-zero pixels.

    Ref: geometry.py:1523 (reference is (B, H, W, 1); here any leading dims).
    """
    assert depth.shape[-1] == 1
    valid = depth > 0
    valid_sum = jnp.sum(depth * valid, axis=(-3, -2, -1))
    valid_count = jnp.sum(valid, axis=(-3, -2, -1))
    norm_factor = valid_sum / (valid_count + 1e-8)
    norm_factor = jnp.clip(norm_factor, 1e-8, None)
    normalized = depth / norm_factor[..., None, None, None]
    if return_norm_factor:
        return normalized, norm_factor
    return normalized


def normalize_pose_translations(
    pose_translations: jnp.ndarray, return_norm_factor: bool = False
):
    """Normalize translations (..., V, 3) by the mean norm of non-zero ones.

    Ref: geometry.py:1558.
    """
    assert pose_translations.shape[-1] == 3
    dis = safe_norm(pose_translations, axis=-1)  # (..., V)
    nonzero = dis > 0
    norm_factor = jnp.sum(dis, axis=-1) / (jnp.sum(nonzero, axis=-1) + 1e-8)
    norm_factor = jnp.clip(norm_factor, 1e-8, None)
    normalized = pose_translations / norm_factor[..., None, None]
    if return_norm_factor:
        return normalized, norm_factor
    return normalized


def normalize_multiple_pointclouds(
    pts: jnp.ndarray,
    valid_masks: jnp.ndarray | None = None,
    norm_mode: str = "avg_dis",
    ret_factor: bool = False,
):
    """Jointly normalize multi-view pointmaps by average distance to origin.

    Stacked-view variant of geometry.py:1598: the reference takes a list of
    (B, H, W, 3) tensors; here views live on axis 1.

    Args:
        pts: (B, V, H, W, 3)
        valid_masks: optional (B, V, H, W) bool
        norm_mode: "{avg}_{dis|log1p|warp-log1p}"
        ret_factor: also return the (B, 1, 1, 1, 1) norm factor

    Returns:
        normalized pts (and factor if requested).
    """
    norm, dis_mode = norm_mode.split("_")
    assert norm == "avg", f"unsupported norm {norm}"
    b, v = pts.shape[:2]

    if valid_masks is None:
        valid_masks = jnp.ones(pts.shape[:-1], dtype=bool)
    masked_pts = pts * valid_masks[..., None]
    all_dis = safe_norm(masked_pts, axis=-1)  # (B, V, H, W)

    if dis_mode == "dis":
        pass
    elif dis_mode == "log1p":
        all_dis = jnp.log1p(all_dis)
    elif dis_mode == "warp-log1p":
        log_dis = jnp.log1p(all_dis)
        warp = log_dis / jnp.clip(all_dis, 1e-8, None)
        pts = pts * warp[..., None]
        all_dis = log_dis
    else:
        raise ValueError(f"bad dis_mode {dis_mode}")

    nnz = jnp.sum(valid_masks.reshape(b, -1), axis=-1)
    norm_factor = jnp.sum((all_dis * valid_masks).reshape(b, -1), axis=-1) / (nnz + 1e-8)
    norm_factor = jnp.clip(norm_factor, 1e-8, None)
    factor = norm_factor[:, None, None, None, None]
    res = pts / factor
    if ret_factor:
        return res, factor
    return res


def apply_log_to_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Rescale vectors (..., C) to log1p of their norm. Ref: geometry.py:1666."""
    d = safe_norm(x, axis=-1, keepdims=True)
    x = x / jnp.clip(d, 1e-8, None)
    return x * jnp.log1p(d)
