"""On-device edge/normal masks (the reference runs these host-side in numpy).

Replaces the per-image host loops of mapanything/utils/geometry.py
(points_to_normals:1717, max_pool_2d:1988, depth_edge:2031, normals_edge:2129)
and mapanything/utils/inference.py:417-454 with batched jnp implemented via
lax.reduce_window — so confidence/edge masking stays on TPU inside the jitted
inference postprocess instead of round-tripping to CPU numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_2d(x: jnp.ndarray, kernel_size: int, stride: int = 1,
                padding: int | None = None) -> jnp.ndarray:
    """2D max pool over the last two axes with -inf padding.

    Ref: geometry.py:1988 (numpy sliding-window version).
    """
    if padding is None:
        padding = kernel_size // 2
    nd = x.ndim
    window = (1,) * (nd - 2) + (kernel_size, kernel_size)
    strides = (1,) * (nd - 2) + (stride, stride)
    pads = [(0, 0)] * (nd - 2) + [(padding, padding), (padding, padding)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, strides, pads
    )


def depth_edge(
    depth: jnp.ndarray,
    atol: float | None = None,
    rtol: float | None = None,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depth-discontinuity mask: max-min window range exceeds atol/rtol*depth.

    Args:
        depth: (..., H, W)
        mask: optional (..., H, W) bool of valid pixels

    Ref: geometry.py:2031.
    """
    if mask is None:
        diff = max_pool_2d(depth, kernel_size) + max_pool_2d(-depth, kernel_size)
    else:
        neg_inf = jnp.asarray(-jnp.inf, depth.dtype)
        diff = max_pool_2d(jnp.where(mask, depth, neg_inf), kernel_size) + max_pool_2d(
            jnp.where(mask, -depth, neg_inf), kernel_size
        )
    edge = jnp.zeros(depth.shape, dtype=bool)
    if atol is not None:
        edge |= diff > atol
    if rtol is not None:
        edge |= (diff / depth) > rtol
    return edge


def _window_stack(x: jnp.ndarray, kernel_size: int, h_axis: int, w_axis: int,
                  pad_mode: str = "edge") -> jnp.ndarray:
    """Stack the kernel_size^2 spatially-shifted copies of x on a new leading axis.

    x is padded with `pad_mode` so each shifted copy has the original H, W.
    """
    pad = kernel_size // 2
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (pad, pad)
    pads[w_axis] = (pad, pad)
    xp = jnp.pad(x, pads, mode=pad_mode)
    h = x.shape[h_axis]
    w = x.shape[w_axis]
    views = []
    for di in range(kernel_size):
        for dj in range(kernel_size):
            sl = [slice(None)] * x.ndim
            sl[h_axis] = slice(di, di + h)
            sl[w_axis] = slice(dj, dj + w)
            views.append(xp[tuple(sl)])
    return jnp.stack(views, axis=0)


def normals_edge(
    normals: jnp.ndarray,
    tol: float,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Normal-discontinuity mask: max angular difference in window exceeds tol (deg).

    Args:
        normals: (..., H, W, 3)
        mask: optional (..., H, W) bool

    Ref: geometry.py:2129.
    """
    assert normals.shape[-1] == 3
    normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)

    # (K2, ..., H, W, 3) neighbors with edge padding, like the reference's
    # sliding_window_2d over an edge-padded array.
    neighbors = _window_stack(normals, kernel_size, h_axis=normals.ndim - 3,
                              w_axis=normals.ndim - 2, pad_mode="edge")
    cos = jnp.sum(normals[None, ...] * neighbors, axis=-1)
    angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    if mask is not None:
        mask_nb = _window_stack(mask, kernel_size, h_axis=mask.ndim - 2,
                                w_axis=mask.ndim - 1, pad_mode="edge")
        angle = jnp.where(mask_nb, angle, 0.0)
    angle_diff = jnp.max(angle, axis=0)  # (..., H, W)
    angle_diff = max_pool_2d(angle_diff, kernel_size)
    return angle_diff > jnp.deg2rad(tol)


def points_to_normals(
    point: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-product normal map from a pointmap, batched on device.

    Args:
        point: (..., H, W, 3) pointmap
        mask: optional (..., H, W) bool of valid pixels

    Returns:
        (normals (..., H, W, 3), normal_mask (..., H, W))

    Ref: geometry.py:1717 (numpy, per-image).
    """
    has_mask = mask is not None
    if mask is None:
        mask = jnp.ones(point.shape[:-1], dtype=bool)

    nd = point.ndim
    pads_p = [(0, 0)] * nd
    pads_p[-3] = (1, 1)
    pads_p[-2] = (1, 1)
    pts = jnp.pad(point, pads_p)  # zero padding like the reference
    pads_m = [(0, 0)] * (nd - 1)
    pads_m[-2] = (1, 1)
    pads_m[-1] = (1, 1)
    mpad = jnp.pad(mask, pads_m)

    def sl(di, dj, arr, spatial_offset):
        s = [slice(None)] * arr.ndim
        h = point.shape[-3]
        w = point.shape[-2]
        s[arr.ndim - 2 - spatial_offset] = slice(di, di + h)
        s[arr.ndim - 1 - spatial_offset] = slice(dj, dj + w)
        return arr[tuple(s)]

    center = sl(1, 1, pts, 1)
    up = sl(0, 1, pts, 1) - center
    left = sl(1, 0, pts, 1) - center
    down = sl(2, 1, pts, 1) - center
    right = sl(1, 2, pts, 1) - center

    normal = jnp.stack(
        [
            jnp.cross(up, left),
            jnp.cross(left, down),
            jnp.cross(down, right),
            jnp.cross(right, up),
        ],
        axis=0,
    )
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)

    m_c = sl(1, 1, mpad, 0)
    m_u = sl(0, 1, mpad, 0)
    m_l = sl(1, 0, mpad, 0)
    m_d = sl(2, 1, mpad, 0)
    m_r = sl(1, 2, mpad, 0)
    valid = (
        jnp.stack([m_u & m_l, m_l & m_d, m_d & m_r, m_r & m_u], axis=0) & m_c[None]
    )

    normal = jnp.sum(normal * valid[..., None], axis=0)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)

    normal_mask = jnp.any(valid, axis=0)
    if has_mask:
        normal = jnp.where(normal_mask[..., None], normal, 0.0)
    return normal, normal_mask
