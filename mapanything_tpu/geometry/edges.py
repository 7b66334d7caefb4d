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

    # Accumulate the window max over the k^2 shifts instead of stacking them
    # (a stacked window costs k^2 full-size copies — ~3 GB at 100 views).
    pad = kernel_size // 2
    h_axis, w_axis = normals.ndim - 3, normals.ndim - 2
    pads = [(0, 0)] * normals.ndim
    pads[h_axis] = (pad, pad)
    pads[w_axis] = (pad, pad)
    np_pad = jnp.pad(normals, pads, mode="edge")
    if mask is not None:
        mpads = [(0, 0)] * mask.ndim
        mpads[-2] = (pad, pad)
        mpads[-1] = (pad, pad)
        m_pad = jnp.pad(mask, mpads, mode="edge")

    h = normals.shape[h_axis]
    w = normals.shape[w_axis]
    angle_diff = jnp.zeros(normals.shape[:-1], normals.dtype)
    for di in range(kernel_size):
        for dj in range(kernel_size):
            sl = [slice(None)] * normals.ndim
            sl[h_axis] = slice(di, di + h)
            sl[w_axis] = slice(dj, dj + w)
            nb = np_pad[tuple(sl)]
            cos = jnp.sum(normals * nb, axis=-1)
            ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
            if mask is not None:
                msl = [slice(None)] * mask.ndim
                msl[-2] = slice(di, di + h)
                msl[-1] = slice(dj, dj + w)
                ang = jnp.where(m_pad[tuple(msl)], ang, 0.0)
            angle_diff = jnp.maximum(angle_diff, ang)
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

    m_c = sl(1, 1, mpad, 0)
    m_u = sl(0, 1, mpad, 0)
    m_l = sl(1, 0, mpad, 0)
    m_d = sl(2, 1, mpad, 0)
    m_r = sl(1, 2, mpad, 0)

    # Accumulate the four quad normals instead of stacking (memory: 1 copy
    # instead of 4 at full resolution).
    quads = (
        (up, left, m_u & m_l),
        (left, down, m_l & m_d),
        (down, right, m_d & m_r),
        (right, up, m_r & m_u),
    )
    normal = jnp.zeros_like(center)
    normal_mask = jnp.zeros(center.shape[:-1], dtype=bool)
    for a, bvec, m in quads:
        cr = jnp.cross(a, bvec)
        cr = cr / (jnp.linalg.norm(cr, axis=-1, keepdims=True) + 1e-12)
        valid = (m & m_c)
        normal = normal + cr * valid[..., None]
        normal_mask = normal_mask | valid
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)
    if has_mask:
        normal = jnp.where(normal_mask[..., None], normal, 0.0)
    return normal, normal_mask
