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
    assume_normalized: bool = False,
) -> jnp.ndarray:
    """Normal-discontinuity mask: max angular difference in window exceeds tol (deg).

    Args:
        normals: (..., H, W, 3)
        mask: optional (..., H, W) bool
        assume_normalized: skip the unit-normalization pass (safe when the
            input comes from points_to_normals, which already normalizes).

    The angle threshold is evaluated in cosine space — max window angle >
    tol  <=>  min window cosine < cos(tol) (cos is strictly decreasing on
    [0, pi]) — so the 9-shift window needs only dot products and mins, no
    arccos: the transcendental was ~60% of the edge-mask cost at 518^2
    (measured on v5e).

    Ref: geometry.py:2129.
    """
    assert normals.shape[-1] == 3
    if not assume_normalized:
        normals = normals / (
            jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)

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
    # min cosine over the window (== max angle); masked neighbors act as
    # angle 0 == cosine 1 (no contribution), matching the reference.
    min_cos = jnp.ones(normals.shape[:-1], normals.dtype)
    for di in range(kernel_size):
        for dj in range(kernel_size):
            sl = [slice(None)] * normals.ndim
            sl[h_axis] = slice(di, di + h)
            sl[w_axis] = slice(dj, dj + w)
            nb = np_pad[tuple(sl)]
            cos = jnp.sum(normals * nb, axis=-1)
            if mask is not None:
                msl = [slice(None)] * mask.ndim
                msl[-2] = slice(di, di + h)
                msl[-1] = slice(dj, dj + w)
                cos = jnp.where(m_pad[tuple(msl)], cos, 1.0)
            min_cos = jnp.minimum(min_cos, jnp.clip(cos, -1.0, 1.0))
    # window-max of the angle == window-min of the cosine (cos strictly
    # decreasing on [0, pi]); the reference's final max-pool dilation of
    # the angle map becomes a min-pool of the cosine map
    min_cos = -max_pool_2d(-min_cos, kernel_size)
    return min_cos < jnp.cos(jnp.deg2rad(tol))


def points_normal_edges(
    point: jnp.ndarray,
    tol: float,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused points -> normals -> normal-edge mask, computed channel-PLANE-wise.

    Equivalent to ``normals_edge(*points_to_normals(point, mask), tol)`` but
    the xyz channels live as separate (..., H, W) arrays throughout: on TPU
    a (..., H, W, 3) tensor puts the 3-wide channel axis in the 128-lane
    minor dimension, making every slice/arithmetic pass ~3/128 lane-efficient
    — the composed channel-last pipeline measured 9.5 ms at (8, 518, 518) on
    v5e vs ~1.5 ms for this plane-wise form. Used by the inference
    postprocess; the channel-last building blocks below remain for API
    parity with the reference.
    """
    h, w = point.shape[-3], point.shape[-2]
    planes = tuple(point[..., i] for i in range(3))  # one strided read each
    if mask is None:
        mask = jnp.ones(point.shape[:-1], dtype=bool)

    def pad_hw(x, mode="constant"):
        pads = [(0, 0)] * x.ndim
        pads[-2] = (1, 1)
        pads[-1] = (1, 1)
        return jnp.pad(x, pads, mode=mode)

    pp = [pad_hw(p) for p in planes]  # zero padding like the reference
    mp = pad_hw(mask)

    def sl(arr, di, dj):
        s = [slice(None)] * arr.ndim
        s[-2] = slice(di, di + h)
        s[-1] = slice(dj, dj + w)
        return arr[tuple(s)]

    c = [sl(p, 1, 1) for p in pp]
    up = [sl(p, 0, 1) - cc for p, cc in zip(pp, c)]
    left = [sl(p, 1, 0) - cc for p, cc in zip(pp, c)]
    down = [sl(p, 2, 1) - cc for p, cc in zip(pp, c)]
    right = [sl(p, 1, 2) - cc for p, cc in zip(pp, c)]
    m_c = sl(mp, 1, 1)
    m_u, m_l = sl(mp, 0, 1), sl(mp, 1, 0)
    m_d, m_r = sl(mp, 2, 1), sl(mp, 1, 2)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def unit(v):
        n = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
        inv = 1.0 / (n + 1e-12)
        return (v[0] * inv, v[1] * inv, v[2] * inv)

    nx = ny = nz = 0.0
    nmask = jnp.zeros(m_c.shape, dtype=bool)
    for a, b, m2 in ((up, left, m_u & m_l), (left, down, m_l & m_d),
                     (down, right, m_d & m_r), (right, up, m_r & m_u)):
        cr = unit(cross(a, b))
        valid = m2 & m_c
        nx = nx + cr[0] * valid
        ny = ny + cr[1] * valid
        nz = nz + cr[2] * valid
        nmask = nmask | valid
    nx, ny, nz = unit((nx, ny, nz))
    # zero where invalid (matches points_to_normals(mask=...))
    nx = nx * nmask
    ny = ny * nmask
    nz = nz * nmask

    # 9-shift window min-cosine (== max angle) with edge-replicate padding
    npx, npy, npz = (pad_hw(v, mode="edge") for v in (nx, ny, nz))
    nmp = pad_hw(nmask, mode="edge")
    min_cos = jnp.ones(nx.shape, nx.dtype)
    for di in range(kernel_size):
        for dj in range(kernel_size):
            cos = (nx * sl(npx, di, dj) + ny * sl(npy, di, dj)
                   + nz * sl(npz, di, dj))
            cos = jnp.where(sl(nmp, di, dj), cos, 1.0)
            min_cos = jnp.minimum(min_cos, jnp.clip(cos, -1.0, 1.0))
    min_cos = -max_pool_2d(-min_cos, kernel_size)
    return min_cos < jnp.cos(jnp.deg2rad(tol))


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
