"""Sliding-window / pooling utilities + aliasing masks, batched jnp.

The long tail of mapanything/utils/geometry.py's window machinery
(sliding_window_1d:1830, sliding_window_nd:1850, sliding_window_2d:1868,
max_pool_1d:1905, max_pool_nd:1960, depth_aliasing:2075). The reference runs
these host-side in numpy per image; here they are device-resident jnp —
pooling via lax.reduce_window (fuses on TPU), window extraction via static
strided slices (small static kernels, no gathers).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from .edges import max_pool_2d  # re-export site for the 2D case


def sliding_window_1d(
    x: jnp.ndarray, window_size: int, stride: int, axis: int = -1
) -> jnp.ndarray:
    """Extract sliding windows along one axis; the window dim is appended.

    Output shape: x.shape with `axis` replaced by (n_windows,), plus a
    trailing (window_size,) dim. Ref: geometry.py:1830.
    """
    axis = axis % x.ndim
    # NOTE: the reference counts windows as (size - window + 1) // stride
    # (geometry.py:1823), NOT the conventional (size - window)//stride + 1 —
    # replicated exactly so downstream pooling shapes match.
    n = (x.shape[axis] - window_size + 1) // stride
    slices = []
    for w in range(window_size):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(w, w + (n - 1) * stride + 1, stride)
        slices.append(x[tuple(sl)])
    return jnp.stack(slices, axis=-1)


def sliding_window_nd(
    x: jnp.ndarray,
    window_size: Tuple[int, ...],
    stride: Tuple[int, ...],
    axis: Tuple[int, ...],
) -> jnp.ndarray:
    """Apply sliding_window_1d along several axes; window dims append in
    the order given. Ref: geometry.py:1850."""
    axis = tuple(a % x.ndim for a in axis)
    for i, a in enumerate(axis):
        # Each append shifts nothing before the original ndim, so earlier
        # axes' positions stay valid.
        x = sliding_window_1d(x, window_size[i], stride[i], a)
    return x


def sliding_window_2d(
    x: jnp.ndarray,
    window_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int]],
    axis: Tuple[int, int] = (-2, -1),
) -> jnp.ndarray:
    """2D sliding windows; (win_h, win_w) dims append to the shape.

    Ref: geometry.py:1868."""
    if isinstance(window_size, int):
        window_size = (window_size, window_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    return sliding_window_nd(x, window_size, stride, axis)


def max_pool_1d(
    x: jnp.ndarray, kernel_size: int, stride: int, padding: int = 0,
    axis: int = -1,
) -> jnp.ndarray:
    """1D max pool along `axis` with -inf padding (the reference pads with
    NaN + nanmax; -inf identity gives the same result for finite data).

    Ref: geometry.py:1905."""
    axis = axis % x.ndim
    window = [1] * x.ndim
    strides = [1] * x.ndim
    pads = [(0, 0)] * x.ndim
    window[axis] = kernel_size
    strides[axis] = stride
    pads[axis] = (padding, padding)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min
    )
    out = jax.lax.reduce_window(
        x, jnp.asarray(init, x.dtype), jax.lax.max,
        tuple(window), tuple(strides), pads,
    )
    # Crop to the reference's window count (see sliding_window_1d NOTE).
    n = (x.shape[axis] + 2 * padding - kernel_size + 1) // stride
    if out.shape[axis] != n:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        out = out[tuple(sl)]
    return out


def max_pool_nd(
    x: jnp.ndarray,
    kernel_size: Tuple[int, ...],
    stride: Tuple[int, ...],
    padding: Tuple[int, ...],
    axis: Tuple[int, ...],
) -> jnp.ndarray:
    """Sequential per-axis max pooling (one fused reduce_window per axis).

    Ref: geometry.py:1960."""
    for i, a in enumerate(axis):
        x = max_pool_1d(x, kernel_size[i], stride[i], padding[i], a)
    return x


def depth_aliasing(
    depth: jnp.ndarray,
    atol: float | None = None,
    rtol: float | None = None,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Aliasing mask: pixels neither near the window max nor the window min
    of their neighborhood (i.e. mid-edge samples straddling a depth jump).

    Args:
        depth: (..., H, W)
        mask: optional (..., H, W) bool of valid pixels

    Ref: geometry.py:2075."""
    if mask is None:
        diff_max = max_pool_2d(depth, kernel_size) - depth
        diff_min = max_pool_2d(-depth, kernel_size) + depth
    else:
        neg_inf = jnp.asarray(-jnp.inf, depth.dtype)
        diff_max = max_pool_2d(
            jnp.where(mask, depth, neg_inf), kernel_size
        ) - depth
        diff_min = max_pool_2d(
            jnp.where(mask, -depth, neg_inf), kernel_size
        ) + depth
    diff = jnp.minimum(diff_max, diff_min)
    edge = jnp.zeros(depth.shape, dtype=bool)
    if atol is not None:
        edge |= diff > atol
    if rtol is not None:
        edge |= (diff / depth) > rtol
    return edge
