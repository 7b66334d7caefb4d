"""Exact torch-equivalent separable resizes as static matmuls.

torch F.interpolate(bilinear/bicubic, align_corners=...) semantics are
reproduced with per-axis interpolation matrices built in numpy at trace time
(all shapes in this framework are static — the 518-bucket table guarantees
it), then applied as two einsums. On TPU this turns resize into MXU work and
avoids gather lowerings.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _linear_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """(dst, src) matrix reproducing torch bilinear interpolation on one axis."""
    mat = np.zeros((dst, src), dtype=np.float32)
    for i in range(dst):
        if align_corners:
            s = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            s = (i + 0.5) * src / dst - 0.5
            s = min(max(s, 0.0), src - 1)
        lo = int(math.floor(s))
        hi = min(lo + 1, src - 1)
        frac = s - lo
        mat[i, lo] += 1.0 - frac
        mat[i, hi] += frac
    return mat


def bilinear_resize(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., h, w, C), matching torch bilinear."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_linear_matrix(h, oh, align_corners), dtype=x.dtype)
    mw = jnp.asarray(_linear_matrix(w, ow, align_corners), dtype=x.dtype)
    # fp32 accumulation keeps bf16 feature maps honest (weights are 2-tap
    # convex combinations; the sums must not round at every tap)
    dtype = x.dtype
    x = jnp.einsum("ih,...hwc->...iwc", mh, x,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("jw,...hwc->...hjc", mw, x.astype(dtype),
                   preferred_element_type=jnp.float32)
    return x.astype(dtype)


def nearest_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W, C), torch 'nearest' semantics
    (src = floor(dst * src/dst))."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    hi = (np.arange(oh) * h // oh).astype(np.int32)
    wi = (np.arange(ow) * w // ow).astype(np.int32)
    return x[..., hi, :, :][..., :, wi, :]
