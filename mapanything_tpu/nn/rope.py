"""2D rotary positional embeddings (RoPE) for patch grids.

Rebuild of the croco RoPE2D option used by MapAnythingAblations
(reference ablations.py:42,216-234: custom_positional_encoding="RoPE<freq>").
Half the head dims rotate with the patch row index, half with the column
index — the standard 2D axial RoPE.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def rope_2d_cos_sin(gh: int, gw: int, head_dim: int, freq: float = 100.0):
    """Precompute (cos, sin) tables for a (gh, gw) grid: (gh*gw, head_dim).

    Dims [0:d/2) encode rows (y), [d/2:d) encode columns (x); within each
    half, standard RoPE pairs with base `freq`.
    """
    assert head_dim % 4 == 0, "head_dim must be divisible by 4 for 2D RoPE"
    d_half = head_dim // 2
    inv = 1.0 / (freq ** (np.arange(0, d_half, 2, dtype=np.float64) / d_half))
    y = np.arange(gh, dtype=np.float64)
    x = np.arange(gw, dtype=np.float64)
    ang_y = np.einsum("h,f->hf", y, inv)  # (gh, d_half/2)
    ang_x = np.einsum("w,f->wf", x, inv)  # (gw, d_half/2)
    # broadcast to the grid, duplicate for the rotation pairs
    ay = np.repeat(ang_y[:, None, :], gw, axis=1)
    ax = np.repeat(ang_x[None, :, :], gh, axis=0)
    ang = np.concatenate([ay, ax], axis=-1)  # (gh, gw, d_half)
    ang = np.concatenate([ang, ang], axis=-1)  # (gh, gw, head_dim) paired
    ang = ang.reshape(gh * gw, head_dim)
    return (
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32),
    )


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, N, H, D) tokens with per-position (N, D) cos/sin tables."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    return x * cos + rotated * sin
