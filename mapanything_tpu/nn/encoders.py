"""Geometric-prior encoders (the UniCeption dense_rep/global_rep equivalents).

The reference fuses optional geometric inputs into the image features with
five small encoders (configs/model/task/default.yaml; call sites
model.py:160-181):
  * dense_rep_encoder  — conv patchify (k=p, s=p), no positional encoding, for
    3-chan ray dirs and 1-chan log-depth;
  * global_rep_encoder — MLP on per-view vectors (4-d quats, 3-d trans,
    1-d log-scale) producing one embedding per view.

These are our TPU-native equivalents: channel-last convs, fp32 compute (the
reference runs prior fusion outside autocast to avoid LayerNorm blowups,
model.py:1516).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DenseRepEncoder(nn.Module):
    """Patchify a dense per-pixel prior map into per-patch embeddings.

    Input (B, H, W, C_in) -> (B, H/p, W/p, embed_dim). No positional encoding
    (apply_pe: false in the reference config).
    """

    embed_dim: int
    patch_size: int = 14
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x.astype(self.dtype))


class GlobalRepEncoder(nn.Module):
    """Embed a low-dimensional per-view vector (quats/trans/log-scale).

    Input (B, C_in) -> (B, embed_dim). MLP: Linear -> GELU -> Linear.
    """

    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(h)
