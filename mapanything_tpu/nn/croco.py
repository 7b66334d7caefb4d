"""CroCo-style ViT encoder + cross-attention decoder blocks.

Rebuild of the croco encoder family the reference uses for ModularDUSt3R and
the cat_ifr_dust3r ablation trunk (configs/model/encoder/croco_512.yaml;
UniCeption croco encoder; DUSt3R architecture): ViT with 2D sin-cos
positional embeddings (no cls token), and decoder blocks with
self-attention + cross-attention + MLP.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from .layers import FusedLayerNorm, Mlp

CROCO_CONFIGS = {
    # "test" is a 2-layer stub with the same module structure, for fast
    # unit tests / dryruns only.
    "test": dict(embed_dim=64, depth=2, num_heads=2),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
}


def sincos_pos_embed_2d(gh: int, gw: int, dim: int) -> np.ndarray:
    """Standard 2D sin-cos positional embedding (gh*gw, dim), croco-style."""
    assert dim % 4 == 0
    d4 = dim // 4
    omega = 1.0 / (10000 ** (np.arange(d4, dtype=np.float64) / d4))
    y = np.arange(gh, dtype=np.float64)
    x = np.arange(gw, dtype=np.float64)
    oy = np.einsum("h,f->hf", y, omega)
    ox = np.einsum("w,f->wf", x, omega)
    emb_y = np.concatenate([np.sin(oy), np.cos(oy)], axis=-1)  # (gh, dim/2)
    emb_x = np.concatenate([np.sin(ox), np.cos(ox)], axis=-1)  # (gw, dim/2)
    grid = np.concatenate(
        [
            np.repeat(emb_y[:, None, :], gw, axis=1),
            np.repeat(emb_x[None, :, :], gh, axis=0),
        ],
        axis=-1,
    )
    return grid.reshape(gh * gw, dim).astype(np.float32)


class CrossAttention(nn.Module):
    """Multi-head cross-attention: queries from x, keys/values from context."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, n, _ = x.shape
        m = context.shape[1]
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="q")(x)
        kv = nn.Dense(2 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="kv")(context)
        q = q.reshape(b, n, self.num_heads, hd)
        kv = kv.reshape(b, m, 2, self.num_heads, hd)
        out = sdpa(q, kv[:, :, 0], kv[:, :, 1], impl=self.attn_impl,
                   key_mask=key_mask)
        out = out.reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(out)


class DecoderBlock(nn.Module):
    """CroCo/DUSt3R decoder block: self-attn -> cross-attn -> MLP."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from .layers import Attention

        ln = lambda name: FusedLayerNorm(  # noqa: E731
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        h = ln("norm1")(x)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          attn_impl=self.attn_impl, name="self_attn")(h)
        h = ln("norm2")(x)
        ctx = ln("norm_context")(context)
        x = x + CrossAttention(self.dim, self.num_heads, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               attn_impl=self.attn_impl,
                               name="cross_attn")(h, ctx, key_mask=key_mask)
        h = ln("norm3")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mlp")(h)
        return x


class CroCoViT(nn.Module):
    """CroCo image encoder: patch 16, 2D sin-cos pos embeds, no cls token.

    Output: (B, gh, gw, C) patch features."""

    size: str = "base"
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def embed_dim(self) -> int:
        return CROCO_CONFIGS[self.size]["embed_dim"]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .layers import Block

        cfg = CROCO_CONFIGS[self.size]
        dim = cfg["embed_dim"]
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(b, gh * gw, dim)
        pos = jnp.asarray(sincos_pos_embed_2d(gh, gw, dim))
        x = x + pos[None].astype(self.dtype)
        for i in range(cfg["depth"]):
            x = Block(dim, cfg["num_heads"], dtype=self.dtype,
                      param_dtype=self.param_dtype, attn_impl=self.attn_impl,
                      name=f"blocks_{i}")(x)
        x = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm")(x)
        return x.reshape(b, gh, gw, dim)
