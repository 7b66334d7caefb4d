"""ModularDUSt3R: 2-view DUSt3R rebuilt from framework parts.

Rebuild of mapanything/models/mapanything/modular_dust3r.py:46 — CroCo ViT
encoder + two-branch cross-attention decoder + per-view pointmap heads with
confidence. Used for DUSt3R-style baselines/retraining (SURVEY.md §2.1).

View 1's pointmap is predicted in its own frame; view 2's pointmap in view
1's frame — the classic DUSt3R output convention.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..nn.adaptors import confidence_adaptor
from ..nn.croco import CroCoViT, DecoderBlock
from ..nn.heads import LinearFeature


@dataclasses.dataclass(frozen=True)
class ModularDUSt3RConfig:
    encoder_size: str = "base"
    patch_size: int = 16
    decoder_dim: int = 768
    decoder_depth: int = 12
    decoder_num_heads: int = 12
    dtype: Any = jnp.bfloat16


class ModularDUSt3R(nn.Module):
    """Two-view pointmap regression (DUSt3R architecture)."""

    cfg: ModularDUSt3RConfig = ModularDUSt3RConfig()
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, views: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """views["img"]: (B, 2, H, W, 3) -> dict of (B, 2, H, W, ...) outputs:
        pts3d (view-1 frame), conf."""
        cfg = self.cfg
        imgs = views["img"]
        b, v, h, w, _ = imgs.shape
        assert v == 2, "ModularDUSt3R is a 2-view model"
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        enc = CroCoViT(size=cfg.encoder_size, patch_size=cfg.patch_size,
                       dtype=cfg.dtype, param_dtype=self.param_dtype,
                       name="encoder")
        feats = enc(imgs.reshape(b * v, h, w, 3))
        enc_dim = enc.embed_dim
        feats = feats.reshape(b, v, gh * gw, enc_dim)
        f1, f2 = feats[:, 0], feats[:, 1]

        proj = nn.Dense(cfg.decoder_dim, dtype=cfg.dtype,
                        param_dtype=self.param_dtype, name="decoder_embed")
        x1, x2 = proj(f1), proj(f2)

        # two weight-separate branches, cross-attending to each other
        # (dust3r dec_blocks / dec_blocks2)
        for i in range(cfg.decoder_depth):
            nx1 = DecoderBlock(cfg.decoder_dim, cfg.decoder_num_heads,
                               dtype=cfg.dtype, param_dtype=self.param_dtype,
                               name=f"dec1_{i}")(x1, x2)
            nx2 = DecoderBlock(cfg.decoder_dim, cfg.decoder_num_heads,
                               dtype=cfg.dtype, param_dtype=self.param_dtype,
                               name=f"dec2_{i}")(x2, x1)
            x1, x2 = nx1, nx2

        norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name="dec_norm")
        x1 = norm(x1).astype(jnp.float32)
        x2 = norm(x2).astype(jnp.float32)

        # linear pointmap+conf heads (4 channels) per branch
        head1 = LinearFeature(cfg.decoder_dim, output_dim=4,
                              patch_size=cfg.patch_size,
                              param_dtype=self.param_dtype, name="head1")
        head2 = LinearFeature(cfg.decoder_dim, output_dim=4,
                              patch_size=cfg.patch_size,
                              param_dtype=self.param_dtype, name="head2")
        out1 = head1(x1.reshape(b, gh, gw, cfg.decoder_dim))
        out2 = head2(x2.reshape(b, gh, gw, cfg.decoder_dim))

        def split(o):
            # dust3r pointmap activation: exp-norm directional ("exp" mode)
            xyz, conf = o[..., :3], o[..., 3:4]
            d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
            pts = xyz / jnp.clip(d, 1e-8, None) * jnp.expm1(d)
            return pts, confidence_adaptor(conf)

        pts1, conf1 = split(out1)
        pts2, conf2 = split(out2)
        return {
            "pts3d": jnp.stack([pts1, pts2], axis=1),
            "conf": jnp.stack([conf1, conf2], axis=1)[..., 0],
        }
