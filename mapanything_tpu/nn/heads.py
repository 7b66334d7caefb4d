"""Pose, scale and linear prediction heads.

TPU-native equivalents of the UniCeption heads used by the reference
(model.py:77-78,383-388; configs/model/pred_head/dpt_pose_scale.yaml):
  * PoseHead  — per-view trunk token map -> (trans 3, quat 4); structure per
    the config: `num_resconv_block: 2` residual conv blocks then an MLP on the
    pooled feature (`rot_representation_dim: 4`).
  * MLPHead   — scale token -> 1-d log-metric-scale.
  * LinearFeature — per-patch linear head (ablations, model.py:76,371).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .dpt import ResidualConvUnit


class PoseHead(nn.Module):
    """Token map (N, gh, gw, C) -> raw pose channels (N, trans+rot dims)."""

    input_feature_dim: int = 1024
    num_resconv_block: int = 2
    rot_representation_dim: int = 4
    trans_dim: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.input_feature_dim // 2
        x = nn.Conv(hidden, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="proj")(x.astype(self.dtype))
        for i in range(self.num_resconv_block):
            x = ResidualConvUnit(hidden, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"res_conv_{i}")(x)
        x = jnp.mean(x, axis=(-3, -2))  # global average pool over patches
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        out = nn.Dense(self.trans_dim + self.rot_representation_dim,
                       dtype=jnp.float32, param_dtype=self.param_dtype,
                       name="fc_out")(x.astype(jnp.float32))
        return out


class MLPHead(nn.Module):
    """Global token (B, C) -> raw output channels (B, output_dim)."""

    input_feature_dim: int = 1024
    output_dim: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.input_feature_dim // 2
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc2")(
            x.astype(jnp.float32))


class LinearFeature(nn.Module):
    """Per-patch linear head: (N, gh, gw, C) -> (N, H, W, out) via
    patch-size pixel shuffle (DUSt3R linear head pattern)."""

    input_feature_dim: int = 1024
    output_dim: int = 4
    patch_size: int = 14
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, gh, gw, _ = x.shape
        p = self.patch_size
        x = nn.Dense(self.output_dim * p * p, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="proj")(
            x.astype(jnp.float32))
        x = x.reshape(n, gh, gw, p, p, self.output_dim)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, gh * p, gw * p, self.output_dim)
