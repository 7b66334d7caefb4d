"""DPT dense-prediction head (feature pyramid + regression processor).

TPU-native rebuild of the UniCeption DPTFeature + DPTRegressionProcessor pair
(reference call sites model.py:75,374-380; concrete in-repo structural spec:
external/vggt/heads/dpt_head.py:20 — projection convs per hook, 4x/2x/1x/0.5x
resize layers, scratch 3x3 convs, residual-conv fusion blocks with 2x
align-corners upsampling, then a regression tail at the full input
resolution).

All tensors channel-last; upsampling uses exact torch-bilinear matmuls
(ops/resize.py), convs map to XLA convolutions on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import bilinear_resize


class ResidualConvUnit(nn.Module):
    """relu -> conv -> relu -> conv with a skip connection.

    NOTE the skip adds relu(x), not x: the torch DPT lineage (MiDaS, vendored
    VGGT dpt_head.py:430-485) applies nn.ReLU(inplace=True) to the input,
    which mutates the tensor the later skip_add reads — so the reference's
    effective math is `conv_path + relu(x)`. Weight compatibility requires
    reproducing that exactly."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv1")(act)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv2")(out)
        return out + act


class FeatureFusionBlock(nn.Module):
    """Fuse an incoming pyramid level with the upsampled coarser path."""

    features: int
    has_residual: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, res: jnp.ndarray | None = None,
                 out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
        if self.has_residual:
            assert res is not None
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="res_conv_unit1")(res)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="res_conv_unit2")(x)
        if out_hw is None:
            out_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
        # out_conv (1x1, linear, no activation between it and the resize in
        # the torch lineage: dpt_head.py:488 upsamples then out_conv) COMMUTES
        # exactly with the bilinear resize — both are linear, one per-channel
        # spatial, one per-pixel channel mixing. Applying it BEFORE the 2x
        # upsample does the same math on 1/4 the pixels (measured 2.1 ms ->
        # ~0.5 ms on refinenet1's 296^2 step at the headline shape); weights
        # and param tree are unchanged.
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="out_conv")(x)
        x = bilinear_resize(x, out_hw, align_corners=True)
        return x


class DPTFeature(nn.Module):
    """4-hook feature pyramid -> fused `feature_dim` map at (patch grid * 8).

    Inputs: list of 4 per-view token maps (N, gh, gw, C_i) — hook 0 is the
    image-encoder features and hooks 1-3 are trunk IFR taps when
    use_encoder_features (model.py:325-331).
    """

    input_feature_dims: Sequence[int] = (1024, 1024, 1024, 1024)
    feature_dim: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    # Optional shared LayerNorm on the incoming tokens (VGGT-style heads,
    # external/vggt/heads/dpt_head.py:65 — requires equal hook dims).
    # MapAnything hooks arrive pre-normalized (trunk norm_intermediate /
    # final norm), so the released config keeps this off.
    use_input_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hooks: Sequence[jnp.ndarray]) -> jnp.ndarray:
        assert len(hooks) == 4
        if self.use_input_norm:
            norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                param_dtype=self.param_dtype,
                                name="input_norm")
            hooks = [norm(h) for h in hooks]
        gh, gw = hooks[0].shape[-3], hooks[0].shape[-2]

        # Per-hook 1x1 projection to pyramid widths.
        levels = []
        for i, (h, oc) in enumerate(zip(hooks, self.out_channels)):
            levels.append(
                nn.Conv(oc, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"project_{i}")(h.astype(self.dtype))
            )

        # Resize to strides [x4, x2, x1, /2] of the patch grid.
        # padding="VALID" == torch ConvTranspose2d(padding=0); flax defaults
        # to SAME, which shifts the taps even when kernel == stride.
        l0 = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4),
                              padding="VALID",
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="resize_0")(levels[0])
        l1 = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2),
                              padding="VALID",
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="resize_1")(levels[1])
        l2 = levels[2]
        l3 = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="resize_3")(levels[3])

        # Scratch: 3x3 convs (no bias) unifying channel widths.
        rn = []
        for i, l in enumerate([l0, l1, l2, l3]):
            rn.append(
                nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"layer_rn_{i}")(l)
            )

        # Fusion, coarse to fine, each step 2x upsampling (align_corners).
        path = FeatureFusionBlock(self.feature_dim, has_residual=False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  name="refinenet4")(
            rn[3], out_hw=(rn[2].shape[-3], rn[2].shape[-2]))
        path = FeatureFusionBlock(self.feature_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="refinenet3")(
            path, rn[2], out_hw=(rn[1].shape[-3], rn[1].shape[-2]))
        path = FeatureFusionBlock(self.feature_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="refinenet2")(
            path, rn[1], out_hw=(rn[0].shape[-3], rn[0].shape[-2]))
        path = FeatureFusionBlock(self.feature_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="refinenet1")(
            path, rn[0], out_hw=(gh * 8, gw * 8))
        return path


class DPTRegressionProcessor(nn.Module):
    """Regression tail: fused map -> `output_dim` channels at image resolution.

    conv(256->128) -> bilinear to (H, W) -> conv(->64) -> relu -> 1x1 conv.
    (VGGT tail structure, external/vggt/heads/dpt_head.py output_conv1/2.)
    """

    input_feature_dim: int = 256
    output_dim: int = 6
    hidden_dims: Sequence[int] = (128, 64)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
        x = nn.Conv(self.hidden_dims[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        x = bilinear_resize(x, out_hw, align_corners=True)
        x = nn.Conv(self.hidden_dims[1], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(x)
        x = nn.relu(x)
        # Raw channels; adaptors apply activations/ranges (in fp32 — the
        # 6-channel output is cast up by the caller's fp32 island). The conv
        # itself follows the head dtype: in the bf16 serving path its input
        # is already bf16-rounded by conv2/relu, so an fp32 1x1 here adds no
        # accuracy, only a full-resolution fp32 materialization of x
        # (measured 2.6 ms at 8x518^2x64). fp32 head configs (the
        # conversion-parity path) keep fp32 end-to-end.
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_out")(x)
        return x.astype(jnp.float32)
