"""DINOv2 ViT encoder (flax.linen), weight-compatible with torch-hub DINOv2.

Reimplements the encoder family that the reference obtains through UniCeption's
encoder_factory("dinov2", size="large") — a torch-hub DinoVisionTransformer
(spec vendored in the reference at
mapanything/models/external/dinov2/models/vision_transformer.py:57; hub
defaults at external/dinov2/hub/backbones.py:26: init_values=1.0,
block_chunks=0, num_register_tokens=0, interpolate_antialias=False,
interpolate_offset=0.1, patch 14, img_size 518).

TPU-first details:
  * Positional-embedding interpolation for arbitrary (bucketed) resolutions is
    expressed as two static interpolation matrices (computed in numpy at trace
    time with torch's exact bicubic formula: cubic convolution a=-0.75,
    src = (dst + 0.5)/scale - 0.5, border clamp) applied as matmuls — no
    gather/dynamic shapes, byte-matches torch F.interpolate(bicubic).
  * Patch embedding is a 14x14/14 conv (MXU-friendly); inputs are NHWC.
  * Blocks run in `dtype` (bf16 for serving) with fp32 LayerNorm reductions.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Block, FusedLayerNorm

# torch-hub DINOv2 configuration table.
DINOV2_CONFIGS = {
    # "test" is not a real DINOv2: a 2-layer stub with the same module
    # structure, for fast unit tests / dryruns only.
    "test": dict(embed_dim=64, depth=2, num_heads=2),
    # "wide_test": released ViT-L CHANNEL dims (1024-wide, fused qkv 3072,
    # MLP 4096, 16 heads) at depth 2 — for the multichip dryrun to shard
    # the production kernel widths under tp without paying 24 layers of
    # CPU compile/compute. Not a real DINOv2.
    "wide_test": dict(embed_dim=1024, depth=2, num_heads=16),
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "giant": dict(embed_dim=1536, depth=40, num_heads=24),
}

# name -> (mean, std); matches UniCeption IMAGE_NORMALIZATION_DICT usage at
# reference image.py:37 / base_dataset.py:29.
IMAGE_NORMALIZATION_DICT = {
    "dinov2": (np.array([0.485, 0.456, 0.406]), np.array([0.229, 0.224, 0.225])),
    "croco": (np.array([0.5, 0.5, 0.5]), np.array([0.5, 0.5, 0.5])),
    "radio": (np.array([0.0, 0.0, 0.0]), np.array([1.0, 1.0, 1.0])),
    "identity": (np.array([0.0, 0.0, 0.0]), np.array([1.0, 1.0, 1.0])),
}


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 — torch's bicubic."""
    ax = np.abs(x)
    w = np.zeros_like(ax)
    m1 = ax <= 1
    m2 = (ax > 1) & (ax < 2)
    w[m1] = (a + 2) * ax[m1] ** 3 - (a + 3) * ax[m1] ** 2 + 1
    w[m2] = a * ax[m2] ** 3 - 5 * a * ax[m2] ** 2 + 8 * a * ax[m2] - 4 * a
    return w


def torch_bicubic_resize_matrix(src: int, dst: int, scale: Optional[float] = None,
                                antialias: bool = False) -> np.ndarray:
    """(dst, src) matrix M with (M @ x) == torch F.interpolate(x, bicubic,
    align_corners=False[, antialias]) along one axis.

    If `scale` is given, uses torch's scale_factor semantics
    (src_coord = (dst_coord + 0.5)/scale - 0.5); otherwise scale = dst/src.
    With antialias and scale < 1, the kernel support widens by 1/scale and
    weights renormalize — torch's antialiased downsampling (needed for the
    DINOv2 with-registers checkpoints, hub backbones.py:128
    interpolate_antialias=True).
    """
    if scale is None:
        scale = dst / src
    mat = np.zeros((dst, src), dtype=np.float64)
    if antialias:
        # torch's AA path (PIL-style separable resampling, aten
        # upsample_bicubic2d_aa): cubic kernel with a=-0.5 (NOT -0.75),
        # center = (i+0.5)/scale, window [int(center-support+0.5),
        # int(center+support+0.5)) clipped to range, weights normalized over
        # the clipped window. Verified exact (1e-6) vs torch.
        inv = 1.0 / scale
        kscale = min(scale, 1.0)
        support = 2.0 / kscale
        for i in range(dst):
            center = (i + 0.5) * inv
            lo = max(int(center - support + 0.5), 0)
            hi = min(int(center + support + 0.5), src)
            idx = np.arange(lo, hi)
            w = _cubic_kernel((idx - center + 0.5) * kscale, a=-0.5)
            w = w / max(w.sum(), 1e-12)
            for j, ww in zip(idx, w):
                mat[i, j] += ww
        return mat.astype(np.float32)
    for i in range(dst):
        s = (i + 0.5) / scale - 0.5
        s_floor = math.floor(s)
        frac = s - s_floor
        idx = np.array([s_floor - 1, s_floor, s_floor + 1, s_floor + 2])
        w = _cubic_kernel(np.array([1 + frac, frac, 1 - frac, 2 - frac]))
        idx = np.clip(idx, 0, src - 1)  # border replication, like torch
        for j, ww in zip(idx, w):
            mat[i, j] += ww
    return mat.astype(np.float32)


def interpolate_pos_embed(
    patch_pos_embed: jnp.ndarray,
    src_hw: tuple[int, int],
    dst_hw: tuple[int, int],
    interpolate_offset: float = 0.1,
    antialias: bool = False,
) -> jnp.ndarray:
    """Bicubic-resample (src_h*src_w, C) patch pos-embeds to (dst_h*dst_w, C).

    Matches DinoVisionTransformer.interpolate_pos_encoding (reference
    external/dinov2/models/vision_transformer.py:208): scale factors include
    the historical +0.1 offset kludge.
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return patch_pos_embed
    c = patch_pos_embed.shape[-1]
    grid = patch_pos_embed.reshape(sh, sw, c).astype(jnp.float32)
    # NOTE: torch input is (1, C, M, M) and scale_factor=(sx, sy) applies
    # (sx -> dim -2 (rows, w0), sy -> dim -1 (cols, h0)) after the reference
    # reshapes to (M, M) row-major — the reference computes
    # sx from w0 and sy from h0 and then asserts (w0, h0) == out.shape[-2:],
    # i.e. rows are w and cols are h there. We keep (h, w) layout and apply
    # the same offset semantics per axis.
    mh = torch_bicubic_resize_matrix(sh, dh, (dh + interpolate_offset) / sh,
                                     antialias=antialias)
    mw = torch_bicubic_resize_matrix(sw, dw, (dw + interpolate_offset) / sw,
                                     antialias=antialias)
    out = jnp.einsum("ij,jkc->ikc", jnp.asarray(mh), grid, precision="highest")
    out = jnp.einsum("kj,ijc->ikc", jnp.asarray(mw), out, precision="highest")
    return out.reshape(dh * dw, c)


class _PatchEmbedMatmul(nn.Module):
    """Non-overlapping patch embedding (Conv(k=p, s=p, VALID) contraction).

    Stores torch-convention params (kernel HWIO (p, p, C, dim), bias
    (dim,)) under the module's scope. The data path has been measured in
    three forms at the production shape (scripts/perf/
    patch_embed_experiment.py); the plain XLA conv currently wins.
    """

    dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, self.dim),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), self.param_dtype
        )
        # XLA's NHWC conv lowering now beats both hand im2col forms at this
        # shape (scripts/perf/patch_embed_experiment.py, 2026-08-19:
        # conv 0.42 ms vs im2col 0.85 ms vs row-slab 1.13 ms at
        # (8, 518, 518, 3) bf16) — the conv emitter's own patch relayout
        # pipelines with the matmul, which the explicit transpose cannot.
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        return out


class DinoViT(nn.Module):
    """DINOv2 vision transformer returning patch tokens.

    Input: NHWC images, already normalized with the encoder's mean/std.
    Output: (B, H/p, W/p, C) patch features (the reference encoder output is
    (B, C, H/14, W/14); we keep channel-last for TPU layouts).
    """

    size: str = "large"
    patch_size: int = 14
    img_size: int = 518  # pretraining grid used to shape the stored pos_embed
    num_register_tokens: int = 0
    layerscale_init: Optional[float] = 1.0
    # Inference: gamma is a fixed per-channel scale on the proj/fc2 outputs,
    # so it folds into those layers' weights (convert_dinov2
    # fold_layerscale=True) and the elementwise passes disappear
    # (~0.4 ms/layer measured at ViT-L 518 scale).
    fold_layerscale: bool = False
    interpolate_offset: float = 0.1
    # with-registers hub checkpoints use antialiased pos-embed interpolation
    # (hub backbones.py:128)
    interpolate_antialias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    mlp_token_chunk: "int | None" = None  # see layers.Mlp.token_chunk
    # Aligned-token mode: pad the token axis ONCE to a multiple of this
    # (cls+patches: 1370 -> 1408 at 518px) and run every block at the
    # aligned length with the pad keys masked in the qkv epilogue
    # (layers.Attention n_valid). Removes the per-layer q/k/v pad copies
    # inside the flash wrapper and keeps LN/MLP rows tile-aligned —
    # measured 3.065 -> 2.946 ms/block at (8, 1369, 1024) on v5e. Results
    # are exact (masked softmax == unpadded softmax), so it is safe to
    # leave on everywhere; None disables.
    pad_tokens_to: "int | None" = None
    # nn.scan over the block stack: O(1) HLO in depth (seconds instead of
    # minutes of XLA optimization per config). Params live stacked under
    # blocks/block/... — utils.weights.stack_scan_params converts the
    # per-layer blocks_{i} layout. Numerics are identical to the unrolled
    # loop (same ops per layer; tests/test_scan_layers.py).
    scan_layers: bool = False

    @property
    def embed_dim(self) -> int:
        return DINOV2_CONFIGS[self.size]["embed_dim"]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = DINOV2_CONFIGS[self.size]
        dim = cfg["embed_dim"]
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        # Patch embedding: the k=p s=p conv expressed as im2col + one
        # matmul. The conv form lowers to an HBM-bound gather on TPU (the
        # C=3 input occupies 3 of 128 lanes): measured 5.8 ms vs 3.8 ms
        # for this form at (8, 518, 518, 3) on v5e. Param tree and layout
        # (patch_embed/{kernel HWIO, bias}) are identical to nn.Conv, so
        # checkpoint conversion is unchanged.
        x = _PatchEmbedMatmul(
            dim,
            self.patch_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, dim)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, dim), self.param_dtype
        )
        m = self.img_size // self.patch_size
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1 + m * m, dim),
            self.param_dtype,
        )
        cls_pos = pos_embed[:1]
        patch_pos = interpolate_pos_embed(
            pos_embed[1:], (m, m), (gh, gw), self.interpolate_offset,
            antialias=self.interpolate_antialias,
        )

        x = x + patch_pos[None].astype(self.dtype)
        cls = (cls_token + cls_pos[None]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, dim))

        if self.num_register_tokens:
            registers = self.param(
                "register_tokens",
                nn.initializers.normal(1e-6),
                (1, self.num_register_tokens, dim),
                self.param_dtype,
            )
            regs = jnp.broadcast_to(
                registers.astype(self.dtype), (b, self.num_register_tokens, dim)
            )
            x = jnp.concatenate([cls, regs, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)

        n_tok = x.shape[1]
        n_valid = None
        if self.pad_tokens_to:
            n_pad = -(-n_tok // self.pad_tokens_to) * self.pad_tokens_to
            if n_pad != n_tok:
                x = jnp.pad(x, ((0, 0), (0, n_pad - n_tok), (0, 0)))
                n_valid = n_tok

        ls_init = None if self.fold_layerscale else self.layerscale_init
        if self.scan_layers:
            from .layers import BlockScanBody, scan_blocks

            x, _ = scan_blocks(BlockScanBody, cfg["depth"],
                               remat=self.remat)(
                dim,
                cfg["num_heads"],
                mlp_ratio=4.0,
                qkv_bias=True,
                layerscale_init=ls_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.attn_impl,
                mlp_token_chunk=self.mlp_token_chunk,
                n_valid=n_valid,
                name="blocks",
            )(x)
        else:
            block_cls = Block
            if self.remat:
                # n_valid (arg 3, counting self) is a static python int
                block_cls = nn.remat(Block, static_argnums=(3,))
            for i in range(cfg["depth"]):
                x = block_cls(
                    dim,
                    cfg["num_heads"],
                    mlp_ratio=4.0,
                    qkv_bias=True,
                    layerscale_init=ls_init,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    attn_impl=self.attn_impl,
                    mlp_token_chunk=self.mlp_token_chunk,
                    name=f"blocks_{i}",
                )(x, None, n_valid)

        x = FusedLayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )(x)
        start = 1 + self.num_register_tokens
        patch_tokens = x[:, start : start + gh * gw, :]
        return patch_tokens.reshape(b, gh, gw, dim)
