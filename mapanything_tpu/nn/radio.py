"""RADIO (NVIDIA AM-RADIO) ViT encoder family (flax.linen).

Closes the third encoder arm of the reference factory
(configs/model/encoder/radio_v2_5_large.yaml: encoder_str "radio",
model_version "radio_v2.5-l", uses_torch_hub) — the reference loads the
model through UniCeption's torch-hub wrapper; the architecture below is the
published AM-RADIO RADIOModel rebuilt TPU-first:

  * input_conditioner: the RADIO hub model takes [0,1] images (the
    config's data_norm_type "radio" is identity at the data layer —
    IMAGE_NORMALIZATION_DICT["radio"] in dinov2.py) and normalizes
    internally with CLIP statistics. We keep (mean, std) as converted
    parameters so checkpoints carry their own conditioner buffers.
  * ViTPatchGenerator ("cropped position embedding" ViT): patch embedding
    is a Linear over (p, p, 3)-flattened patches (expressed here as a
    p-stride conv — identical math, MXU-friendly), a learnable absolute
    pos-embed grid stored at the pretraining resolution and bilinearly
    resampled (align_corners=False) to the input grid as two static
    interpolation matmuls, a cls token and optional register tokens with
    NO positional embedding.
  * timm-style pre-norm blocks (no LayerScale), final LayerNorm; the
    spatial-feature output is the patch tokens.

Weights are not downloadable in this offline environment; conversion-rule
and math fidelity are locked by tests/test_weights.py parity vs a torch
mirror with the hub state_dict key layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Block

RADIO_CONFIGS = {
    # "test" is a 2-layer stub with the same module structure, for fast
    # unit tests / dryruns only.
    "test": dict(embed_dim=64, depth=2, num_heads=2),
    # radio_v2.5-b / -l / -h (timm vit_{base,large,huge}_patch16_224
    # backbones per the AM-RADIO release table)
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "huge": dict(embed_dim=1280, depth=32, num_heads=16),
}

# RADIO's get_default_conditioner(): OpenAI-CLIP normalization applied
# inside the model to [0,1] inputs.
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def bilinear_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix M with (M @ x) == torch F.interpolate(x, bilinear,
    align_corners=False) along one axis (no antialias)."""
    mat = np.zeros((dst, src), dtype=np.float64)
    scale = dst / src
    for i in range(dst):
        s = (i + 0.5) / scale - 0.5
        lo = int(np.floor(s))
        frac = s - lo
        for j, w in ((lo, 1.0 - frac), (lo + 1, frac)):
            mat[i, int(np.clip(j, 0, src - 1))] += w
    return mat.astype(np.float32)


def resample_pos_embed_bilinear(
    pos: jnp.ndarray, src_hw: tuple, dst_hw: tuple
) -> jnp.ndarray:
    """Bilinear-resample (src_h*src_w, C) pos-embeds to (dst_h*dst_w, C) as
    two static matmuls (ViTPatchGenerator's F.interpolate path)."""
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return pos
    c = pos.shape[-1]
    grid = pos.reshape(sh, sw, c).astype(jnp.float32)
    mh = jnp.asarray(bilinear_resize_matrix(sh, dh))
    mw = jnp.asarray(bilinear_resize_matrix(sw, dw))
    out = jnp.einsum("ij,jkc->ikc", mh, grid, precision="highest")
    out = jnp.einsum("kj,ijc->ikc", mw, out, precision="highest")
    return out.reshape(dh * dw, c)


class RadioViT(nn.Module):
    """RADIO vision transformer returning patch tokens.

    Input: NHWC images in [0,1] (data_norm_type "radio" = identity).
    Output: (B, H/p, W/p, C) patch features (channel-last for TPU layouts).
    """

    size: str = "large"
    patch_size: int = 16
    img_size: int = 1024  # pretraining grid shaping the stored pos_embed
    num_register_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @property
    def embed_dim(self) -> int:
        return RADIO_CONFIGS[self.size]["embed_dim"]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = RADIO_CONFIGS[self.size]
        dim = cfg["embed_dim"]
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        # input conditioner (checkpoint buffers input_conditioner.norm_*)
        norm_mean = self.param(
            "norm_mean", lambda *_: jnp.asarray(CLIP_MEAN)
        )
        norm_std = self.param(
            "norm_std", lambda *_: jnp.asarray(CLIP_STD)
        )
        x = (x.astype(jnp.float32) - norm_mean) / norm_std

        # ViTPatchGenerator.embedder: Linear over (p1 p2 c)-flattened
        # patches == p-stride conv with HWIO kernel (same flatten order).
        x = nn.Conv(
            dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(b, gh * gw, dim)

        m_h = m_w = self.img_size // self.patch_size
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (m_h * m_w, dim),
            self.param_dtype,
        )
        pos = resample_pos_embed_bilinear(pos_embed, (m_h, m_w), (gh, gw))
        x = x + pos[None].astype(self.dtype)

        # cls + registers carry no positional embedding (ClsToken module)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim),
            self.param_dtype,
        )
        tokens = [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, dim))]
        if self.num_register_tokens:
            registers = self.param(
                "register_tokens",
                nn.initializers.normal(0.02),
                (1, self.num_register_tokens, dim),
                self.param_dtype,
            )
            tokens.append(
                jnp.broadcast_to(
                    registers.astype(self.dtype),
                    (b, self.num_register_tokens, dim),
                )
            )
        x = jnp.concatenate(tokens + [x], axis=1)

        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(cfg["depth"]):
            x = block_cls(
                dim,
                cfg["num_heads"],
                mlp_ratio=4.0,
                qkv_bias=True,
                layerscale_init=None,  # timm ViT backbone: no LayerScale
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(x)

        x = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm",
        )(x)
        patch_tokens = x[:, 1 + self.num_register_tokens :, :]
        return patch_tokens.reshape(b, gh, gw, dim).astype(self.dtype)
