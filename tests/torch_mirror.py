"""PyTorch mirror of the reference MapAnything for conversion golden tests.

Purpose: the real facebook/map-anything checkpoint is not downloadable in
this offline environment, so we synthesize one. This module builds a torch
model whose

  * state_dict KEY LAYOUT follows the reference: top-level attribute names
    pinned by reference model.py:157-196,374-388 (encoder, ray_dirs_encoder,
    ..., info_sharing, dpt_feature_head, dpt_regressor_head, dense_head
    Sequential aliasing, pose_head, scale_head, scale_token), submodule
    internals per the in-repo concrete specs (torch-hub DINOv2 exactly;
    vendored-VGGT/timm naming for trunk blocks and the DPT pyramid —
    external/vggt/heads/dpt_head.py:60-151, models/aggregator.py:85-117);
  * forward MATH replicates the reference forward (model.py:1477-1745) at
    deterministic inference (input probabilities 0/1), reusing the reference
    geometry functions as oracles.

tests/test_full_conversion.py randomizes this model, converts its
state_dict with utils/weights.convert_mapanything_checkpoint (asserting 100%
key consumption) and requires our JAX model to reproduce its outputs.

NO code is copied from the reference; the reference is imported and called
(geometry, vendored DINOv2 blocks) or re-expressed from its documented
behavior.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE = "/root/reference"


def stub_reference_packages():
    """Make the reference's pure-torch modules importable without omegaconf
    (their parent packages' __init__ pull in unavailable deps)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for pkg, path in [
        ("mapanything", f"{REFERENCE}/mapanything"),
        ("mapanything.models", f"{REFERENCE}/mapanything/models"),
        ("mapanything.models.external",
         f"{REFERENCE}/mapanything/models/external"),
    ]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m


stub_reference_packages()

from mapanything.models.external.dinov2.layers.block import Block  # noqa: E402
from mapanything.models.external.dinov2.models.vision_transformer import (  # noqa: E402
    vit_small,
)
from mapanything.utils.geometry import (  # noqa: E402
    apply_log_to_norm,
    convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap,
    normalize_depth_using_non_zero_pixels,
    normalize_pose_translations,
    transform_pose_using_quats_and_trans_2_to_1,
)

from functools import partial  # noqa: E402

LN6 = partial(nn.LayerNorm, eps=1e-6)


class HubEncoder(nn.Module):
    """torch-hub-wrapped DINOv2 (state_dict prefix encoder.model.*)."""

    def __init__(self, patch_size=14, arch=vit_small):
        super().__init__()
        self.model = arch(patch_size=patch_size, init_values=1.0,
                          img_size=518, block_chunks=0)
        self.enc_embed_dim = self.model.embed_dim
        self.patch_size = patch_size

    def forward(self, imgs):  # (N, 3, H, W) -> (N, C, gh, gw)
        n, _, h, w = imgs.shape
        tokens = self.model.forward_features(imgs)["x_norm_patchtokens"]
        gh, gw = h // self.patch_size, w // self.patch_size
        return tokens.reshape(n, gh, gw, -1).permute(0, 3, 1, 2).contiguous()


class CrocoHubEncoder(nn.Module):
    """CroCo/DUSt3R-layout encoder (state_dict keys patch_embed.proj.*,
    enc_blocks.N.*, enc_norm.*): conv patchify + fixed 2D sin-cos PE +
    pre-norm ViT blocks without LayerScale. The sin-cos table is taken from
    mapanything_tpu.nn.croco so the PE convention is pinned in ONE place
    (real croco checkpoints ship it as the enc_pos_embed buffer, which the
    converter skips and recomputes)."""

    def __init__(self, dim=64, depth=2, num_heads=2, patch_size=16):
        super().__init__()
        self.patch_size = patch_size
        self.enc_embed_dim = dim
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.patch_embed = pe
        # vendored DINOv2 block with init_values=None == croco block layout
        self.enc_blocks = nn.ModuleList(
            [Block(dim, num_heads, qkv_bias=True, norm_layer=LN6)
             for _ in range(depth)]
        )
        self.enc_norm = LN6(dim)

    def forward(self, imgs):  # (N, 3, H, W) -> (N, C, gh, gw)
        from mapanything_tpu.nn.croco import sincos_pos_embed_2d

        n, _, h, w = imgs.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = self.patch_embed.proj(imgs)  # (N, C, gh, gw)
        x = x.flatten(2).transpose(1, 2)  # (N, gh*gw, C)
        pos = torch.from_numpy(
            sincos_pos_embed_2d(gh, gw, x.shape[-1])
        ).to(x.dtype)
        x = x + pos[None]
        for blk in self.enc_blocks:
            x = blk(x)
        x = self.enc_norm(x)
        return x.reshape(n, gh, gw, -1).permute(0, 3, 1, 2).contiguous()


class DenseRepEncoder(nn.Module):
    """dense_rep_encoder: conv patchify, no PE (task/default.yaml:1-12)."""

    def __init__(self, in_ch, dim, patch_size=14):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch_size, stride=patch_size)

    def forward(self, x):  # (N, C_in, H, W) -> (N, C, gh, gw)
        return self.proj(x)


class GlobalRepEncoder(nn.Module):
    """global_rep_encoder: MLP on per-view vectors (task/default.yaml:13-27)."""

    def __init__(self, in_dim, dim):
        super().__init__()
        self.fc1 = nn.Linear(in_dim, dim)
        self.fc2 = nn.Linear(dim, dim)

    def forward(self, x):  # (N, in) -> (N, C)
        return self.fc2(F.gelu(self.fc1(x)))


class AlternatingTrunk(nn.Module):
    """MultiViewAlternatingAttentionTransformerIFR mirror: flat `blocks`
    list (even = frame attention, odd = global attention over all views'
    tokens + the scale token), ref/non-ref view embeddings, IFR taps with
    per-tap LayerNorms, shared final norm."""

    def __init__(self, input_dim, dim, depth, num_heads, indices):
        super().__init__()
        self.dim = dim
        self.depth = depth
        self.indices = list(indices)
        self.proj = nn.Linear(input_dim, dim)
        self.blocks = nn.ModuleList(
            [Block(dim, num_heads, qkv_bias=True, norm_layer=LN6)
             for _ in range(depth)]
        )
        self.ref_view_embed = nn.Parameter(torch.zeros(dim))
        self.non_ref_view_embed = nn.Parameter(torch.zeros(dim))
        self.norm_intermediate = nn.ModuleList(
            [LN6(dim) for _ in indices]
        )
        self.norm = LN6(dim)

    def forward(self, feats, extra_tok):
        # feats: (B, V, C_in, gh, gw); extra_tok: (B, C_in, 1)
        b, v, _, gh, gw = feats.shape
        p = gh * gw
        x = feats.flatten(3).permute(0, 1, 3, 2)  # (B, V, P, C_in)
        x = self.proj(x)
        tok = self.proj(extra_tok.permute(0, 2, 1))  # (B, 1, dim)

        x = x + torch.where(
            (torch.arange(v) == 0).view(1, v, 1, 1),
            self.ref_view_embed.view(1, 1, 1, -1),
            self.non_ref_view_embed.view(1, 1, 1, -1),
        )

        inter = []
        for i, blk in enumerate(self.blocks):
            if i % 2 == 1:  # global
                flat = torch.cat([x.reshape(b, v * p, self.dim), tok], dim=1)
                flat = blk(flat)
                x = flat[:, : v * p].reshape(b, v, p, self.dim)
                tok = flat[:, v * p:]
            else:  # frame
                x = blk(x.reshape(b * v, p, self.dim)).reshape(b, v, p, self.dim)
            if i in self.indices:
                k = self.indices.index(i)
                inter.append(self.norm_intermediate[k](x))

        x = self.norm(x)
        tok = self.norm(tok)

        def to_maps(t):  # (B, V, P, C) -> (B, V, C, gh, gw)
            return t.reshape(b, v, gh, gw, self.dim).permute(0, 1, 4, 2, 3)

        return to_maps(x), [to_maps(t) for t in inter], tok


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        # The reference lineage uses nn.ReLU(inplace=True), which mutates x
        # before the skip-add — the effective residual is relu(x)
        # (vendored VGGT dpt_head.py:430-485).
        act = F.relu(x)
        out = self.conv1(act)
        out = self.conv2(F.relu(out))
        return out + act


class FusionBlock(nn.Module):
    def __init__(self, features, has_residual=True):
        super().__init__()
        if has_residual:
            self.resConfUnit1 = ResidualConvUnit(features)
        self.has_residual = has_residual
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, res=None, size=None):
        if self.has_residual:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        kw = {"size": size} if size is not None else {"scale_factor": 2}
        x = F.interpolate(x, mode="bilinear", align_corners=True, **kw)
        return self.out_conv(x)


class DPTFeatureHead(nn.Module):
    """DPTFeature mirror (vendored-VGGT scratch naming)."""

    def __init__(self, input_dims, feature_dim=64,
                 out_channels=(48, 96, 192, 384)):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(d, oc, 1) for d, oc in zip(input_dims, out_channels)]
        )
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, stride=4),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, stride=2, padding=1),
        ])
        scratch = nn.Module()
        for i, oc in enumerate(out_channels):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(oc, feature_dim, 3, padding=1, bias=False))
        scratch.refinenet1 = FusionBlock(feature_dim)
        scratch.refinenet2 = FusionBlock(feature_dim)
        scratch.refinenet3 = FusionBlock(feature_dim)
        scratch.refinenet4 = FusionBlock(feature_dim, has_residual=False)
        self.scratch = scratch

    def forward(self, hooks):  # 4 x (N, C_i, gh, gw) -> (N, F, gh*8, gw*8)
        levels = [p(h) for p, h in zip(self.projects, hooks)]
        levels = [r(l) for r, l in zip(self.resize_layers, levels)]
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(l)
              for i, l in enumerate(levels)]
        path = self.scratch.refinenet4(rn[3], size=rn[2].shape[2:])
        path = self.scratch.refinenet3(path, rn[2], size=rn[1].shape[2:])
        path = self.scratch.refinenet2(path, rn[1], size=rn[0].shape[2:])
        path = self.scratch.refinenet1(path, rn[0])
        return path


class DPTRegressorHead(nn.Module):
    """DPTRegressionProcessor mirror (VGGT output_conv naming)."""

    def __init__(self, feature_dim, output_dim, hidden=(32, 16)):
        super().__init__()
        self.output_conv1 = nn.Conv2d(feature_dim, hidden[0], 3, padding=1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(hidden[0], hidden[1], 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(hidden[1], output_dim, 1),
        )

    def forward(self, x, out_hw):
        x = self.output_conv1(x)
        x = F.interpolate(x, size=out_hw, mode="bilinear", align_corners=True)
        return self.output_conv2(x)


class PoseHead(nn.Module):
    """UniCeption PoseHead mirror: 1x1 proj conv, `num_resconv_block`
    residual conv blocks, global average pool, MLP -> (trans 3, quat 4)."""

    def __init__(self, dim, num_resconv=2, rot_dim=4):
        super().__init__()
        hidden = dim // 2
        self.proj = nn.Conv2d(dim, hidden, 1)
        self.res_conv_blocks = nn.ModuleList(
            [ResidualConvUnit(hidden) for _ in range(num_resconv)]
        )
        self.fc1 = nn.Linear(hidden, hidden)
        self.fc_out = nn.Linear(hidden, 3 + rot_dim)

    def forward(self, x):  # (N, C, gh, gw) -> (N, 7)
        x = self.proj(x)
        for blk in self.res_conv_blocks:
            x = blk(x)
        x = x.mean(dim=(2, 3))
        return self.fc_out(F.gelu(self.fc1(x)))


class MLPHead(nn.Module):
    def __init__(self, dim, out_dim=1):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim // 2)
        self.fc2 = nn.Linear(dim // 2, out_dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class MirrorMapAnything(nn.Module):
    """Tiny flagship-architecture MapAnything mirror (raydirs+depth+pose+
    confidence+mask scene rep, scale token, alternating IFR trunk)."""

    def __init__(self, trunk_dim=64, trunk_depth=4, trunk_heads=2,
                 indices=(1, 2), dpt_feature_dim=64, patch_size=14,
                 encoder_family="dinov2", encoder=None):
        super().__init__()
        self.patch_size = patch_size
        self.indices = indices
        if encoder is not None:
            self.encoder = encoder  # caller-built (e.g. flagship ViT-L)
        elif encoder_family == "dinov2":
            self.encoder = HubEncoder(patch_size)
        elif encoder_family == "croco":
            self.encoder = CrocoHubEncoder(dim=64, depth=2, num_heads=2,
                                           patch_size=patch_size)
        elif encoder_family == "radio":
            self.encoder = RadioMapsEncoder(dim=64, depth=2, num_heads=2,
                                            patch_size=patch_size)
        else:
            raise ValueError(encoder_family)
        dim = self.encoder.enc_embed_dim
        self.ray_dirs_encoder = DenseRepEncoder(3, dim, patch_size)
        self.depth_encoder = DenseRepEncoder(1, dim, patch_size)
        self.depth_scale_encoder = GlobalRepEncoder(1, dim)
        self.cam_rot_encoder = GlobalRepEncoder(4, dim)
        self.cam_trans_encoder = GlobalRepEncoder(3, dim)
        self.cam_trans_scale_encoder = GlobalRepEncoder(1, dim)
        self.fusion_norm_layer = LN6(dim)
        self.scale_token = nn.Parameter(torch.zeros(dim))
        self.info_sharing = AlternatingTrunk(dim, trunk_dim, trunk_depth,
                                             trunk_heads, indices)
        self.dpt_feature_head = DPTFeatureHead(
            (dim, trunk_dim, trunk_dim, trunk_dim), dpt_feature_dim
        )
        self.dpt_regressor_head = DPTRegressorHead(dpt_feature_dim, 6)
        # reference model.py:378: the SAME module objects re-registered in an
        # nn.Sequential -> duplicated state_dict keys (dense_head.0.* etc.)
        self.dense_head = nn.Sequential(self.dpt_feature_head,
                                        self.dpt_regressor_head)
        self.pose_head = PoseHead(trunk_dim, num_resconv=2)
        self.scale_head = MLPHead(trunk_dim, 1)

    @torch.no_grad()
    def forward(self, imgs, ray_dirs=None, depth=None, quats=None,
                trans=None, is_metric=None):
        """Deterministic inference forward (all provided priors on).

        imgs (B, V, 3, H, W); ray_dirs (B, V, H, W, 3); depth (B, V, H, W, 1);
        quats (B, V, 4); trans (B, V, 3); is_metric (B, V) bool.
        Returns dict of (B, V, ...) outputs matching our JAX model's keys.
        """
        b, v, _, h, w = imgs.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        # view-major concatenation (reference _encode_n_views)
        vm = imgs.permute(1, 0, 2, 3, 4).reshape(v * b, 3, h, w)
        fused = self.encoder(vm).float()  # (V*B, C, gh, gw)

        # --- ray dirs fusion (model.py:753-825) --------------------------
        if ray_dirs is not None:
            rd = ray_dirs.permute(1, 0, 4, 2, 3).reshape(v * b, 3, h, w)
            feat = self.ray_dirs_encoder(rd)
            fused = fused + feat

        # --- depth fusion (model.py:827-1010) ----------------------------
        if depth is not None:
            d_norm_list, d_factor_list = [], []
            for vi in range(v):
                nd, fac = normalize_depth_using_non_zero_pixels(
                    depth[:, vi], return_norm_factor=True
                )
                d_norm_list.append(nd)
                d_factor_list.append(fac)
            d = torch.cat(d_norm_list, dim=0)  # (V*B, H, W, 1)
            d = apply_log_to_norm(d)
            feat = self.depth_encoder(d.permute(0, 3, 1, 2).contiguous())
            fused = fused + feat
            factors = torch.cat(d_factor_list, dim=0)  # (V*B,)
            scale_feat = self.depth_scale_encoder(
                torch.log(factors + 1e-8).unsqueeze(-1)
            )
            metric = (is_metric if is_metric is not None
                      else torch.zeros(b, v, dtype=torch.bool))
            metric_vm = metric.permute(1, 0).reshape(v * b, 1).float()
            fused = fused + (scale_feat * metric_vm)[..., None, None]

        # --- camera fusion (model.py:647-751, 1012-1131) ------------------
        if quats is not None and trans is not None:
            q0 = quats[:, :1].expand_as(quats).reshape(b * v, 4)
            t0 = trans[:, :1].expand_as(trans).reshape(b * v, 3)
            rq, rt = transform_pose_using_quats_and_trans_2_to_1(
                q0, t0, quats.reshape(b * v, 4), trans.reshape(b * v, 3)
            )
            rq = rq.reshape(b, v, 4)
            rt = rt.reshape(b, v, 3)
            rq_vm = rq.permute(1, 0, 2).reshape(v * b, 4)
            fused = fused + self.cam_rot_encoder(rq_vm)[..., None, None]

            st, t_norm = normalize_pose_translations(rt, return_norm_factor=True)
            st_vm = st.permute(1, 0, 2).reshape(v * b, 3)
            fused = fused + self.cam_trans_encoder(st_vm)[..., None, None]

            log_tn = torch.log(t_norm + 1e-8)[:, None].repeat(v, 1)  # (V*B, 1)
            ts_feat = self.cam_trans_scale_encoder(log_tn)
            metric = (is_metric if is_metric is not None
                      else torch.zeros(b, v, dtype=torch.bool))
            metric_vm = metric.permute(1, 0).reshape(v * b, 1).float()
            fused = fused + (ts_feat * metric_vm)[..., None, None]

        # --- fusion norm (model.py:1245-1254) ------------------------------
        fused = self.fusion_norm_layer(
            fused.permute(0, 2, 3, 1)
        ).permute(0, 3, 1, 2).contiguous()

        # --- trunk ---------------------------------------------------------
        # view-major (V*B) -> (B, V, C, gh, gw)
        feats_bv = fused.reshape(v, b, -1, gh, gw).permute(1, 0, 2, 3, 4)
        tok_in = self.scale_token[None, :, None].repeat(b, 1, 1)  # (B, C, 1)
        final, inter, tok = self.info_sharing(feats_bv, tok_in)

        # --- heads (hooks: [encoder, tap0, tap1, final]) -------------------
        enc_bv = fused.reshape(v, b, -1, gh, gw).permute(1, 0, 2, 3, 4)
        # NOTE: hook 0 is the *fused* encoder features (the reference fuses
        # priors into all_encoder_features_across_views in place and the DPT
        # consumes the fused version, model.py:1556-1560).
        hooks = [enc_bv] + inter + [final]
        hooks = [t.reshape(b * v, *t.shape[2:]) for t in hooks]

        raw_dense = self.dpt_regressor_head(
            self.dpt_feature_head(hooks), (h, w)
        )  # (B*V, 6, H, W)
        raw_pose = self.pose_head(hooks[-1])  # (B*V, 7)
        raw_scale = self.scale_head(tok[:, 0])  # (B, 1)

        # --- adaptors + recombination (model.py:1683-1741) ----------------
        dense = raw_dense.permute(0, 2, 3, 1)  # (B*V, H, W, 6)
        rd_raw, dpt_raw, conf_raw, mask_raw = dense.split([3, 1, 1, 1], dim=-1)
        ray_dirs_out = rd_raw / rd_raw.norm(dim=-1, keepdim=True).clip(min=1e-8)
        depth_out = torch.exp(dpt_raw)
        conf = 1.0 + torch.exp(conf_raw)
        mask_logits = mask_raw
        tr = raw_pose[:, :3]
        qt = raw_pose[:, 3:]
        qt = qt / qt.norm(dim=-1, keepdim=True).clip(min=1e-8)
        scale = 1e-8 + torch.exp(raw_scale)  # (B, 1)

        pts3d = convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap(
            ray_dirs_out, depth_out, tr, qt
        )
        pts3d_cam = ray_dirs_out * depth_out

        def unflat(t):  # (B*V, ...) b-major -> (B, V, ...)
            return t.reshape(b, v, *t.shape[1:])

        s_dense = scale[:, :, None, None, None]  # (B,1,1,1,1)
        return {
            "pts3d": unflat(pts3d) * s_dense,
            "pts3d_cam": unflat(pts3d_cam) * s_dense,
            "ray_directions": unflat(ray_dirs_out),
            "depth_along_ray": unflat(depth_out) * s_dense,
            "cam_trans": unflat(tr) * scale[:, :, None],
            "cam_quats": unflat(qt),
            "metric_scaling_factor": scale[:, 0],
            "conf": unflat(conf)[..., 0],
            "non_ambiguous_mask_logits": unflat(mask_logits)[..., 0],
        }


class RadioMirror(nn.Module):
    """torch-hub AM-RADIO RADIOModel mirror: hub state_dict key layout
    (input_conditioner.norm_*, model.patch_generator.{embedder,pos_embed,
    cls_token.token}, model.blocks.N.*, model.norm) and forward math
    (conditioner -> Linear patchify -> bilinear CPE -> cls/registers with no
    PE -> pre-norm blocks -> final norm -> patch tokens)."""

    def __init__(self, dim=64, depth=2, num_heads=2, patch_size=16,
                 pos_grid=8, num_registers=0):
        super().__init__()
        from mapanything.models.external.dinov2.layers.block import (
            Block as DinoBlock,
        )

        self.patch_size = patch_size
        self.pos_grid = pos_grid
        self.num_registers = num_registers

        cond = nn.Module()
        cond.register_buffer(
            "norm_mean",
            torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1),
        )
        cond.register_buffer(
            "norm_std",
            torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1),
        )
        self.input_conditioner = cond

        model = nn.Module()
        pg = nn.Module()
        pg.embedder = nn.Linear(patch_size * patch_size * 3, dim)
        pg.pos_embed = nn.Parameter(torch.zeros(1, pos_grid * pos_grid, dim))
        ct = nn.Module()
        ct.token = nn.Parameter(torch.zeros(1, 1 + num_registers, dim))
        pg.cls_token = ct
        model.patch_generator = pg
        # timm layout == vendored DINOv2 block with init_values=None
        # (Identity layerscale registers no tensors)
        model.blocks = nn.ModuleList(
            [DinoBlock(dim, num_heads, qkv_bias=True, norm_layer=LN6)
             for _ in range(depth)]
        )
        model.norm = LN6(dim)
        self.model = model

    def forward(self, x):  # (N, 3, H, W) in [0,1] -> (N, gh*gw, C)
        p = self.patch_size
        n, _, h, w = x.shape
        gh, gw = h // p, w // p
        x = (x - self.input_conditioner.norm_mean) / \
            self.input_conditioner.norm_std
        # im_to_patches: b c (h p1) (w p2) -> b (h w) (p1 p2 c)
        x = x.reshape(n, 3, gh, p, gw, p).permute(0, 2, 4, 3, 5, 1)
        x = x.reshape(n, gh * gw, p * p * 3)
        x = self.model.patch_generator.embedder(x)

        pos = self.model.patch_generator.pos_embed
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            c = pos.shape[-1]
            grid = pos.reshape(1, self.pos_grid, self.pos_grid, c)
            grid = grid.permute(0, 3, 1, 2)
            grid = F.interpolate(grid, size=(gh, gw), mode="bilinear",
                                 align_corners=False)
            pos = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, c)
        x = x + pos

        tok = self.model.patch_generator.cls_token.token.expand(n, -1, -1)
        x = torch.cat([tok, x], dim=1)
        for blk in self.model.blocks:
            x = blk(x)
        x = self.model.norm(x)
        return x[:, 1 + self.num_registers:, :]


class RadioMapsEncoder(RadioMirror):
    """RadioMirror adapted to the MirrorMapAnything encoder seam: exposes
    enc_embed_dim and returns (N, C, gh, gw) feature maps. Same state_dict
    layout as RadioMirror (subclassing adds no tensors)."""

    def __init__(self, dim=64, depth=2, num_heads=2, patch_size=16):
        super().__init__(dim=dim, depth=depth, num_heads=num_heads,
                         patch_size=patch_size)
        self.enc_embed_dim = dim

    def forward(self, imgs):  # (N, 3, H, W) in [0,1] -> (N, C, gh, gw)
        n, _, h, w = imgs.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = super().forward(imgs)
        return tokens.reshape(n, gh, gw, -1).permute(0, 3, 1, 2).contiguous()


def randomize_state_dict(model: nn.Module, seed: int = 0) -> None:
    """Fill every parameter with reproducible, numerically-tame values."""
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for k, t in sd.items():
        arr = rng.standard_normal(tuple(t.shape)).astype(np.float32)
        if ("norm" in k or "ls1" in k or "ls2" in k) and k.endswith("weight") \
                and t.ndim == 1:
            vals = 1.0 + 0.1 * arr  # LayerNorm/LayerScale scales near 1
        elif k.endswith("bias"):
            vals = 0.02 * arr
        else:
            vals = 0.04 * arr
        t.copy_(torch.from_numpy(vals))
