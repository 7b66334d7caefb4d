"""Module-level golden parity: DPT head, pose head, trunk (VERDICT item 3).

Three conversion+output-parity harnesses in the same style as the DINOv2 one
(tests/test_weights.py):

  * the reference's VENDORED torch DPTHead (external/vggt/heads/dpt_head.py:20)
    with random weights vs our DPTFeature+DPTRegressionProcessor — the
    strongest available oracle for the DPT math (UniCeption's DPT pair
    implements the same reassemble/fusion pyramid, SURVEY §2.6);
  * the UniCeption-shaped PoseHead mirror (tests/torch_mirror.py) vs
    nn/heads.py PoseHead;
  * the alternating-attention trunk mirror vs nn/trunk.py, including IFR tap
    norms, ref/non-ref embeddings and the scale token path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mapanything_tpu.nn.dpt import DPTFeature, DPTRegressionProcessor
from mapanything_tpu.nn.heads import PoseHead
from mapanything_tpu.nn.trunk import AlternatingAttentionTrunk
from mapanything_tpu.utils.weights import (
    _SubDict,
    convert_dpt_feature,
    convert_dpt_regressor,
    convert_pose_head,
    convert_trunk,
)

from torch_mirror import (
    AlternatingTrunk,
    PoseHead as TorchPoseHead,
    randomize_state_dict,
    stub_reference_packages,
)


@pytest.fixture(scope="module", autouse=True)
def high_precision():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


class TestVendoredVGGTDPTHead:
    def test_dpt_parity(self):
        stub_reference_packages()
        from mapanything.models.external.vggt.heads.dpt_head import DPTHead

        dim_in, features = 48, 32
        out_channels = [16, 32, 48, 64]
        head = DPTHead(
            dim_in=dim_in, patch_size=14, output_dim=4, activation="linear",
            conf_activation="expp1", features=features,
            out_channels=out_channels, intermediate_layer_idx=[0, 1, 2, 3],
            pos_embed=False, feature_only=False,
        )
        randomize_state_dict(head, seed=5)
        head.eval()

        b, s, gh, gw = 1, 2, 4, 6
        h, w = gh * 14, gw * 14
        rng = np.random.default_rng(0)
        tokens = [
            rng.standard_normal((b, s, gh * gw + 1, dim_in)).astype(np.float32)
            for _ in range(4)
        ]
        images = np.zeros((b, s, 3, h, w), np.float32)
        with torch.no_grad():
            preds, conf = head(
                [torch.from_numpy(t) for t in tokens],
                torch.from_numpy(images), patch_start_idx=1,
                frames_chunk_size=None,
            )

        # split the head's state_dict at the feature/regressor seam
        sd = head.state_dict()
        feat_sd = {k: v for k, v in sd.items()
                   if not k.startswith("scratch.output_conv")}
        reg_sd = {k[len("scratch."):]: v for k, v in sd.items()
                  if k.startswith("scratch.output_conv")}
        feat_params = convert_dpt_feature(_SubDict(feat_sd, ""))
        reg_params = convert_dpt_regressor(_SubDict(reg_sd, ""))
        assert "input_norm" in feat_params  # VGGT input LayerNorm converted

        ours_feat = DPTFeature(
            feature_dim=features, out_channels=tuple(out_channels),
            use_input_norm=True, dtype=jnp.float32,
        )
        ours_reg = DPTRegressionProcessor(
            input_feature_dim=features, output_dim=4,
            hidden_dims=(features // 2, 32), dtype=jnp.float32,
        )
        hooks = [
            jnp.asarray(t[:, :, 1:].reshape(b * s, gh, gw, dim_in))
            for t in tokens
        ]
        fused = ours_feat.apply({"params": feat_params}, hooks)
        raw = ours_reg.apply({"params": reg_params}, fused, (h, w))
        raw = np.asarray(raw)

        np.testing.assert_allclose(
            raw[..., :3].reshape(preds.shape), preds.numpy(),
            atol=5e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            (1 + np.exp(raw[..., 3])).reshape(conf.shape), conf.numpy(),
            atol=5e-5, rtol=1e-4,
        )


class TestPoseHeadParity:
    def test_pose_head_parity(self):
        dim = 64
        th = TorchPoseHead(dim, num_resconv=2)
        randomize_state_dict(th, seed=6)
        th.eval()

        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, dim, 4, 6)).astype(np.float32)
        with torch.no_grad():
            ref = th(torch.from_numpy(x)).numpy()

        params = convert_pose_head(_SubDict(th.state_dict(), ""))
        ours = PoseHead(input_feature_dim=dim, num_resconv_block=2,
                        dtype=jnp.float32)
        out = ours.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


class TestTrunkParity:
    def test_trunk_parity(self):
        in_dim, dim, depth, heads = 48, 64, 4, 2
        indices = (1, 2)
        tt = AlternatingTrunk(in_dim, dim, depth, heads, indices)
        randomize_state_dict(tt, seed=7)
        tt.eval()

        b, v, gh, gw = 2, 3, 2, 3
        rng = np.random.default_rng(2)
        feats = rng.standard_normal((b, v, in_dim, gh, gw)).astype(np.float32)
        tok = rng.standard_normal((b, in_dim, 1)).astype(np.float32)
        with torch.no_grad():
            final_t, inter_t, tok_t = tt(torch.from_numpy(feats),
                                         torch.from_numpy(tok))

        params = convert_trunk(_SubDict(tt.state_dict(), ""),
                               indices=indices)
        ours = AlternatingAttentionTrunk(
            input_embed_dim=in_dim, dim=dim, depth=depth, num_heads=heads,
            indices=indices, dtype=jnp.float32,
        )
        final, inter, tok_out = ours.apply(
            {"params": params},
            jnp.asarray(feats.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(tok.transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(final).transpose(0, 1, 4, 2, 3), final_t.numpy(),
            atol=1e-5, rtol=1e-4,
        )
        for o, t in zip(inter, inter_t):
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 1, 4, 2, 3), t.numpy(),
                atol=1e-5, rtol=1e-4,
            )
        np.testing.assert_allclose(np.asarray(tok_out), tok_t.numpy(),
                                   atol=1e-5, rtol=1e-4)
