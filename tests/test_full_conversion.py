"""Full-model checkpoint conversion + end-to-end output parity.

The acceptance test for weight compatibility (round-1 VERDICT items 2-3,
SURVEY.md §7.3): a reference-shaped torch MapAnything state_dict (see
tests/torch_mirror.py for why it is synthesized and how its naming is
pinned) must be consumed COMPLETELY by convert_mapanything_checkpoint, and
our JAX model under the converted weights must reproduce the torch forward
outputs end to end — images-only AND with all geometric priors.
"""

import numpy as np
import pytest
import torch

from jitu import japply

import jax
import jax.numpy as jnp

from mapanything_tpu.models import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    images_only_config,
)
from mapanything_tpu.utils.weights import (
    convert_mapanything_checkpoint,
    infer_model_config,
)

from torch_mirror import MirrorMapAnything, randomize_state_dict

INDICES = (1, 2)


@pytest.fixture(scope="module", autouse=True)
def high_precision():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


@pytest.fixture(scope="module")
def mirror():
    m = MirrorMapAnything(trunk_dim=64, trunk_depth=4, trunk_heads=2,
                          indices=INDICES, dpt_feature_dim=64)
    randomize_state_dict(m, seed=3)
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(mirror):
    sd = mirror.state_dict()
    tree = convert_mapanything_checkpoint(sd, trunk_indices=INDICES)
    return sd, tree


class TestConversionCompleteness:
    def test_all_keys_consumed(self, converted):
        sd, tree = converted
        assert "_unconverted" not in tree, (
            f"unconverted keys: {tree['_unconverted'][:10]}"
        )

    def test_aliases_are_only_known_duplicates(self, converted):
        _, tree = converted
        for k in tree.get("_aliases", []):
            assert k.startswith("dense_head.") or k.endswith("mask_token"), k

    def test_infer_model_config(self, converted):
        sd, _ = converted
        cfg = infer_model_config(sd, indices=INDICES)
        assert cfg["trunk_dim"] == 64
        assert cfg["trunk_depth"] == 4
        assert cfg["trunk_indices"] == INDICES
        assert cfg["enc_dim"] == 384
        assert cfg["dpt_feature_dim"] == 64
        assert cfg["dpt_out_channels"] == (48, 96, 192, 384)
        assert cfg["dpt_hidden_dims"] == (32, 16)
        assert cfg["dense_output_dim"] == 6
        assert cfg["pose_num_resconv"] == 2


def _our_model(converted_tree):
    tree = {k: v for k, v in converted_tree.items()
            if not k.startswith("_")}
    cfg = MapAnythingConfig(
        encoder_size="small",
        trunk_dim=64, trunk_depth=4, trunk_num_heads=2,
        trunk_indices=INDICES,
        dpt_feature_dim=64, dpt_out_channels=(48, 96, 192, 384),
        dpt_hidden_dims=(32, 16),
        dtype=jnp.float32,
    )
    return MapAnything(cfg=cfg), {"params": tree}


def _compare(ref, ours, keys, atol=2e-4, rtol=2e-3):
    for k in keys:
        r = ref[k].numpy()
        o = np.asarray(ours[k], dtype=np.float32)
        np.testing.assert_allclose(o, r, atol=atol, rtol=rtol,
                                   err_msg=f"output '{k}' diverged")


class TestOutputParity:
    B, V, H, W = 2, 3, 28, 42

    def _imgs(self, seed=0):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((self.B, self.V, 3, self.H, self.W)
                                   ).astype(np.float32) * 0.5

    KEYS = ("pts3d", "pts3d_cam", "ray_directions", "depth_along_ray",
            "cam_trans", "cam_quats", "metric_scaling_factor", "conf",
            "non_ambiguous_mask_logits")

    def test_images_only_parity(self, mirror, converted):
        _, tree = converted
        x = self._imgs(0)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(x))

        model, params = _our_model(tree)
        views = {"img": jnp.asarray(x.transpose(0, 1, 3, 4, 2))}
        ours = japply(model, geom_cfg=images_only_config())(params, views)
        _compare(ref, ours, self.KEYS)

    def test_all_priors_parity(self, mirror, converted):
        _, tree = converted
        rng = np.random.default_rng(7)
        x = self._imgs(1)
        rd = rng.standard_normal((self.B, self.V, self.H, self.W, 3)
                                 ).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
        depth = np.abs(rng.standard_normal(
            (self.B, self.V, self.H, self.W, 1))).astype(np.float32) + 0.5
        quats = rng.standard_normal((self.B, self.V, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        trans = rng.standard_normal((self.B, self.V, 3)).astype(np.float32)
        is_metric = np.ones((self.B, self.V), dtype=bool)

        with torch.no_grad():
            ref = mirror(
                torch.from_numpy(x), ray_dirs=torch.from_numpy(rd),
                depth=torch.from_numpy(depth),
                quats=torch.from_numpy(quats),
                trans=torch.from_numpy(trans),
                is_metric=torch.from_numpy(is_metric),
            )

        model, params = _our_model(tree)
        views = {
            "img": jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            "ray_directions_cam": jnp.asarray(rd),
            "depth_along_ray": jnp.asarray(depth),
            "camera_pose_quats": jnp.asarray(quats),
            "camera_pose_trans": jnp.asarray(trans),
            "is_metric_scale": jnp.asarray(is_metric),
        }
        # all priors on, deterministic (infer-time knobs, model.py:1911-1954)
        geom = GeometricInputConfig()
        ours = japply(model, geom_cfg=geom)(params, views)
        _compare(ref, ours, self.KEYS)


class TestPairedTrunkLayout:
    """A checkpoint whose trunk uses VGGT-style frame_blocks/global_blocks
    pairs must convert to the identical param tree as its flat-interleaved
    equivalent (SURVEY §2.6 depth-counting ambiguity)."""

    def test_paired_equals_flat(self, mirror):
        sd = mirror.state_dict()
        paired = {}
        for k, v in sd.items():
            if k.startswith("info_sharing.blocks."):
                rest = k[len("info_sharing.blocks."):]
                i, tail = rest.split(".", 1)
                i = int(i)
                fam = "frame_blocks" if i % 2 == 0 else "global_blocks"
                paired[f"info_sharing.{fam}.{i // 2}.{tail}"] = v
            elif k.startswith("info_sharing.norm_intermediate."):
                paired[k] = v
            else:
                paired[k] = v

        flat_tree = convert_mapanything_checkpoint(sd, trunk_indices=INDICES)
        # Pair counting: tap at pair i is the output of that pair's global
        # layer (flat layer 2i+1). The mirror has two tap norms, so read them
        # as pair taps (0, 1) -> flat layers (1, 3).
        paired_tree = convert_mapanything_checkpoint(
            paired, trunk_indices=(0, 1)
        )
        assert "_unconverted" not in paired_tree

        flat_blocks = flat_tree["info_sharing"]
        paired_blocks = paired_tree["info_sharing"]
        for i in range(4):
            a = flat_blocks[f"layers_{i}"]["attn"]["qkv"]["kernel"]
            b = paired_blocks[f"layers_{i}"]["attn"]["qkv"]["kernel"]
            np.testing.assert_array_equal(a, b)
        assert "norm_intermediate_1" in paired_blocks
        assert "norm_intermediate_3" in paired_blocks


class TestFromPretrained:
    """from_pretrained local-checkpoint entry (reference HF quickstart,
    model.py:590-620)."""

    def test_safetensors_snapshot_dir(self, mirror, tmp_path):
        from safetensors.torch import save_file

        from mapanything_tpu.models.pretrained import from_pretrained

        # drop the dense_head.* Sequential aliases: safetensors refuses
        # shared tensors (HF hub checkpoints de-dup them the same way)
        sd = {k: v.contiguous() for k, v in mirror.state_dict().items()
              if not k.startswith("dense_head.")}
        snap = tmp_path / "hf_snapshot"
        snap.mkdir()
        save_file(sd, str(snap / "model.safetensors"))

        model, params = from_pretrained(
            str(snap), dtype=jnp.float32,
            config_overrides=dict(
                encoder_size="small", trunk_indices=INDICES,
                dpt_feature_dim=64,
            ),
        )
        assert model.cfg.trunk_depth == 4  # inferred from tensor shapes
        # the loaded params drive a forward pass
        x = np.random.default_rng(0).standard_normal(
            (1, 2, 28, 28, 3)).astype(np.float32) * 0.3
        out = japply(model, geom_cfg=images_only_config())(
            params, {"img": jnp.asarray(x)})
        assert np.isfinite(np.asarray(out["pts3d"])).all()

    def test_strict_rejects_unknown_keys(self, mirror, tmp_path):
        from safetensors.torch import save_file

        from mapanything_tpu.models.pretrained import from_pretrained

        sd = {k: v.contiguous() for k, v in mirror.state_dict().items()
              if not k.startswith("dense_head.")}
        sd["mystery.weight"] = torch.zeros(3)
        f = tmp_path / "bad.safetensors"
        save_file(sd, str(f))
        with pytest.raises(ValueError, match="no conversion rule"):
            from_pretrained(str(f), config_overrides=dict(
                encoder_size="small", trunk_indices=INDICES,
                dpt_feature_dim=64))


class TestEncoderFamilyConversion:
    """Full checkpoints whose encoder is croco or radio route to the right
    converter rules (weights.py family signature detection) — every key
    consumed, end-to-end output parity vs the torch mirror (round-2 VERDICT
    next-round item 6)."""

    B, V, H, W = 1, 2, 32, 48

    @pytest.mark.parametrize("family", ["croco", "radio"])
    def test_full_conversion_and_parity(self, family):
        from torch_mirror import MirrorMapAnything, randomize_state_dict

        mirror = MirrorMapAnything(
            trunk_dim=64, trunk_depth=4, trunk_heads=2, indices=INDICES,
            dpt_feature_dim=64, patch_size=16, encoder_family=family,
        )
        randomize_state_dict(mirror, seed=11)
        mirror.eval()

        sd = mirror.state_dict()
        tree = convert_mapanything_checkpoint(sd, trunk_indices=INDICES)
        assert "_unconverted" not in tree, (
            f"unconverted keys: {tree.get('_unconverted', [])[:10]}"
        )

        rng = np.random.default_rng(13)
        if family == "radio":
            # radio conditions internally; both sides take [0, 1] images
            x = rng.uniform(0, 1, (self.B, self.V, 3, self.H, self.W)
                            ).astype(np.float32)
        else:
            x = rng.standard_normal((self.B, self.V, 3, self.H, self.W)
                                    ).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = mirror(torch.from_numpy(x))

        cfg = MapAnythingConfig(
            encoder_type=family, encoder_size="test", patch_size=16,
            encoder_img_size=128,  # mirror pos_grid=8
            trunk_dim=64, trunk_depth=4, trunk_num_heads=2,
            trunk_indices=INDICES, dpt_feature_dim=64,
            dpt_out_channels=(48, 96, 192, 384), dpt_hidden_dims=(32, 16),
            dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        params = {"params": {k: v for k, v in tree.items()
                             if not k.startswith("_")}}
        views = {"img": jnp.asarray(x.transpose(0, 1, 3, 4, 2))}
        ours = japply(model, geom_cfg=images_only_config())(params, views)
        for k in ("pts3d", "ray_directions", "depth_along_ray", "cam_trans",
                  "cam_quats", "conf"):
            np.testing.assert_allclose(
                np.asarray(ours[k], dtype=np.float32), ref[k].numpy(),
                atol=2e-4, rtol=2e-3, err_msg=f"[{family}] '{k}' diverged",
            )
