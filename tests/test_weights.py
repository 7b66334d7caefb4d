"""Weight-conversion golden test: torch DINOv2 -> our DinoViT, output parity.

This is the checkpoint-compatibility acceptance test (SURVEY.md §7.1 step 3):
instantiate the reference's vendored DINOv2 (the exact torch-hub
architecture) with random weights, convert the state_dict, and require our
flax DinoViT to reproduce its patch tokens — including the bicubic
pos-embed interpolation path (input != 518)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mapanything_tpu.nn.dinov2 import DinoViT
from mapanything_tpu.utils.weights import (
    conv_transpose,
    convert_dinov2,
    inspect_state_dict,
    linear,
)


@pytest.fixture(scope="module")
def torch_vit():
    # stub parents whose __init__ needs missing deps (omegaconf)
    for pkg, path in [
        ("mapanything", "/root/reference/mapanything"),
        ("mapanything.models", "/root/reference/mapanything/models"),
        ("mapanything.models.external",
         "/root/reference/mapanything/models/external"),
    ]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m
    from mapanything.models.external.dinov2.models.vision_transformer import (
        vit_small,
    )

    m = vit_small(patch_size=14, init_values=1.0, img_size=518, block_chunks=0)
    m.eval()
    return m


class TestDinov2Conversion:
    @pytest.mark.parametrize("hw", [(56, 70), (84, 84)])
    def test_patch_token_parity(self, torch_vit, hw):
        h, w = hw
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 3, h, w)).astype(np.float32) * 0.5

        with torch.no_grad():
            ref = torch_vit.forward_features(torch.from_numpy(x))[
                "x_norm_patchtokens"
            ].numpy()

        params, used = convert_dinov2(torch_vit.state_dict())
        # every torch tensor except mask_token must be consumed
        assert used == len(torch_vit.state_dict()) - 1

        model = DinoViT(size="small", patch_size=14, dtype=jnp.float32)
        out = model.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        out = np.asarray(out).reshape(ref.shape)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_layout_primitives(self):
        w = torch.randn(8, 4)
        b = torch.randn(8)
        p = linear(w, b)
        x = torch.randn(2, 4)
        ref = (x @ w.T + b).numpy()
        ours = np.asarray(x) @ p["kernel"] + p["bias"]
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_conv_transpose_layout(self):
        import flax.linen as nn
        import torch.nn as tnn

        tconv = tnn.ConvTranspose2d(4, 6, kernel_size=2, stride=2)
        tconv.eval()
        x = torch.randn(1, 4, 5, 7)
        with torch.no_grad():
            ref = tconv(x).numpy().transpose(0, 2, 3, 1)

        p = conv_transpose(tconv.weight, tconv.bias)
        fconv = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
        out = fconv.apply(
            {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_inspect_state_dict(self, torch_vit):
        groups = inspect_state_dict(torch_vit.state_dict(), depth=1)
        assert "blocks" in groups and "pos_embed" in groups


class TestRadioConversion:
    @pytest.mark.parametrize("hw,regs", [((128, 128), 0), ((96, 160), 3)])
    def test_patch_token_parity(self, hw, regs):
        """RADIO hub checkpoint (mirror layout) converts and matches —
        including the bilinear CPE resample path (input grid != stored
        grid) and register tokens."""
        from mapanything_tpu.nn.radio import RadioViT
        from mapanything_tpu.utils.weights import convert_radio
        from torch_mirror import RadioMirror, randomize_state_dict

        h, w = hw
        tm = RadioMirror(dim=64, depth=2, num_heads=2, patch_size=16,
                         pos_grid=8, num_registers=regs)
        randomize_state_dict(tm, seed=7)
        tm.eval()

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        params, used = convert_radio(tm.state_dict())
        assert used == len(tm.state_dict())
        assert ("register_tokens" in params) == bool(regs)

        model = RadioViT(size="test", patch_size=16, img_size=128,
                         num_register_tokens=regs, dtype=jnp.float32)
        out = model.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = np.asarray(out).reshape(ref.shape)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


class TestRegistersVariant:
    def test_with_registers_parity(self):
        """DINOv2-with-registers (4 registers + antialiased pos-embed
        interpolation, hub backbones.py:127-128) converts and matches."""
        import sys as _sys
        import types as _types

        for pkg, path in [
            ("mapanything", "/root/reference/mapanything"),
            ("mapanything.models", "/root/reference/mapanything/models"),
            ("mapanything.models.external",
             "/root/reference/mapanything/models/external"),
        ]:
            if pkg not in _sys.modules:
                m = _types.ModuleType(pkg)
                m.__path__ = [path]
                _sys.modules[pkg] = m
        from mapanything.models.external.dinov2.models.vision_transformer import (
            vit_small,
        )

        tm = vit_small(patch_size=14, init_values=1.0, img_size=518,
                       block_chunks=0, num_register_tokens=4,
                       interpolate_antialias=True)
        tm.eval()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 3, 56, 84)).astype(np.float32) * 0.4
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(x))[
                "x_norm_patchtokens"
            ].numpy()
        params, used = convert_dinov2(tm.state_dict())
        assert "register_tokens" in params
        model = DinoViT(size="small", patch_size=14, num_register_tokens=4,
                        interpolate_antialias=True, dtype=jnp.float32)
        out = model.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = np.asarray(out).reshape(ref.shape)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


class TestLayerScaleFold:
    def test_folded_matches_unfolded(self, torch_vit):
        """fold_layerscale conversion (serving path): gamma folded into
        proj/fc2 must reproduce the torch output exactly like the unfolded
        path does."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 3, 56, 70)).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = torch_vit.forward_features(torch.from_numpy(x))[
                "x_norm_patchtokens"
            ].numpy()
        params, used = convert_dinov2(torch_vit.state_dict(),
                                      fold_layerscale=True)
        assert used == len(torch_vit.state_dict()) - 1
        assert "ls1" not in params["blocks_0"]
        model = DinoViT(size="small", patch_size=14, fold_layerscale=True,
                        dtype=jnp.float32)
        out = model.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).reshape(ref.shape), ref, atol=2e-4, rtol=1e-3
        )


class TestCrocoConversion:
    def test_patch_token_parity(self):
        """CroCo/DUSt3R-layout encoder state_dict converts and the JAX
        CroCoViT reproduces the torch mirror's patch tokens (the croco
        oracle the round-2 review noted as missing)."""
        from mapanything_tpu.nn.croco import CroCoViT
        from mapanything_tpu.utils.weights import convert_croco
        from torch_mirror import CrocoHubEncoder, randomize_state_dict

        tm = CrocoHubEncoder(dim=64, depth=2, num_heads=2, patch_size=16)
        randomize_state_dict(tm, seed=9)
        tm.eval()

        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 3, 96, 64)).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()  # (1, C, gh, gw)

        params, used = convert_croco(tm.state_dict())
        assert used == len(tm.state_dict())

        model = CroCoViT(size="test", patch_size=16, dtype=jnp.float32)
        out = model.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = np.asarray(out).transpose(0, 3, 1, 2)  # (1, C, gh, gw)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


class TestSafetensorsIO:
    """Pure-python safetensors reader/writer (utils/weights.py) validated
    against the official safetensors package in both directions — the HF
    checkpoint load path must work without torch or the pip package
    (reference model.py:87 ships safetensors on the hub)."""

    def _sample(self):
        rng = np.random.default_rng(0)
        return {
            "a.weight": rng.standard_normal((3, 5)).astype(np.float32),
            "a.bias": rng.standard_normal((5,)).astype(np.float16),
            "idx": np.arange(7, dtype=np.int64),
            "flag": np.array([True, False]),
        }

    def test_read_official_file(self, tmp_path):
        from safetensors.numpy import save_file

        from mapanything_tpu.utils.weights import read_safetensors

        tensors = self._sample()
        path = tmp_path / "x.safetensors"
        save_file(tensors, str(path))
        got = read_safetensors(str(path))
        assert set(got) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(got[k], tensors[k])

    def test_write_readable_by_official(self, tmp_path):
        from safetensors.numpy import load_file

        from mapanything_tpu.utils.weights import write_safetensors

        tensors = self._sample()
        path = tmp_path / "y.safetensors"
        write_safetensors(str(path), tensors)
        got = load_file(str(path))
        for k in tensors:
            np.testing.assert_array_equal(got[k], tensors[k])

    def test_bf16_roundtrip(self, tmp_path):
        """BF16 (the dtype HF serves the real checkpoints in) widens to the
        exact fp32 values — bf16 is fp32's upper 16 bits."""
        from mapanything_tpu.utils.weights import (read_safetensors,
                                                   write_safetensors)

        x32 = np.random.default_rng(1).standard_normal((17, 9)).astype(
            np.float32)
        xbf = torch.from_numpy(x32).bfloat16()
        path = tmp_path / "b.safetensors"
        from safetensors.torch import save_file

        save_file({"w": xbf}, str(path))
        got = read_safetensors(str(path))["w"]
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, xbf.float().numpy())

        # and our writer emits BF16 the official torch loader accepts
        from safetensors.torch import load_file as t_load

        import ml_dtypes

        write_safetensors(str(tmp_path / "c.safetensors"),
                          {"w": x32.astype(ml_dtypes.bfloat16)})
        back = t_load(str(tmp_path / "c.safetensors"))["w"]
        assert back.dtype == torch.bfloat16
        np.testing.assert_array_equal(back.float().numpy(),
                                      xbf.float().numpy())

    def test_sharded_snapshot_dir(self, tmp_path):
        """from_pretrained resolves model.safetensors.index.json shards
        (the layout HF uses for multi-GB checkpoints)."""
        import json

        from mapanything_tpu.utils.weights import write_safetensors

        snap = tmp_path / "snap"
        snap.mkdir()
        a = np.ones((2, 2), np.float32)
        b = np.full((3,), 2.0, np.float32)
        write_safetensors(str(snap / "model-00001-of-00002.safetensors"),
                          {"x": a})
        write_safetensors(str(snap / "model-00002-of-00002.safetensors"),
                          {"y": b})
        (snap / "model.safetensors.index.json").write_text(json.dumps({
            "weight_map": {"x": "model-00001-of-00002.safetensors",
                           "y": "model-00002-of-00002.safetensors"}}))
        # the loader merges shards before conversion; conversion itself
        # will reject these fake keys, which is exactly the strict error
        from mapanything_tpu.models.pretrained import from_pretrained

        with pytest.raises(ValueError, match="no conversion rule"):
            from_pretrained(str(snap))
