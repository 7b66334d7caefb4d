"""External-model adapter seam (round-1 VERDICT item 10).

Proves the reference's §2.9 wrapper contract in this framework: a second
model (ModularDUSt3R) runs through the dense N-view benchmark with ZERO
benchmark-code changes, and an RMVD-style adaptor drives a model through
the RobustMVD interface end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.data.synthetic import make_synthetic_batch
from mapanything_tpu.geometry import (
    quaternion_to_rotation_matrix,
    rigid_points_registration,
)
from mapanything_tpu.models import (
    jit_init,
    MapAnything,
    MapAnythingConfig,
    ModularDUSt3R,
    ModularDUSt3RConfig,
)
from mapanything_tpu.models.adapters import (
    FACTORED_PRED_KEYS,
    MapAnythingAdapter,
    ModularDUSt3RAdapter,
)


class TestRigidPointsRegistration:
    def test_recovers_known_transform(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r_true = np.asarray(
            quaternion_to_rotation_matrix(jnp.asarray(q, jnp.float32))
        )
        t_true = rng.normal(size=3).astype(np.float32)
        a = rng.normal(size=(2, 50, 3)).astype(np.float32)
        b = np.einsum("ij,bnj->bni", r_true, a) + t_true
        r, t = rigid_points_registration(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(r), np.tile(r_true, (2, 1, 1)),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.tile(t_true, (2, 1)),
                                   atol=1e-4)

    def test_with_scale_and_weights(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(40, 3)).astype(np.float32)
        b = 2.5 * a + np.asarray([1.0, -2.0, 0.5], np.float32)
        # corrupt some points; weight them to zero
        b_bad = b.copy()
        b_bad[:5] += 100.0
        w = np.ones(40, np.float32)
        w[:5] = 0.0
        r, t, s = rigid_points_registration(
            jnp.asarray(a), jnp.asarray(b_bad), weights=jnp.asarray(w),
            with_scale=True,
        )
        np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-4)


class _SyntheticLoader:
    """Minimal test loader with the dense_n_view duck type."""

    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


TINY_DUST3R = ModularDUSt3RConfig(
    encoder_size="test", patch_size=4, decoder_dim=64, decoder_depth=2,
    decoder_num_heads=2, dtype=jnp.float32,
)


class TestAdapterSeam:
    def test_dust3r_through_dense_n_view_benchmark(self, tmp_path):
        """A second model through the UNMODIFIED benchmark entry point."""
        from mapanything_tpu.benchmarks import run_dense_n_view_benchmark

        model = ModularDUSt3R(cfg=TINY_DUST3R)
        adapter = ModularDUSt3RAdapter(model)
        batch = make_synthetic_batch(2, 2, 16, 16, seed=3)
        params = jit_init(adapter, jax.random.PRNGKey(0), batch["views"])
        loader = _SyntheticLoader([
            jax.tree_util.tree_map(np.asarray, batch)
        ])
        out_json = str(tmp_path / "dust3r_bench.json")
        summary = run_dense_n_view_benchmark(
            adapter, params, loader, geom_cfg=None, output_json=out_json,
        )
        assert summary["num_sets"] == 2
        for key in ("pointmaps_abs_rel", "depth_abs_rel", "pose_ate_rmse"):
            assert np.isfinite(summary[key]), summary
        import json
        with open(out_json) as f:
            assert len(json.load(f)["per_set"]) == 2

    def test_adapter_output_contract(self):
        model = ModularDUSt3R(cfg=TINY_DUST3R)
        adapter = ModularDUSt3RAdapter(model)
        views = {"img": jnp.zeros((1, 2, 16, 16, 3))}
        params = jit_init(adapter, jax.random.PRNGKey(0), views)
        preds = adapter.apply(params, views)
        for key in FACTORED_PRED_KEYS:
            assert key in preds, f"missing factored key {key}"
        assert preds["pts3d"].shape == (1, 2, 16, 16, 3)
        assert preds["cam_quats"].shape == (1, 2, 4)
        # view 0 is the identity reference view
        np.testing.assert_allclose(
            np.asarray(preds["cam_quats"][:, 0]), [[0, 0, 0, 1]], atol=1e-6
        )

    def test_dust3r_pose_recovery_consistency(self):
        """With a stub model whose two runs ARE related by a known rigid
        transform, the adapter must recover that exact pose."""
        rng = np.random.default_rng(5)
        h = w = 8
        pts2_cam = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r_true = np.asarray(quaternion_to_rotation_matrix(
            jnp.asarray(q, jnp.float32)))
        t_true = rng.normal(size=3).astype(np.float32)
        pts2_in_v1 = np.einsum("ij,bhwj->bhwi", r_true, pts2_cam) + t_true
        pts1 = rng.normal(size=(1, h, w, 3)).astype(np.float32)

        class StubModel:
            calls = []

            def apply(self, params, views):
                # forward pair -> (pts1, pts2_in_v1); swapped -> pts2_cam 1st
                is_swapped = bool(StubModel.calls)
                StubModel.calls.append(1)
                if not is_swapped:
                    pts = np.stack([pts1[0], pts2_in_v1[0]])[None]
                else:
                    pts = np.stack([pts2_cam[0], pts1[0]])[None]
                return {
                    "pts3d": jnp.asarray(pts),
                    "conf": jnp.ones((1, 2, h, w)),
                }

        adapter = ModularDUSt3RAdapter(StubModel())
        preds = adapter.apply({}, {"img": jnp.zeros((1, 2, h, w, 3))})
        r_rec = np.asarray(
            quaternion_to_rotation_matrix(preds["cam_quats"][:, 1])
        )[0]
        np.testing.assert_allclose(r_rec, r_true, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(preds["cam_trans"][0, 1]), t_true, atol=1e-4
        )


class TestRMVDAdaptor:
    @pytest.mark.slow
    def test_end_to_end_depth_eval(self):
        from mapanything_tpu.benchmarks.rmvd import (
            RMVDAdaptor,
            evaluate_mvs_depth,
        )

        cfg = MapAnythingConfig(
            encoder_size="test", patch_size=14, trunk_dim=64, trunk_depth=2,
            trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        h = w = 28
        rng = np.random.default_rng(7)
        # init with the conditioning inputs present so the prior-encoder
        # branches get parameters
        init_views = {
            "img": jnp.zeros((1, 2, h, w, 3)),
            "ray_directions_cam": jnp.zeros((1, 2, h, w, 3)),
        }
        params = jit_init(model, jax.random.PRNGKey(0), init_views)

        adaptor = RMVDAdaptor(model, params,
                              inference_conditioning="image+intrinsics")
        k = np.asarray(
            [[[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]]], np.float32
        )
        images = [
            (rng.uniform(size=(1, 3, h, w)) * 255).astype(np.float32)
            for _ in range(2)
        ]
        sample = {
            "images": images,
            "keyview_idx": 1,  # non-zero: adaptor must reorder
            "intrinsics": [k, k],
            "gt_depth": 1.0 + rng.uniform(size=(h, w)).astype(np.float32),
        }
        metrics = evaluate_mvs_depth(adaptor, [sample])
        assert metrics["num_samples"] == 1
        assert np.isfinite(metrics["depth_abs_rel"])
        assert 0.0 <= metrics["depth_inlier_103"] <= 1.0

    def test_conditioning_modes(self):
        from mapanything_tpu.benchmarks.rmvd import RMVDAdaptor

        cfg = MapAnythingConfig(
            encoder_size="test", trunk_dim=64, trunk_depth=2,
            trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.zeros((1, 2, 28, 28, 3))}
        params = jit_init(model, jax.random.PRNGKey(0), views)
        a = RMVDAdaptor(model, params,
                        inference_conditioning="image+intrinsics+pose")
        k = np.asarray(
            [[[30.0, 0, 14.0], [0, 30.0, 14.0], [0, 0, 1]]], np.float32
        )
        pose = np.eye(4, dtype=np.float32)[None]
        v = a.input_adapter(
            [np.zeros((1, 3, 28, 28), np.float32)] * 2,
            keyview_idx=0, poses=[pose, pose], intrinsics=[k, k],
        )
        assert "ray_directions_cam" in v and "camera_pose_quats" in v
        with pytest.raises(ValueError):
            RMVDAdaptor(model, params, inference_conditioning="lidar")


class TestCalibrationBenchmark:
    """Calibration harness (benchmarks/calibration.py) with controlled
    prediction errors."""

    def test_zero_and_known_error(self, tmp_path):
        import flax.linen as nn

        from mapanything_tpu.benchmarks.calibration import (
            ray_angular_error_deg,
            run_calibration_benchmark,
        )
        from mapanything_tpu.data.synthetic import make_synthetic_batch

        batch = make_synthetic_batch(2, 2, 14, 14, seed=9)
        gt = batch["gt"]["ray_directions_cam"]

        # exact prediction -> 0 deg
        err0 = np.asarray(ray_angular_error_deg(gt, gt))
        assert float(err0.max()) < 1e-3

        # rotate every ray by exactly 5 degrees about x
        th = np.deg2rad(5.0)
        rot = jnp.asarray([
            [1, 0, 0],
            [0, np.cos(th), -np.sin(th)],
            [0, np.sin(th), np.cos(th)],
        ], dtype=jnp.float32)
        rot_rays = jnp.einsum("ij,...j->...i", rot, gt)
        err5 = np.asarray(ray_angular_error_deg(rot_rays, gt))
        # rays with a component along the rotation axis move by < 5 deg,
        # so the image mean sits just below the rotation angle
        assert np.all((err5 > 4.0) & (err5 <= 5.001)), err5

        # end-to-end through the harness with a stub model
        class StubModel(nn.Module):
            @nn.compact
            def __call__(self, views, geom_cfg):
                b, v, h, w, _ = views["img"].shape
                rays = jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 1.0]), (b, v, h, w, 3)
                )
                return {"ray_directions": rays}

        class OneBatchLoader:
            def set_epoch(self, e):
                pass

            def __iter__(self):
                gt_np = {k: np.asarray(v) for k, v in batch["gt"].items()}
                views_np = {k: np.asarray(v)
                            for k, v in batch["views"].items()}
                return iter([{"views": views_np, "gt": gt_np}])

        model = StubModel()
        out_json = tmp_path / "calib.json"
        summary = run_calibration_benchmark(
            model, {}, OneBatchLoader(), None, output_json=str(out_json)
        )
        assert summary["num_images"] == 2
        assert np.isfinite(summary["ray_angular_error_deg_mean"])
        assert out_json.exists()


class TestVGGTAdapter:
    """A REAL external torch model (the reference's vendored VGGT) through
    the factored contract and the dense N-view benchmark, zero benchmark
    changes (reference external wrapper role, §2.9)."""

    @pytest.fixture(scope="class")
    def tiny_vggt(self):
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
        import torch
        import torch.nn as nn

        from mapanything.models.external.vggt.heads.camera_head import (
            CameraHead,
        )
        from mapanything.models.external.vggt.heads.dpt_head import DPTHead
        from mapanything.models.external.vggt.models.aggregator import (
            Aggregator,
        )
        from mapanything.models.external.vggt.models.vggt import VGGT

        torch.manual_seed(0)
        # VGGT.__init__ hardcodes the DINOv2 hub patch embed (needs network);
        # assemble the same structure with the conv patch embed instead
        # (aggregator.py:174-180 "conv" arm) at tiny dims.
        m = VGGT.__new__(VGGT)
        nn.Module.__init__(m)
        m.aggregator = Aggregator(
            img_size=56, patch_size=14, embed_dim=64, depth=4, num_heads=2,
            patch_embed="conv",
        )
        # the vendored conv PatchEmbed lacks the forward_features alias
        # the aggregator calls (aggregator.py:253) — alias it
        m.aggregator.patch_embed.forward_features = (
            m.aggregator.patch_embed.forward
        )
        m.camera_head = CameraHead(dim_in=128)
        m.depth_head = DPTHead(
            dim_in=128, output_dim=2, activation="exp",
            conf_activation="expp1", intermediate_layer_idx=[0, 1, 2, 3],
        )
        m.eval()
        return m

    def test_contract_and_benchmark(self, tiny_vggt, tmp_path):
        from mapanything_tpu.benchmarks.dense_n_view import (
            run_dense_n_view_benchmark,
        )
        from mapanything_tpu.data.synthetic import make_synthetic_batch
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            VGGTAdapter,
        )

        adapter = VGGTAdapter(tiny_vggt)
        batch = make_synthetic_batch(1, 2, 56, 56, seed=4)
        preds = adapter.apply({}, batch["views"])
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        assert preds["pts3d"].shape == (1, 2, 56, 56, 3)
        assert np.isfinite(np.asarray(preds["pts3d"])).all()
        # unit rays
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(preds["ray_directions"], axis=-1)),
            1.0, atol=1e-4,
        )
        # factored consistency
        np.testing.assert_allclose(
            np.asarray(preds["ray_directions"] * preds["depth_along_ray"]),
            np.asarray(preds["pts3d_cam"]), rtol=1e-3, atol=1e-4,
        )

        # through the benchmark unchanged
        class OneBatchLoader:
            def set_epoch(self, e):
                pass

            def __len__(self):
                return 1

            def __iter__(self):
                return iter([{
                    "views": {k: np.asarray(v)
                              for k, v in batch["views"].items()},
                    "gt": {k: np.asarray(v)
                           for k, v in batch["gt"].items()},
                }])

        out = run_dense_n_view_benchmark(
            adapter, {}, OneBatchLoader(), None,
            output_json=str(tmp_path / "vggt.json"),
        )
        assert np.isfinite(out["pointmaps_abs_rel"])


def _install_reference_pkg():
    """Make the reference's vendored external models importable as the
    `mapanything.models.external.*` packages they expect (test-only oracle
    import, same pattern as TestVGGTAdapter)."""
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


class _OneBatchLoader:
    """Single synthetic batch through the dense N-view benchmark."""

    def __init__(self, batch):
        self.batch = batch

    def set_epoch(self, e):
        pass

    def __len__(self):
        return 1

    def __iter__(self):
        return iter([{
            "views": {k: np.asarray(v) for k, v in self.batch["views"].items()},
            "gt": {k: np.asarray(v) for k, v in self.batch["gt"].items()},
        }])


def _rmvd_samples_from_batch(batch, n=1):
    """Convert a synthetic batch into RMVD-style evaluation samples."""
    imgs = np.asarray(batch["views"]["img"])  # (B,V,H,W,3) normalized
    from mapanything_tpu.nn.dinov2 import IMAGE_NORMALIZATION_DICT
    mean, std = IMAGE_NORMALIZATION_DICT["dinov2"]
    imgs01 = np.clip(imgs * np.asarray(std, np.float32)
                     + np.asarray(mean, np.float32), 0, 1)
    gt_z = np.asarray(batch["gt"]["pts3d_cam"][..., 2])  # (B,V,H,W)
    samples = []
    for b in range(min(n, imgs01.shape[0])):
        samples.append({
            "images": [imgs01[b, v].transpose(2, 0, 1)[None]
                       for v in range(imgs01.shape[1])],
            "keyview_idx": 0,
            "gt_depth": gt_z[b, 0],
        })
    return samples


class TestPi3Adapter:
    """The reference's vendored Pi3 (torch) through the factored contract,
    the dense N-view benchmark AND the RMVD MVS-depth evaluation — zero
    benchmark-code changes (reference external wrapper role, §2.9,
    models/external/pi3/__init__.py)."""

    @pytest.fixture(scope="class")
    def tiny_pi3(self):
        _install_reference_pkg()
        from copy import deepcopy
        from functools import partial

        import torch
        import torch.nn as nn

        from mapanything.models.external.dinov2.layers import Mlp
        from mapanything.models.external.dinov2.models.vision_transformer import (
            DinoVisionTransformer,
        )
        from mapanything.models.external.pi3.layers.attention import (
            FlashAttentionRope,
        )
        from mapanything.models.external.pi3.layers.block import BlockRope
        from mapanything.models.external.pi3.layers.camera_head import (
            CameraHead,
        )
        from mapanything.models.external.pi3.layers.pos_embed import (
            PositionGetter,
            RoPE2D,
        )
        from mapanything.models.external.pi3.layers.transformer_head import (
            LinearPts3d,
            TransformerDecoder,
        )
        from mapanything.models.external.pi3.models.pi3 import Pi3

        torch.manual_seed(0)
        dim = 64
        # Pi3.__init__ hardcodes the DINOv2-L/14 encoder (pi3.py:38); build
        # the same structure at tiny dims instead (same pattern as the
        # tiny_vggt fixture).
        m = Pi3.__new__(Pi3)
        nn.Module.__init__(m)
        m.encoder = DinoVisionTransformer(
            img_size=518, patch_size=14, embed_dim=dim, depth=2, num_heads=2,
            init_values=1.0, block_chunks=0, num_register_tokens=4,
        )
        del m.encoder.mask_token
        m.patch_size = 14
        m.pos_type = "rope100"
        m.rope = RoPE2D(freq=100.0)
        m.position_getter = PositionGetter()
        m.decoder = nn.ModuleList([
            BlockRope(
                dim=dim, num_heads=2, mlp_ratio=4, qkv_bias=True,
                proj_bias=True, ffn_bias=True, drop_path=0.0,
                norm_layer=partial(nn.LayerNorm, eps=1e-6),
                act_layer=nn.GELU, ffn_layer=Mlp, init_values=0.01,
                qk_norm=True, attn_class=FlashAttentionRope, rope=m.rope,
            )
            for _ in range(2)
        ])
        m.dec_embed_dim = dim
        m.patch_start_idx = 5
        m.register_token = nn.Parameter(torch.randn(1, 1, 5, dim) * 1e-6)
        m.point_decoder = TransformerDecoder(
            in_dim=2 * dim, dec_embed_dim=dim, dec_num_heads=2, out_dim=dim,
            depth=1, rope=m.rope,
        )
        m.point_head = LinearPts3d(patch_size=14, dec_embed_dim=dim,
                                   output_dim=3)
        m.conf_decoder = deepcopy(m.point_decoder)
        m.conf_head = LinearPts3d(patch_size=14, dec_embed_dim=dim,
                                  output_dim=1)
        m.camera_decoder = TransformerDecoder(
            in_dim=2 * dim, dec_embed_dim=dim, dec_num_heads=2, out_dim=32,
            depth=1, rope=m.rope,
        )
        m.camera_head = CameraHead(dim=32)
        m.register_buffer(
            "image_mean",
            torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1),
        )
        m.register_buffer(
            "image_std",
            torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1),
        )
        m.eval()
        return m

    def test_contract_and_benchmarks(self, tiny_pi3, tmp_path):
        from mapanything_tpu.benchmarks.dense_n_view import (
            run_dense_n_view_benchmark,
        )
        from mapanything_tpu.benchmarks.rmvd import (
            RMVDAdaptor,
            evaluate_mvs_depth,
        )
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            Pi3Adapter,
        )

        adapter = Pi3Adapter(tiny_pi3)
        batch = make_synthetic_batch(1, 2, 56, 56, seed=5)
        preds = adapter.apply({}, batch["views"])
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        assert preds["pts3d"].shape == (1, 2, 56, 56, 3)
        assert np.isfinite(np.asarray(preds["pts3d"])).all()
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(preds["ray_directions"], axis=-1)),
            1.0, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(preds["ray_directions"] * preds["depth_along_ray"]),
            np.asarray(preds["pts3d_cam"]), rtol=1e-3, atol=1e-4,
        )
        # cam2world quats are unit
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(preds["cam_quats"], axis=-1)),
            1.0, atol=1e-4,
        )

        # dense N-view benchmark, unchanged
        out = run_dense_n_view_benchmark(
            adapter, {}, _OneBatchLoader(batch), None,
            output_json=str(tmp_path / "pi3.json"),
        )
        assert np.isfinite(out["pointmaps_abs_rel"])

        # RMVD MVS-depth evaluation, unchanged
        rmvd = RMVDAdaptor(adapter, {}, inference_conditioning="image")
        metrics = evaluate_mvs_depth(rmvd, _rmvd_samples_from_batch(batch))
        assert metrics["num_samples"] == 1
        assert np.isfinite(metrics["depth_abs_rel"])


class TestMoGeAdapter:
    """The reference's vendored MoGe-2 (torch, monocular) through the
    factored contract, the dense N-view benchmark AND the RMVD MVS-depth
    evaluation (reference models/external/moge/__init__.py)."""

    @pytest.fixture(scope="class")
    def tiny_moge2(self):
        _install_reference_pkg()
        import torch

        import mapanything.models.external.dinov2.hub.backbones as hub
        from mapanything.models.external.dinov2.models.vision_transformer import (
            DinoVisionTransformer,
        )
        from mapanything.models.external.moge.models.v2 import MoGeModel

        torch.manual_seed(0)

        # MoGe's DINOv2Encoder resolves its backbone by name from the hub
        # module (modules.py:130-137); register a tiny one for the test.
        def dinov2_test14(*, pretrained=False, **kw):
            return DinoVisionTransformer(
                img_size=518, patch_size=14, embed_dim=32, depth=2,
                num_heads=2, init_values=1.0, block_chunks=0,
            )

        hub.dinov2_test14 = dinov2_test14

        d = 32  # GroupNorm in ConvStack needs channels//32 >= 1
        m = MoGeModel(
            encoder=dict(backbone="dinov2_test14", intermediate_layers=1,
                         dim_out=d),
            neck=dict(
                dim_in=[d + 2, 2, 2, 2, 2],
                dim_res_blocks=[d, d, d, d, d],
                dim_out=[d, d, d, d, d],
                resamplers=["bilinear"] * 4,
            ),
            points_head=dict(
                dim_in=[d, d, d, d, d],
                dim_res_blocks=[d, d, d, d, d],
                dim_out=[None, None, None, None, 3],
                resamplers=["bilinear"] * 4,
            ),
            mask_head=dict(
                dim_in=[d, d, d, d, d],
                dim_res_blocks=[d, d, d, d, d],
                dim_out=[None, None, None, None, 1],
                resamplers=["bilinear"] * 4,
            ),
            scale_head=dict(dims=[32, 16, 1]),
            remap_output="linear",
        )
        m.eval()
        return m

    def test_contract_and_benchmarks(self, tiny_moge2, tmp_path):
        from mapanything_tpu.benchmarks.dense_n_view import (
            run_dense_n_view_benchmark,
        )
        from mapanything_tpu.benchmarks.rmvd import (
            RMVDAdaptor,
            evaluate_mvs_depth,
        )
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            MoGeAdapter,
        )

        adapter = MoGeAdapter(tiny_moge2)
        batch = make_synthetic_batch(1, 2, 56, 56, seed=6)
        preds = adapter.apply({}, batch["views"])
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        assert preds["pts3d"].shape == (1, 2, 56, 56, 3)
        assert np.isfinite(np.asarray(preds["pts3d"])).all()
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(preds["ray_directions"], axis=-1)),
            1.0, atol=1e-4,
        )
        # monocular: camera-frame == world-frame, identity pose
        np.testing.assert_allclose(
            np.asarray(preds["pts3d"]), np.asarray(preds["pts3d_cam"]),
        )

        out = run_dense_n_view_benchmark(
            adapter, {}, _OneBatchLoader(batch), None,
            output_json=str(tmp_path / "moge.json"),
        )
        assert np.isfinite(out["pointmaps_abs_rel"])

        rmvd = RMVDAdaptor(adapter, {}, inference_conditioning="image",
                           evaluate_single_view=True)
        metrics = evaluate_mvs_depth(rmvd, _rmvd_samples_from_batch(batch))
        assert metrics["num_samples"] == 1
        assert np.isfinite(metrics["depth_abs_rel"])


def _gt_scene_arrays(batch):
    """GT (K, c2w, depth_z) numpy triple from a synthetic batch."""
    from mapanything_tpu.geometry import pose_quats_trans_to_matrix

    gt = batch["gt"]
    depth_z = np.asarray(gt["pts3d_cam"])[..., 2]
    b, v, h, w = depth_z.shape
    f = 0.8 * max(h, w)  # data/synthetic.py intrinsics
    K = np.zeros((b, v, 3, 3), np.float32)
    K[..., 0, 0] = f
    K[..., 1, 1] = f
    K[..., 0, 2] = w / 2
    K[..., 1, 2] = h / 2
    K[..., 2, 2] = 1
    c2w = np.asarray(pose_quats_trans_to_matrix(
        jnp.asarray(gt["camera_pose_quats"]),
        jnp.asarray(gt["camera_pose_trans"]),
    ))
    return K, c2w, depth_z


class TestPosedDepthAdapters:
    """DUSt3R-global-aligner / MASt3R-sparse-GA seam: both end in a
    (K, cam2world, z-depth) scene triple (reference dust3r/__init__.py:
    166-169, mast3r/__init__.py:141-144); the adapter owns the shared
    factored-key conversion. A geometry-consistent fake `scene_fn` stands
    in for the pip pipelines (absent from this env), so the conversion is
    validated against synthetic GT exactly."""

    def test_conversion_matches_gt(self):
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            DUSt3RAdapter,
        )

        batch = make_synthetic_batch(1, 3, 28, 42, seed=7)
        K, c2w, depth_z = _gt_scene_arrays(batch)

        calls = {}

        def fake_scene_fn(imgs01):
            calls["shape"] = imgs01.shape
            assert imgs01.min() >= 0.0 and imgs01.max() <= 1.0
            return K, c2w, depth_z

        adapter = DUSt3RAdapter(fake_scene_fn)
        preds = adapter.apply({}, batch["views"])
        assert calls["shape"] == (1, 3, 28, 42, 3)
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        # the factored conversion must reproduce the GT scene exactly
        np.testing.assert_allclose(
            np.asarray(preds["pts3d"]), np.asarray(batch["gt"]["pts3d"]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(preds["pts3d_cam"]),
            np.asarray(batch["gt"]["pts3d_cam"]), rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(preds["cam_trans"]),
            np.asarray(batch["gt"]["camera_pose_trans"]), atol=1e-4,
        )

    def test_through_dense_n_view_benchmark(self, tmp_path):
        from mapanything_tpu.benchmarks.dense_n_view import (
            run_dense_n_view_benchmark,
        )
        from mapanything_tpu.models.adapters import MASt3RAdapter

        batch = make_synthetic_batch(1, 2, 28, 42, seed=8)
        K, c2w, depth_z = _gt_scene_arrays(batch)
        adapter = MASt3RAdapter(lambda imgs01: (K, c2w, depth_z))
        out = run_dense_n_view_benchmark(
            adapter, {}, _OneBatchLoader(batch), None,
            output_json=str(tmp_path / "mast3r.json"),
        )
        # GT-consistent fake -> near-zero benchmark error proves the
        # adapter-side math, not the (absent) external network
        assert out["pointmaps_abs_rel"] < 1e-2


class TestMUSt3RAdapter:
    """MUSt3R streaming-wrapper seam (reference must3r/__init__.py:250-288):
    per-view {pts3d, pts3d_local, conf, c2w} -> the factored contract."""

    def test_conversion_and_benchmark(self, tmp_path):
        from mapanything_tpu.benchmarks.dense_n_view import (
            run_dense_n_view_benchmark,
        )
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            MUSt3RAdapter,
        )

        batch = make_synthetic_batch(1, 3, 28, 42, seed=9)
        gt = batch["gt"]

        def fake_scene_fn(imgs01):
            b, v, h, w, _ = imgs01.shape
            from mapanything_tpu.geometry import pose_quats_trans_to_matrix
            c2w = np.asarray(pose_quats_trans_to_matrix(
                jnp.asarray(gt["camera_pose_quats"]),
                jnp.asarray(gt["camera_pose_trans"])))
            return [{
                "pts3d": np.asarray(gt["pts3d"])[:, i],
                "pts3d_local": np.asarray(gt["pts3d_cam"])[:, i],
                "conf": np.ones((b, h, w), np.float32),
                "c2w": c2w[:, i],
            } for i in range(v)]

        adapter = MUSt3RAdapter(fake_scene_fn)
        preds = adapter.apply({}, batch["views"])
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        np.testing.assert_allclose(
            np.asarray(preds["depth_along_ray"]),
            np.asarray(gt["depth_along_ray"]), rtol=1e-4, atol=1e-5,
        )
        out = run_dense_n_view_benchmark(
            adapter, {}, _OneBatchLoader(batch), None,
            output_json=str(tmp_path / "must3r.json"),
        )
        assert out["pointmaps_abs_rel"] < 1e-2


class TestPow3RAdapter:
    """Pow3R prior-conditioned 2-view seam (reference pow3r/__init__.py:
    426-578): gated priors in, Umeyama pose+scale recovery out."""

    def _make(self, seed=10, scale=0.5):
        from mapanything_tpu.geometry import (
            closed_form_pose_inverse,
            pose_quats_trans_to_matrix,
        )

        batch = make_synthetic_batch(1, 2, 28, 42, seed=seed)
        gt = batch["gt"]
        c2w = np.asarray(pose_quats_trans_to_matrix(
            jnp.asarray(gt["camera_pose_quats"]),
            jnp.asarray(gt["camera_pose_trans"])))
        w2c0 = np.asarray(closed_form_pose_inverse(jnp.asarray(c2w[:, 0])))
        pts_w = np.asarray(gt["pts3d"])

        def to_v0(p):  # world -> view-0 frame (Pow3R's world frame)
            return np.einsum("bij,bhwj->bhwi", w2c0[:, :3, :3], p) \
                + w2c0[:, None, None, :3, 3]

        seen = {}

        def fake_pair_fn(view1, view2):
            seen["v1"] = set(view1)
            seen["v2"] = set(view2)
            if "camera_intrinsics" in view1:
                seen["K"] = view1["camera_intrinsics"]
            if "depthmap" in view1:
                seen["depth"] = view1["depthmap"]
            b, h, w, _ = view1["img"].shape
            pred1 = {"pts3d": to_v0(pts_w[:, 0]),
                     "conf": np.ones((b, h, w), np.float32)}
            # the net predicts view2's own-frame points at a WRONG scale;
            # the adapter's Umeyama must recover and undo it
            pred2 = {"pts3d_in_other_view": to_v0(pts_w[:, 1]),
                     "pts3d2": scale * np.asarray(gt["pts3d_cam"])[:, 1],
                     "conf": np.ones((b, h, w), np.float32),
                     "conf2": np.ones((b, h, w), np.float32)}
            return pred1, pred2

        return batch, fake_pair_fn, seen, c2w, w2c0

    def test_priors_gated_and_scale_recovered(self):
        from mapanything_tpu.models import GeometricInputConfig
        from mapanything_tpu.models.adapters import (
            FACTORED_PRED_KEYS,
            Pow3RAdapter,
        )

        batch, fake_pair_fn, seen, c2w, w2c0 = self._make()
        adapter = Pow3RAdapter(
            fake_pair_fn, geom_cfg=GeometricInputConfig(
                overall_prob=1.0, ray_dirs_prob=1.0, depth_prob=1.0,
                cam_prob=1.0,
            ),
        )
        preds = adapter.apply({}, batch["views"])
        for k in FACTORED_PRED_KEYS:
            assert k in preds, k
        # all three priors reached the host model (probabilities = 1)
        assert {"camera_intrinsics", "depthmap", "camera_pose"} <= seen["v1"]
        f = 0.8 * 42
        np.testing.assert_allclose(seen["K"][:, 0, 0], f, rtol=5e-2)
        np.testing.assert_allclose(
            seen["depth"][..., 0],
            np.asarray(batch["gt"]["pts3d_cam"])[:, 0, ..., 2],
            rtol=1e-3, atol=1e-4,
        )
        # scale-corrupted own-frame points recovered to the GT scene
        np.testing.assert_allclose(
            np.asarray(preds["pts3d"][:, 1]),
            np.einsum("bij,bhwj->bhwi", w2c0[:, :3, :3],
                      np.asarray(batch["gt"]["pts3d"])[:, 1])
            + w2c0[:, None, None, :3, 3],
            rtol=5e-3, atol=5e-3,
        )
        # recovered relative pose == c2w of view1 in view-0 frame
        rel = np.asarray(w2c0 @ c2w[:, 1])
        np.testing.assert_allclose(
            np.asarray(preds["cam_trans"][:, 1]), rel[:, :3, 3], atol=1e-3,
        )

    def test_priors_off_sends_images_only(self):
        from mapanything_tpu.models import GeometricInputConfig
        from mapanything_tpu.models.adapters import Pow3RAdapter

        batch, fake_pair_fn, seen, _, _ = self._make(seed=11)
        adapter = Pow3RAdapter(
            fake_pair_fn, geom_cfg=GeometricInputConfig(overall_prob=0.0),
        )
        adapter.apply({}, batch["views"])
        assert seen["v1"] == {"img"} and seen["v2"] == {"img"}


class TestAnyCalibAdapter:
    """AnyCalib monocular-calibration seam (reference anycalib/__init__.py:
    16-100) through the UNMODIFIED calibration benchmark."""

    def test_rays_and_benchmark(self, tmp_path):
        from mapanything_tpu.benchmarks.calibration import (
            run_calibration_benchmark,
        )
        from mapanything_tpu.models.adapters import AnyCalibAdapter

        batch = make_synthetic_batch(2, 2, 28, 42, seed=12)
        f = 0.8 * 42

        def fake_calib_fn(imgs01):
            b = imgs01.shape[0]
            return np.tile(np.asarray([f, f, 21.0, 14.0], np.float32),
                           (b, 1))

        adapter = AnyCalibAdapter(fake_calib_fn)
        preds = adapter.apply({}, batch["views"])
        np.testing.assert_allclose(
            np.asarray(preds["ray_directions"]),
            np.asarray(batch["gt"]["ray_directions_cam"][:, :1]),
            rtol=1e-4, atol=1e-5,
        )

        class OneBatchLoader:
            def set_epoch(self, e):
                pass

            def __iter__(self):
                return iter([{
                    "views": {k: np.asarray(v)
                              for k, v in batch["views"].items()},
                    "gt": {k: np.asarray(v) for k, v in batch["gt"].items()},
                }])

        summary = run_calibration_benchmark(
            adapter, {}, OneBatchLoader(), None,
            output_json=str(tmp_path / "anycalib.json"),
        )
        assert summary["num_images"] == 2
        # GT-exact fake -> ~zero angular error proves the adapter math
        assert summary["ray_angular_error_deg_mean"] < 1e-2
