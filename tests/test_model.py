"""Model assembly + inference pipeline tests (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.models import (
    aug_training_config,
    GeometricInputConfig,
    images_only_config,
    jit_init,
    MapAnything,
    MapAnythingConfig,
)
from mapanything_tpu.utils.inference import (
    InferencePipeline,
    preprocess_input_views_for_inference,
    stack_views,
    validate_input_views_for_inference,
)

TINY = MapAnythingConfig(
    encoder_size="test",
    trunk_dim=64,
    trunk_depth=2,
    trunk_num_heads=2,
    trunk_indices=(0, 1),
    dpt_feature_dim=32,
    dpt_out_channels=(32, 32, 32, 32),
    dpt_hidden_dims=(16, 8),
    dense_head_chunk=2,
    # small enough that the ~12-token tiny forward actually exercises the
    # chunked-MLP memory path in the *_equivalence tests
    mlp_token_chunk=8,
    dtype=jnp.float32,
)

B, V, H, W = 1, 2, 28, 42


import functools


@functools.cache
def _japply(model, geom_cfg, memory_efficient=False):
    """One jitted apply per (config, flags): eager flax apply dispatches
    every op separately (~25 s per tiny forward on this 1-core box); the
    jitted program compiles once and lands in the persistent cache."""
    return jax.jit(functools.partial(
        model.apply, geom_cfg=geom_cfg, memory_efficient=memory_efficient))


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = MapAnything(cfg=TINY)
    views = _full_views()
    params = jit_init(model, jax.random.PRNGKey(0), views, GeometricInputConfig())
    return model, params


def _full_views():
    rng = np.random.default_rng(0)
    return {
        "img": jnp.asarray(rng.normal(size=(B, V, H, W, 3)).astype(np.float32)),
        "ray_directions_cam": jnp.ones((B, V, H, W, 3)) / jnp.sqrt(3.0),
        "depth_along_ray": jnp.ones((B, V, H, W, 1)) * 2.0,
        "camera_pose_quats": jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, V, 1)),
        "camera_pose_trans": jnp.zeros((B, V, 3)),
        "is_metric_scale": jnp.ones((B, V), dtype=bool),
    }


class TestForward:
    def test_output_contract(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        out = _japply(model, GeometricInputConfig())(params, _full_views())
        assert out["pts3d"].shape == (B, V, H, W, 3)
        assert out["pts3d_cam"].shape == (B, V, H, W, 3)
        assert out["ray_directions"].shape == (B, V, H, W, 3)
        assert out["depth_along_ray"].shape == (B, V, H, W, 1)
        assert out["cam_trans"].shape == (B, V, 3)
        assert out["cam_quats"].shape == (B, V, 4)
        assert out["metric_scaling_factor"].shape == (B,)
        assert out["conf"].shape == (B, V, H, W)
        assert out["non_ambiguous_mask"].dtype == bool
        # factored consistency: |pts3d_cam| == depth_along_ray, unit rays
        norm = jnp.linalg.norm(out["ray_directions"], axis=-1)
        np.testing.assert_allclose(np.asarray(norm), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out["pts3d_cam"], axis=-1, keepdims=True)),
            np.asarray(out["depth_along_ray"]),
            rtol=1e-4,
        )
        assert np.all(np.asarray(out["depth_along_ray"]) > 0)
        assert np.all(np.asarray(out["conf"]) >= 1.0)

    def test_images_only_matches_masked_priors(self, tiny_model_and_params):
        """Zeroed prior masks must reproduce the images-only output exactly
        (the fusion is purely additive + masked, model.py:816-823)."""
        model, params = tiny_model_and_params
        out_imgs = _japply(model, images_only_config())(
            params, {"img": _full_views()["img"]}
        )
        out_masked = _japply(model, images_only_config())(
            params, _full_views())
        np.testing.assert_allclose(
            np.asarray(out_imgs["pts3d"]), np.asarray(out_masked["pts3d"]),
            atol=1e-5,
        )

    def test_memory_efficient_equivalence(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        views = _full_views()
        a = _japply(model, GeometricInputConfig())(params, views)
        bdict = _japply(model, GeometricInputConfig(),
                        memory_efficient=True)(params, views)
        np.testing.assert_allclose(
            np.asarray(a["pts3d"]), np.asarray(bdict["pts3d"]), atol=1e-6
        )

    def test_memory_efficient_pads_non_divisible_counts(
            self, tiny_model_and_params):
        """B*V=3 with dense_head_chunk=2 must still chunk (padded to 4) and
        match the unchunked output — the non-divisible case previously fell
        through to the unchunked path silently."""
        model, params = tiny_model_and_params
        rng = np.random.default_rng(1)
        views = {"img": jnp.asarray(
            rng.normal(size=(B, 3, H, W, 3)).astype(np.float32))}
        a = _japply(model, images_only_config())(params, views)
        b = _japply(model, images_only_config(),
                    memory_efficient=True)(params, views)
        np.testing.assert_allclose(
            np.asarray(a["pts3d"]), np.asarray(b["pts3d"]), atol=1e-5
        )

    def test_heads_dtype_bf16_pose_tolerance(self, tiny_model_and_params):
        """heads_dtype='bfloat16' (the serving path's auto resolution) vs
        the fp32 island: pose outputs must stay within bf16-rounding
        tolerance of fp32 — the reference keeps all downstream heads in an
        autocast-off fp32 island (model.py:1599), so a silent pose-quality
        regression here is the risk ADVICE r4 flagged."""
        import dataclasses

        model, params = tiny_model_and_params
        views = _full_views()
        ref = _japply(model, GeometricInputConfig())(params, views)
        bf16_model = MapAnything(
            cfg=dataclasses.replace(TINY, heads_dtype="bfloat16"))
        out = _japply(bf16_model, GeometricInputConfig())(params, views)
        for key, tol in (("cam_trans", 2e-2), ("cam_quats", 2e-2),
                         ("depth_along_ray", 3e-2),
                         ("metric_scaling_factor", 2e-2)):
            a, b = np.asarray(ref[key]), np.asarray(out[key])
            scale = max(1.0, float(np.abs(a).max()))
            err = float(np.abs(a - b).max()) / scale
            assert err < tol, f"bf16 heads diverged on {key}: rel {err:.2e}"
        # quats must stay unit-normalized in bf16 too
        qn = np.linalg.norm(np.asarray(out["cam_quats"]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-2)

    def test_stochastic_requires_rng(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        with pytest.raises(ValueError, match="rng"):
            model.apply(params, _full_views(), aug_training_config())

    def test_stochastic_forward(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        out = jax.jit(functools.partial(
            model.apply, geom_cfg=aug_training_config()
        ))(params, _full_views(), rng=jax.random.PRNGKey(7))
        assert bool(jnp.isfinite(out["pts3d"]).all())


class TestValidation:
    def _mk_view(self, **extra):
        v = {
            "img": np.zeros((1, 3, H, W), np.float32),
            "data_norm_type": ["dinov2"],
        }
        v.update(extra)
        return v

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown keys"):
            validate_input_views_for_inference([self._mk_view(bogus=1)])

    def test_conflict_rejected(self):
        with pytest.raises(ValueError, match="cannot provide both"):
            validate_input_views_for_inference(
                [
                    self._mk_view(
                        intrinsics=np.eye(3, dtype=np.float32)[None],
                        ray_directions=np.zeros((1, H, W, 3), np.float32),
                    )
                ]
            )

    def test_depth_requires_calibration(self):
        with pytest.raises(ValueError, match="depth_z requires"):
            validate_input_views_for_inference(
                [self._mk_view(depth_z=np.ones((1, H, W, 1), np.float32))]
            )

    def test_pose_ref_rule(self):
        pose = np.eye(4, dtype=np.float32)[None]
        with pytest.raises(ValueError, match="view 0"):
            validate_input_views_for_inference(
                [self._mk_view(), self._mk_view(camera_poses=pose)]
            )

    def test_preprocess_intrinsics_to_rays(self):
        K = np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], np.float32)
        views = preprocess_input_views_for_inference(
            [self._mk_view(intrinsics=K, depth_z=np.ones((1, H, W, 1), np.float32))]
        )
        assert "ray_directions_cam" in views[0]
        assert "depth_along_ray" in views[0]
        assert "intrinsics" not in views[0]
        assert bool(views[0]["is_metric_scale"].all())
        rays = np.asarray(views[0]["ray_directions_cam"])
        np.testing.assert_allclose(
            np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5
        )
        # depth_along_ray >= depth_z for unit-sphere rays
        assert np.all(np.asarray(views[0]["depth_along_ray"]) >= 1.0 - 1e-6)

    def test_stack_views_partial_priors(self):
        K = np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], np.float32)
        views = preprocess_input_views_for_inference(
            [self._mk_view(intrinsics=K), self._mk_view()]
        )
        batched = stack_views(views)
        assert batched["img"].shape == (1, 2, H, W, 3)
        assert batched["ray_dirs_valid"].tolist() == [[True, False]]


class TestPipeline:
    def test_infer_end_to_end(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        pipe = InferencePipeline(model, params)
        rng = np.random.default_rng(1)
        K = np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], np.float32)
        views = [
            {
                "img": rng.normal(size=(1, 3, H, W)).astype(np.float32),
                "data_norm_type": ["dinov2"],
                "intrinsics": K,
            },
            {
                "img": rng.normal(size=(1, 3, H, W)).astype(np.float32),
                "data_norm_type": ["dinov2"],
            },
        ]
        preds = pipe.infer(views, apply_confidence_mask=True)
        assert len(preds) == 2
        p = preds[0]
        assert p["pts3d"].shape == (1, H, W, 3)
        assert p["depth_z"].shape == (1, H, W, 1)
        assert p["intrinsics"].shape == (1, 3, 3)
        assert p["camera_poses"].shape == (1, 4, 4)
        assert p["mask"].shape == (1, H, W, 1)
        assert p["img_no_norm"].shape == (1, H, W, 3)
        # masked pixels are zeroed in dense outputs
        masked = np.asarray(p["pts3d"])[~np.asarray(p["mask"][..., 0], bool)]
        if masked.size:
            np.testing.assert_array_equal(masked, 0)
        # second call with same shapes reuses the jitted fn
        preds2 = pipe.infer(views, apply_confidence_mask=True)
        assert len(pipe._jitted) == 1
        np.testing.assert_allclose(
            np.asarray(preds2[0]["pts3d"]), np.asarray(p["pts3d"]), atol=0
        )

    def test_chunked_postprocess_matches_unchunked(self, tiny_model_and_params):
        """view_chunk (the memory-efficient postprocess) is semantically
        exact: every step is per-view separable, incl. the per-view
        confidence quantile."""
        from mapanything_tpu.utils.inference import postprocess_outputs

        model, params = tiny_model_and_params
        rng = np.random.default_rng(3)
        b, v = 1, 4
        imgs = jnp.asarray(rng.normal(size=(b, v, H, W, 3)).astype(np.float32))
        preds = model.apply(params, {"img": imgs}, images_only_config())
        import functools

        kw = dict(apply_mask=True, mask_edges=True,
                  apply_confidence_mask=True)
        # jit both variants — eager postprocess dispatches its whole op
        # graph per call (InferencePipeline always jits this in production)
        ref = jax.jit(functools.partial(postprocess_outputs, **kw))(
            preds, imgs)
        # chunk=3 exercises the divisor fallback (->2) AND the chunked
        # path in one compile; chunk=2 would recompile the same graph
        for chunk in (3,):
            out = jax.jit(functools.partial(
                postprocess_outputs, view_chunk=chunk, **kw))(preds, imgs)
            assert set(out) == set(ref)
            for k in ref:
                # rtol: the intrinsics recovery reduces over pixels, and
                # chunking changes the fp32 accumulation order
                np.testing.assert_allclose(
                    np.asarray(ref[k]), np.asarray(out[k]),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"key {k} chunk {chunk}",
                )
