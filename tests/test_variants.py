"""Model-variant tests: ablations (no scale token, RoPE), ModularDUSt3R,
global-attention trunk, cross-attention decoder blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.models import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    ModularDUSt3R,
    ModularDUSt3RConfig,
    mapanything_ablations_config,
)

B, V, H, W = 1, 2, 28, 42


def tiny_overrides():
    return dict(encoder_size="small", trunk_dim=384, trunk_depth=4,
                trunk_num_heads=6, trunk_indices=(1, 2), dpt_feature_dim=32,
                dtype=jnp.float32)


class TestAblations:
    def test_no_scale_token_rope(self):
        cfg = mapanything_ablations_config(**tiny_overrides())
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((B, V, H, W, 3))}
        from mapanything_tpu.models import images_only_config

        params = model.init(jax.random.PRNGKey(0), views, images_only_config())
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = ["/".join(str(k) for k in kp) for kp, _ in flat]
        assert not any("scale_token" in n or "scale_head" in n for n in names)
        out = model.apply(params, views, images_only_config())
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

        p1 = base.init(jax.random.PRNGKey(0), views, images_only_config())
        o1 = base.apply(p1, views, images_only_config())
        o2 = roped.apply(p1, views, images_only_config())  # same params
        assert float(jnp.abs(o1["depth_along_ray"] - o2["depth_along_ray"]).max()) > 1e-6


class TestModularDUSt3R:
    def test_forward_contract(self):
        cfg = ModularDUSt3RConfig(encoder_size="base", decoder_dim=192,
                                  decoder_depth=2, decoder_num_heads=6,
                                  dtype=jnp.float32)
        # shrink the encoder via config table override is not possible;
        # use base encoder at tiny resolution instead
        model = ModularDUSt3R(cfg=cfg)
        views = {"img": jnp.ones((1, 2, 32, 32, 3)) * 0.1}
        params = model.init(jax.random.PRNGKey(0), views)
        out = model.apply(params, views)
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
        params = trunk.init(jax.random.PRNGKey(0), feats, tok)
        final, inters, tok_out = trunk.apply(params, feats, tok)
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
            encoder_type="croco", encoder_size="base", patch_size=16,
            trunk_dim=192, trunk_depth=2, trunk_num_heads=6,
            trunk_indices=(0, 1), dpt_feature_dim=32, dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        from mapanything_tpu.models import images_only_config

        views = {"img": jnp.ones((1, 2, 32, 32, 3)) * 0.2}
        params = model.init(jax.random.PRNGKey(0), views, images_only_config())
        out = model.apply(params, views, images_only_config())
        assert out["pts3d"].shape == (1, 2, 32, 32, 3)

    def test_unknown_encoder_rejected(self):
        cfg = MapAnythingConfig(encoder_type="bogus")
        model = MapAnything(cfg=cfg)
        with pytest.raises(ValueError, match="encoder_type"):
            model.init(jax.random.PRNGKey(0),
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
        params = model.init(jax.random.PRNGKey(0), views, images_only_config())
        out = model.apply(params, views, images_only_config())
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
            model.init(jax.random.PRNGKey(0),
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
        params = base.init(jax.random.PRNGKey(0), feats, tok)
        o1 = base.apply(params, feats, tok)[0]
        o2 = scaled.apply(params, feats, tok)[0]
        # 4 views x 16 patches > 16-patch base -> global layers get scaled
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_view_pe_randomized_in_training(self):
        from mapanything_tpu.models import aug_training_config

        cfg = MapAnythingConfig(use_view_pe=True, **tiny_overrides())
        model = MapAnything(cfg=cfg)
        views = {"img": jnp.ones((1, 3, H, W, 3)) * 0.2}
        geom = aug_training_config()
        params = model.init(jax.random.PRNGKey(0), views, geom,
                            rng=jax.random.PRNGKey(1))
        o1 = model.apply(params, views, geom, rng=jax.random.PRNGKey(2))
        o2 = model.apply(params, views, geom, rng=jax.random.PRNGKey(3))
        # different rng -> different view indices (among other dropout) ->
        # different outputs; deterministic at inference (no rng)
        assert float(jnp.abs(o1["pts3d"] - o2["pts3d"]).max()) > 0
        from mapanything_tpu.models import images_only_config

        i1 = model.apply(params, views, images_only_config())
        i2 = model.apply(params, views, images_only_config())
        np.testing.assert_array_equal(np.asarray(i1["pts3d"]),
                                      np.asarray(i2["pts3d"]))
