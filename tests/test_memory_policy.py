"""resolve_memory_policy: trace-time replacement for the reference's
adaptive free-memory minibatching (model.py:1263-1438)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mapanything_tpu.models import (
    MapAnything,
    MapAnythingConfig,
    images_only_config,
    jit_init,
    resolve_memory_policy,
)


def small_cfg(**kw):
    return MapAnythingConfig(
        encoder_size="test", trunk_dim=64, trunk_depth=4, trunk_num_heads=2,
        trunk_indices=(1, 2), dpt_feature_dim=32,
        dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
        dtype=jnp.float32, **kw)


class TestPolicy:
    def test_small_counts_run_dense(self):
        cfg = MapAnythingConfig()
        for b, v in [(1, 1), (4, 2), (1, 32), (1, 48)]:
            pol = resolve_memory_policy(cfg, b, v, 518, 518)
            assert not pol.memory_efficient, (b, v)
            assert pol.post_view_chunk is None
            assert pol.cfg == cfg

    def test_mid_counts_chunk_heads_only(self):
        cfg = MapAnythingConfig()
        pol = resolve_memory_policy(cfg, 1, 100, 518, 518)
        assert pol.memory_efficient
        assert pol.cfg.mlp_token_chunk is None  # MLPs stay fused
        assert pol.cfg.dense_head_chunk == 16
        assert pol.post_view_chunk == 16

    def test_large_counts_keep_proven_settings(self):
        cfg = MapAnythingConfig()
        pol = resolve_memory_policy(cfg, 1, 192, 518, 518)
        assert pol.memory_efficient
        assert pol.cfg.mlp_token_chunk == cfg.mlp_token_chunk
        assert pol.cfg.dense_head_chunk == 8
        assert pol.post_view_chunk == 8

    def test_resolution_scales_like_views(self):
        # 32 views at 2x the pixels ~ 64 views at 518
        cfg = MapAnythingConfig()
        lo = resolve_memory_policy(cfg, 1, 32, 518, 518)
        hi = resolve_memory_policy(cfg, 1, 32, 740, 740)
        assert not lo.memory_efficient and hi.memory_efficient

    def test_smaller_hbm_shifts_thresholds_down(self):
        cfg = MapAnythingConfig()
        assert not resolve_memory_policy(cfg, 1, 32, 518, 518).memory_efficient
        assert resolve_memory_policy(
            cfg, 1, 32, 518, 518, hbm_gb=8.0).memory_efficient


class TestAutoInference:
    def test_auto_matches_explicit_paths(self):
        from mapanything_tpu.utils.inference import InferencePipeline

        cfg = small_cfg()
        model = MapAnything(cfg=cfg)
        rng = np.random.default_rng(0)
        views = [
            {"img": rng.standard_normal((1, 56, 84, 3),
                                        dtype=np.float32) * 0.2,
             "data_norm_type": "dinov2"}
            for _ in range(3)
        ]
        probe = {"img": jnp.zeros((1, 3, 56, 84, 3), jnp.float32)}
        params = jit_init(model, jax.random.PRNGKey(0), probe,
                          images_only_config())
        pipe = InferencePipeline(model, params)
        auto = pipe.infer(views)  # auto -> dense at 3 tiny views
        dense = pipe.infer(views, memory_efficient_inference=False)
        chunked = pipe.infer(views, memory_efficient_inference=True)
        for a, d, c in zip(auto, dense, chunked):
            np.testing.assert_array_equal(np.asarray(a["pts3d"]),
                                          np.asarray(d["pts3d"]))
            np.testing.assert_allclose(np.asarray(a["pts3d"]),
                                       np.asarray(c["pts3d"]),
                                       rtol=2e-5, atol=2e-5)
