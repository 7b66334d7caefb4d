"""Ring (sequence-parallel) attention vs single-device flash/XLA parity.

The capability the reference lacks (SURVEY §5.7): attention over a token
axis sharded across devices, k/v circulating by ppermute, per-device
memory O(N/p). Run on the 8-virtual-CPU mesh in pallas interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.ops.attention import sdpa
from mapanything_tpu.ops.ring_attention import (
    flash_attention_stats,
    ring_sdpa,
)
from mapanything_tpu.parallel import make_mesh


def _qkv(b=1, n=512, h=2, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(b, n, h, d)).astype(np.float32), dtype)
    return mk(), mk(), mk()


class TestFlashStats:
    def test_stats_reconstruct_attention(self):
        q, k, v = _qkv(n=300)  # ragged vs 128 blocks
        acc, m, l = flash_attention_stats(q, k, v, block_q=128, block_k=128,
                                          interpret=True)
        out = acc / l[..., None]
        ref = sdpa(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_merge_across_kv_split_equals_full(self):
        from mapanything_tpu.ops.ring_attention import _merge

        q, k, v = _qkv(n=256, seed=1)
        a1 = flash_attention_stats(q, k[:, :128], v[:, :128],
                                   block_q=128, block_k=128, interpret=True)
        a2 = flash_attention_stats(q, k[:, 128:], v[:, 128:],
                                   block_q=128, block_k=128, interpret=True)
        acc, m, l = _merge(*a1, *a2)
        out = acc / l[..., None]
        ref = sdpa(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestRing:
    @pytest.mark.parametrize("n,h", [(1024, 2), (2048, 1)])
    def test_matches_single_device(self, n, h):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)
        q, k, v = _qkv(n=n, h=h, seed=2)
        out = ring_sdpa(q, k, v, mesh, seq_axis="model", interpret=True)
        ref = sdpa(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_bf16_ring(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)
        q, k, v = _qkv(n=1024, seed=3, dtype=jnp.bfloat16)
        out = ring_sdpa(q, k, v, mesh, seq_axis="model", interpret=True)
        ref = sdpa(q.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32), impl="xla")
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), rtol=2e-2, atol=2e-2)

    def test_ragged_tokens_rejected(self):
        mesh = make_mesh(n_data=1, n_model=8)
        q, k, v = _qkv(n=300)
        with pytest.raises(AssertionError, match="divide the ring"):
            ring_sdpa(q, k, v, mesh, seq_axis="model", interpret=True)


class TestRingMlpChunk:
    def test_chunked_mlp_matches_dense(self):
        """RingGlobalBlock honors mlp_token_chunk (regression: the ring
        branch dropped it, so memory_efficient sequence-parallel inference
        lost MLP chunking on every global layer)."""
        from mapanything_tpu.nn.layers import RingGlobalBlock

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 CPU devices")
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
        dim, heads, n = 64, 2, 512
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(1, n, dim)).astype(np.float32))
        tok = jnp.zeros((1, 0, dim), jnp.float32)

        # same param tree as Block — init outside the mesh (psum-free);
        # the dense Block doubles as the reference output, so only ONE
        # ring program compiles (ring-vs-block parity is covered by
        # TestRingGlobalBlockTraining)
        from mapanything_tpu.nn.layers import Block

        dense = Block(dim, heads, dtype=jnp.float32, attn_impl="xla")
        params = dense.init(jax.random.PRNGKey(0), x[:, : n // 4])
        ref_x = dense.apply(params, x)

        blk = RingGlobalBlock(dim, heads, axis_name="model",
                              dtype=jnp.float32, interpret=True,
                              mlp_token_chunk=32)  # 128 local rows -> 4
        kwargs = dict(mesh=mesh,
                      in_specs=(P(), P(None, "model", None), P()),
                      out_specs=(P(None, "model", None), P()))
        try:
            fn = shard_map(blk.apply, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(blk.apply, check_rep=False, **kwargs)
        got_x, got_t = fn(params, x, tok)
        assert got_t.shape == (1, 0, dim)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                                   rtol=3e-4, atol=3e-5)


class TestBlockIntegration:
    """The trunk's building Block runs with sequence-parallel attention
    unchanged: shard the token axis over the mesh, set
    attn_impl="ring:model", and the sharded outputs match the unsharded
    Block exactly."""

    @pytest.mark.slow  # ~18 s interpret-mode; the default path keeps the
    # full-pipeline fwd parity (TestViewShardedPipeline) and kernel-level
    # ring parity (TestRing)
    def test_block_ring_matches_unsharded(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from mapanything_tpu.nn.layers import Block

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)

        dim, heads, n = 64, 2, 1024
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, n, dim)).astype(np.float32))

        blk_plain = Block(dim, heads, dtype=jnp.float32, attn_impl="xla")
        params = blk_plain.init(jax.random.PRNGKey(0), x)
        ref = blk_plain.apply(params, x)

        blk_ring = Block(dim, heads, dtype=jnp.float32,
                         attn_impl="ring:model")

        def local_fn(p, xl):
            return blk_ring.apply(p, xl)

        kwargs = dict(mesh=mesh, in_specs=(P(), P(None, "model", None)),
                      out_specs=P(None, "model", None))
        try:
            fn = shard_map(local_fn, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(local_fn, check_rep=False, **kwargs)
        out = fn(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-5)


class TestViewShardedModel:
    """FULL MapAnything forward with views sharded over the mesh — the
    view-ceiling-beyond-one-chip capability (SURVEY §5.7 north star). All
    priors on, so the global-view-0 pose reference and the psum'd
    translation norm are exercised; outputs must match the unsharded
    forward."""

    @pytest.mark.slow  # ~60 s interpret-mode; the driver's dryrun sp
    # phase runs the same all-priors parity on every driver invocation
    def test_matches_unsharded(self):
        from mapanything_tpu.data.synthetic import make_synthetic_batch
        from mapanything_tpu.models import (
            GeometricInputConfig,
            MapAnything,
            MapAnythingConfig,
            jit_init,
        )
        from mapanything_tpu.parallel import view_sharded_forward

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)

        cfg = MapAnythingConfig(
            encoder_size="test", trunk_dim=64, trunk_depth=2,
            trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dense_head_chunk=2, dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        batch = make_synthetic_batch(batch_size=1, num_views=8,
                                     height=28, width=28, seed=5)
        geom = GeometricInputConfig()  # all priors on, deterministic

        params = jit_init(model, jax.random.PRNGKey(0), batch["views"],
                          geom)
        ref = jax.jit(lambda p, vw: model.apply(p, vw, geom))(
            params, batch["views"])

        out = view_sharded_forward(model, params, batch["views"], mesh,
                                   geom_cfg=geom, seq_axis="model")

        assert set(out) == set(ref)
        for k in ("pts3d", "pts3d_cam", "depth_along_ray", "conf",
                  "cam_quats", "cam_trans", "metric_scaling_factor"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]),
                rtol=5e-4, atol=5e-5, err_msg=k,
            )

    def test_stochastic_geom_rejected(self):
        from mapanything_tpu.models import (
            MapAnything,
            MapAnythingConfig,
            aug_training_config,
        )
        from mapanything_tpu.parallel import view_sharded_forward

        mesh = make_mesh(n_data=1, n_model=8)
        model = MapAnything(cfg=MapAnythingConfig(encoder_size="test"))
        with pytest.raises(ValueError, match="deterministic"):
            view_sharded_forward(
                model, {}, {"img": jnp.zeros((1, 8, 28, 28, 3))}, mesh,
                geom_cfg=aug_training_config(),
            )

    def test_ragged_view_count_rejected(self):
        from mapanything_tpu.models import MapAnything, MapAnythingConfig
        from mapanything_tpu.parallel import view_sharded_forward

        mesh = make_mesh(n_data=1, n_model=8)
        model = MapAnything(cfg=MapAnythingConfig(encoder_size="test"))
        with pytest.raises(ValueError, match="multiple of"):
            view_sharded_forward(
                model, {}, {"img": jnp.zeros((1, 6, 28, 28, 3))}, mesh,
            )


class TestViewShardedPipeline:
    """InferencePipeline(view_shard_mesh=...) serves many-view scenes
    sequence-parallel end to end (forward + postprocess)."""

    def test_pipeline_matches_unsharded(self):
        from mapanything_tpu.models import (
            MapAnything,
            MapAnythingConfig,
            images_only_config,
            jit_init,
        )
        from mapanything_tpu.utils.inference import InferencePipeline

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)

        cfg = MapAnythingConfig(
            encoder_size="test", trunk_dim=64, trunk_depth=2,
            trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dense_head_chunk=2, dtype=jnp.float32,
        )
        model = MapAnything(cfg=cfg)
        rng = np.random.default_rng(6)
        imgs = rng.normal(size=(8, 1, 28, 28, 3)).astype(np.float32) * 0.3
        view_list = [{"img": jnp.asarray(imgs[i]),
                      "data_norm_type": ["dinov2"]} for i in range(8)]
        init_views = {"img": jnp.asarray(imgs.transpose(1, 0, 2, 3, 4))}
        params = jit_init(model, jax.random.PRNGKey(0), init_views,
                          images_only_config())

        plain = InferencePipeline(model, params)
        ref = plain.infer(view_list, apply_confidence_mask=True)

        sharded = InferencePipeline(model, params, view_shard_mesh=mesh)
        out = sharded.infer(view_list, apply_confidence_mask=True)

        assert len(out) == len(ref) == 8
        for i in (0, 3, 7):
            np.testing.assert_allclose(
                np.asarray(out[i]["pts3d"]), np.asarray(ref[i]["pts3d"]),
                rtol=5e-4, atol=5e-5,
            )
            np.testing.assert_array_equal(
                np.asarray(out[i]["mask"]), np.asarray(ref[i]["mask"]))


class TestRingBackward:
    """Sequence-parallel TRAINING: gradients through the ring must match
    single-device XLA attention gradients (per-device backward memory is
    O(N/p), same scaling as the forward)."""

    def _grads(self, fn, q, k, v):
        def loss(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def test_grads_match_single_device(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from mapanything_tpu.ops.ring_attention import (
            ring_flash_attention_trainable,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)
        q, k, v = _qkv(b=1, n=1024, h=2, d=64, seed=7)

        spec = P(None, "model", None, None)
        kwargs = dict(mesh=mesh, in_specs=(spec,) * 3, out_specs=spec)

        def local(qs, ks, vs):
            return ring_flash_attention_trainable(qs, ks, vs, "model",
                                                  True)

        try:
            ring = shard_map(local, check_vma=False, **kwargs)
        except TypeError:
            ring = shard_map(local, check_rep=False, **kwargs)

        dq, dk, dv = self._grads(ring, q, k, v)
        rq, rk, rv = self._grads(lambda *a: sdpa(*a, impl="xla"), q, k, v)

        for got, ref, name in ((dq, rq, "dq"), (dk, rk, "dk"),
                               (dv, rv, "dv")):
            assert np.isfinite(np.asarray(got)).all(), name
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-4,
                err_msg=name,
            )

    def test_pair_bwd_sums_to_full(self):
        """The ring backward's merge is plain addition of pair partials —
        verify dq(kv split in two) == dq(full kv), same for dk/dv."""
        from mapanything_tpu.ops.ring_attention import (
            _pair_bwd,
            flash_attention_stats,
        )

        q, k, v = _qkv(b=1, n=256, h=2, d=64, seed=8)
        g = jnp.asarray(
            np.random.default_rng(9).normal(size=q.shape).astype(
                np.float32))

        acc, m, l = flash_attention_stats(q, k, v, block_q=128,
                                          block_k=128, interpret=True)
        out = acc / l[..., None]
        lse2 = m + jnp.log2(l)
        delta = jnp.sum(g * out, axis=-1)

        dq_full, dk_full, dv_full = _pair_bwd(q, k, v, g, lse2, delta,
                                              interpret=True)
        dq_a, dk_a, dv_a = _pair_bwd(q, k[:, :128], v[:, :128], g, lse2,
                                     delta, interpret=True)
        dq_b, dk_b, dv_b = _pair_bwd(q, k[:, 128:], v[:, 128:], g, lse2,
                                     delta, interpret=True)

        np.testing.assert_allclose(np.asarray(dq_a + dq_b),
                                   np.asarray(dq_full), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([dk_a, dk_b], axis=1)),
            np.asarray(dk_full), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([dv_a, dv_b], axis=1)),
            np.asarray(dv_full), rtol=2e-4, atol=2e-5)


class TestRingGlobalBlockTraining:
    """The no-extra-token RingGlobalBlock path (use_scale_token=False
    ablations) is differentiable: param gradients under the ring match the
    plain Block's."""

    @pytest.mark.slow  # ~85 s of interpret-mode ring backwards; the
    # kernel-level grads parity (TestRingBackward) stays in the default
    # path
    def test_block_grads_match(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from mapanything_tpu.nn.layers import Block, RingGlobalBlock

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)

        dim, heads, n = 64, 2, 256
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(size=(1, n, dim)).astype(np.float32))
        tok = jnp.zeros((1, 0, dim), jnp.float32)

        plain = Block(dim, heads, dtype=jnp.float32, attn_impl="xla")
        params = plain.init(jax.random.PRNGKey(0), x)

        def plain_loss(p, x):
            return jnp.sum(plain.apply(p, x) ** 2)

        ref = jax.grad(plain_loss)(params, x)

        ring_blk = RingGlobalBlock(dim, heads, axis_name="model",
                                   dtype=jnp.float32, interpret=True)

        def local_loss(p, xl, tl):
            out_x, _ = ring_blk.apply(p, xl, tl)
            return jax.lax.psum(jnp.sum(out_x ** 2), "model")

        kwargs = dict(
            mesh=mesh,
            in_specs=(P(), P(None, "model", None), P()),
            out_specs=P(),
        )
        try:
            fn = shard_map(local_loss, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(local_loss, check_rep=False, **kwargs)
        got = jax.grad(fn)(params, x, tok)

        flat_ref = jax.tree_util.tree_leaves_with_path(ref)
        flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat_got[path]), np.asarray(leaf),
                rtol=5e-3, atol=5e-4,
                err_msg="/".join(str(k) for k in path),
            )


class TestRingWithLse:
    """The lse-returning trainable ring: BOTH outputs' cotangents must
    flow — this is the primitive behind scale-token sequence-parallel
    training."""

    @pytest.mark.slow  # ~37 s; subsumed by TestRingBackward (default) +
    # the slow token-training variant below
    def test_out_and_lse_grads_match_jnp(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from mapanything_tpu.ops.ring_attention import (
            ring_flash_attention_with_lse,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)
        q, k, v = _qkv(b=1, n=256, h=2, d=64, seed=11)
        c2 = 64**-0.5 * 1.4426950408889634

        def ref_loss(q, k, v):
            s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * c2
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", p / l[..., None], v)
            lse = jnp.swapaxes(m[..., 0] + jnp.log2(l), 1, 2)  # (B,N,H)
            return jnp.sum(out**2) + jnp.sum(jnp.sin(lse))

        spec = P(None, "model", None, None)

        def local(qs, ks, vs):
            out, lse = ring_flash_attention_with_lse(qs, ks, vs, "model",
                                                     True)
            return jax.lax.psum(
                jnp.sum(out.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.sin(lse)), "model")

        kwargs = dict(mesh=mesh, in_specs=(spec,) * 3, out_specs=P())
        try:
            ring = shard_map(local, check_vma=False, **kwargs)
        except TypeError:
            ring = shard_map(local, check_rep=False, **kwargs)

        got = jax.grad(ring, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
            assert np.isfinite(np.asarray(g)).all(), name
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=5e-3, atol=5e-4,
                err_msg=name,
            )


class TestRingGlobalBlockTokenTraining:
    """The scale-token RingGlobalBlock path trains too: param gradients
    under the ring match the plain Block on the concatenated
    [patches; tok] sequence."""

    @pytest.mark.slow  # ~2 min of interpret-mode ring backwards; the
    # default path keeps TestRingWithLse (the underlying primitive's
    # gradients) and the t=0 block training test
    def test_block_grads_match_with_token(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from mapanything_tpu.nn.layers import Block, RingGlobalBlock

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(n_data=1, n_model=8)

        dim, heads, n = 64, 2, 256
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(1, n, dim)).astype(np.float32))
        tok = jnp.asarray(rng.normal(size=(1, 1, dim)).astype(np.float32))
        flat = jnp.concatenate([x, tok], axis=1)

        plain = Block(dim, heads, dtype=jnp.float32, attn_impl="xla")
        params = plain.init(jax.random.PRNGKey(0), flat)

        def plain_loss(p):
            out = plain.apply(p, flat)
            return jnp.sum(out[:, :n] ** 2) + jnp.sum(out[:, n:] ** 2)

        ref = jax.grad(plain_loss)(params)

        ring_blk = RingGlobalBlock(dim, heads, axis_name="model",
                                   dtype=jnp.float32, interpret=True)

        def local_loss(p, xl, tl):
            out_x, out_t = ring_blk.apply(p, xl, tl)
            # tok output is replicated: count it once (divide by p)
            ring = jax.lax.psum(1, "model")
            return jax.lax.psum(
                jnp.sum(out_x ** 2) + jnp.sum(out_t ** 2) / ring, "model")

        kwargs = dict(
            mesh=mesh,
            in_specs=(P(), P(None, "model", None), P()),
            out_specs=P(),
        )
        try:
            fn = shard_map(local_loss, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(local_loss, check_rep=False, **kwargs)
        got = jax.grad(fn)(params, x, tok)

        flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
        for path, leaf in jax.tree_util.tree_leaves_with_path(ref):
            np.testing.assert_allclose(
                np.asarray(flat_got[path]), np.asarray(leaf),
                rtol=5e-3, atol=5e-4,
                err_msg="/".join(str(kk) for kk in path),
            )
