"""Flash attention kernel vs XLA attention parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.ops.attention import _sdpa_xla
from mapanything_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b, n, h, d, dtype=np.float32):
    q = rng.standard_normal((b, n, h, d)).astype(dtype)
    k = rng.standard_normal((b, n, h, d)).astype(dtype)
    v = rng.standard_normal((b, n, h, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    @pytest.mark.parametrize("n", [256, 384, 500])  # aligned, multi-block, ragged
    def test_matches_xla(self, rng, n):
        q, k, v = _qkv(rng, 2, n, 4, 64)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    @pytest.mark.parametrize("n", [256, 500])  # aligned + ragged kv
    def test_onepass_transposed_matches_xla(self, rng, n):
        q, k, v = _qkv(rng, 2, n, 4, 64)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              interpret=True, onepass_t=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_onepass_transposed_n_valid(self, rng):
        q, k, v = _qkv(rng, 1, 300, 2, 64)
        pad = 384 - 300
        qp, kp, vp = [jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
                      for x in (q, k, v)]
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(qp, kp, vp, block_q=128, block_k=128,
                              interpret=True, n_valid=300, onepass_t=True)
        np.testing.assert_allclose(
            np.asarray(out[:, :300]), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    @pytest.mark.parametrize("n", [384, 500])  # aligned + ragged final block
    def test_online_multiblock_matches_xla(self, rng, n):
        """The online-softmax k-block kernel (the serving path for >2816-token
        kv, i.e. 32/100-view global attention) incl. the branch-gated
        final-block padding mask."""
        q, k, v = _qkv(rng, 2, n, 4, 64)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              interpret=True, single_pass_max=128)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_single_block(self, rng):
        q, k, v = _qkv(rng, 1, 128, 2, 32)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_extreme_logits_stable(self, rng):
        """Online softmax must stay finite with large score magnitudes."""
        q, k, v = _qkv(rng, 1, 256, 2, 64)
        q = q * 30.0
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        assert bool(jnp.isfinite(out).all())
        ref = _sdpa_xla(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )


class TestFlashBackward:
    def test_gradients_match_xla(self, rng):
        """Pallas dq/dk/dv kernels vs XLA autodiff (interpret mode)."""
        import functools

        from mapanything_tpu.ops import flash_attention_bwd as fb

        # run the pallas calls in interpret mode on CPU
        orig = fb.pl.pallas_call
        fb.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            q, k, v = _qkv(rng, 1, 256, 2, 64)

            def loss_flash(q, k, v):
                out, res = fb._fwd_with_lse(q, k, v, 128, 128)
                return jnp.sum(out**2), (out, res)

            (val, (out, res)) = loss_flash(q, k, v)
            g = 2 * out
            dq, dk, dv = fb._bwd(res, g)

            def loss_xla(q, k, v):
                return jnp.sum(_sdpa_xla(q, k, v) ** 2)

            gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
            for ours, ref in zip((dq, dk, dv), gx):
                np.testing.assert_allclose(
                    np.asarray(ours), np.asarray(ref), atol=2e-4, rtol=1e-3
                )
        finally:
            fb.pl.pallas_call = orig

    @pytest.mark.parametrize("n,single_pass_max", [
        (300, 2816),   # ragged 1-pass lse path (bias-row masking)
        (300, 128),    # ragged multi-block online path
    ])
    def test_gradients_match_xla_ragged(self, rng, n, single_pass_max):
        """Both lse-forward paths (1-pass and online multi-block) after the
        mask-elision rework: padded rows/cols must contribute exactly zero
        to dq/dk/dv."""
        import functools

        from mapanything_tpu.ops import flash_attention_bwd as fb

        orig = fb.pl.pallas_call
        fb.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            q, k, v = _qkv(rng, 1, n, 2, 64)

            out, res = fb._fwd_with_lse(q, k, v, 128, 128,
                                        single_pass_max=single_pass_max)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(_sdpa_xla(q, k, v)),
                atol=1e-4, rtol=1e-4,
            )
            g = 2 * out
            dq, dk, dv = fb._bwd(res, g)

            def loss_xla(q, k, v):
                return jnp.sum(_sdpa_xla(q, k, v) ** 2)

            gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
            for name, ours, ref in zip("qkv", (dq, dk, dv), gx):
                np.testing.assert_allclose(
                    np.asarray(ours), np.asarray(ref), atol=2e-4, rtol=1e-3,
                    err_msg=f"d{name}",
                )
        finally:
            fb.pl.pallas_call = orig


class TestAlignedTokenMode:
    """n_valid (aligned-token) mode: inputs pre-padded to an aligned length
    with zero k/v pad rows; the kernels mask only the ones-column row sum.
    The contract is exact — masked softmax == unpadded softmax."""

    def _padded(self, rng, n_valid, n_pad):
        q, k, v = _qkv(rng, 2, n_valid, 4, 64)
        pad = ((0, 0), (0, n_pad - n_valid), (0, 0), (0, 0))
        # k/v pad rows MUST be zero (the Attention module's qkv-epilogue
        # mask guarantees this in production); q pad rows are garbage
        qp = jnp.pad(q, pad, constant_values=0.7)  # garbage q pads
        kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
        return (q, k, v), (qp, kp, vp)

    def test_serving_kernel_n_valid(self, rng):
        (q, k, v), (qp, kp, vp) = self._padded(rng, 300, 384)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(qp, kp, vp, block_q=128, block_k=128,
                              interpret=True, n_valid=300)
        np.testing.assert_allclose(
            np.asarray(out[:, :300]), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_online_kernel_n_valid(self, rng):
        (q, k, v), (qp, kp, vp) = self._padded(rng, 300, 384)
        ref = _sdpa_xla(q, k, v)
        out = flash_attention(qp, kp, vp, block_q=128, block_k=128,
                              interpret=True, single_pass_max=128,
                              n_valid=300)
        np.testing.assert_allclose(
            np.asarray(out[:, :300]), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_gradients_n_valid(self, rng):
        """The bwd kernels need no masking: pad-row output cotangents are
        zero by construction in the module (the row-mask's backward), so ds
        vanishes on pad q rows; pad k/v ROW grads are garbage killed by the
        same mask backward — assert the real rows match unpadded XLA."""
        import functools

        from mapanything_tpu.ops import flash_attention_bwd as fb

        orig = fb.pl.pallas_call
        fb.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            (q, k, v), (qp, kp, vp) = self._padded(rng, 300, 384)
            out, res = fb._fwd_with_lse(qp, kp, vp, 128, 128, n_valid=300)
            np.testing.assert_allclose(
                np.asarray(out[:, :300]), np.asarray(_sdpa_xla(q, k, v)),
                atol=1e-4, rtol=1e-4,
            )
            # pad-row cotangents are zero in production (see docstring)
            g = 2 * out * (jnp.arange(384) < 300)[None, :, None, None]
            dq, dk, dv = fb._bwd(res, g)

            def loss_xla(q, k, v):
                return jnp.sum(_sdpa_xla(q, k, v) ** 2)

            gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
            for name, ours, ref in zip("qkv", (dq, dk, dv), gx):
                np.testing.assert_allclose(
                    np.asarray(ours[:, :300]), np.asarray(ref),
                    atol=2e-4, rtol=1e-3, err_msg=f"d{name}",
                )
        finally:
            fb.pl.pallas_call = orig

    def test_attention_module_n_valid(self, rng):
        """layers.Attention with a pre-padded input equals the unpadded
        module on the real rows (CPU: XLA key-mask path)."""
        from mapanything_tpu.nn.layers import Attention

        x = jnp.asarray(rng.standard_normal((2, 300, 64)).astype(np.float32))
        xp = jnp.pad(x, ((0, 0), (0, 84), (0, 0)), constant_values=0.3)
        mod = Attention(64, 4)
        params = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(params, x)
        out = mod.apply(params, xp, n_valid=300)
        np.testing.assert_allclose(
            np.asarray(out[:, :300]), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_encoder_pad_tokens_exact(self, rng):
        """DinoViT pad_tokens_to: identical patch features vs unpadded."""
        from mapanything_tpu.nn.dinov2 import DinoViT

        img = jnp.asarray(
            rng.standard_normal((1, 56, 70, 3)).astype(np.float32))
        enc = DinoViT(size="test", patch_size=14)
        enc_pad = DinoViT(size="test", patch_size=14, pad_tokens_to=16)
        params = enc.init(jax.random.PRNGKey(0), img)
        ref = enc.apply(params, img)          # 4*5+1 = 21 tokens
        out = enc_pad.apply(params, img)      # padded to 32
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
