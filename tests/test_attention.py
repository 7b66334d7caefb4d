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
