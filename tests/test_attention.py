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
