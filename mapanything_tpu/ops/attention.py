"""Scaled dot-product attention for TPU.

Two interchangeable implementations behind one functional interface:

  * "xla"   — einsum QK^T -> fp32 softmax -> einsum PV. XLA fuses this well for
              moderate sequence lengths; materializes the (N, N) score matrix.
  * "flash" — blockwise Pallas kernel (ops/flash_attention.py) that never
              materializes the score matrix; required for 100+-view global
              attention where N = V*P reaches 10^5-10^6 tokens.

The reference trunk relies on torch F.scaled_dot_product_attention (CUDA
flash kernels, never tiled for the multi-view axis); the flash path here is
the TPU-native equivalent and the key scaling unlock (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    key_mask: jnp.ndarray | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention.

    Args:
        q, k, v: (B, N, H, D) — batch, tokens, heads, head dim.
        impl: "auto" | "xla" | "flash".
        key_mask: optional (K,) or (B, K) bool — True = key is attendable.
            Used by the N-view cross-attention trunk to attend to "all OTHER
            views" against one shared key/value set instead of per-view
            gathered contexts (static shapes, O(1) graph size in V). Masked
            attention currently routes through the XLA path.
        n_valid: static count of real tokens in aligned-token mode (inputs
            pre-padded to a tile-aligned length, k/v pad rows already zeroed
            by the caller — see flash_attention). The XLA path derives a
            static key mask from it instead.

    Returns:
        (B, N, H, D) attention output in q.dtype.
    """
    if impl == "auto":
        # On TPU the Pallas flash kernel wins at every measured length (the
        # XLA path is HBM-bound on the materialized fp32 score matrix: 34 vs
        # 75 TFLOP/s on a ViT-L block stack at N=1370). On CPU, pallas only
        # runs interpreted — use the XLA path there.
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if n_valid is not None and n_valid < k.shape[1]:
        if impl == "flash":
            from .flash_attention_bwd import flash_attention_trainable

            # positional: custom_vjp + nondiff_argnums rejects kwargs
            return flash_attention_trainable(q, k, v, 1408, 2048, n_valid)
        if impl == "xla" and key_mask is None:
            import numpy as np

            key_mask = jnp.asarray(np.arange(k.shape[1]) < n_valid)
    if key_mask is not None:
        if impl.startswith("ring"):
            # the XLA fallback would silently attend to only the LOCAL
            # k/v shard inside shard_map — wrong results, no error
            raise NotImplementedError(
                "key_mask is not supported with ring attention; gather the "
                "masked keys locally or run the masked layer unsharded")
        return _sdpa_xla(q, k, v, key_mask=key_mask)
    if impl == "xla":
        return _sdpa_xla(q, k, v)
    if impl == "flash":
        # custom-VJP wrapper: plain flash kernel for the primal, Pallas
        # dq/dk/dv kernels under differentiation (training graphs)
        from .flash_attention_bwd import flash_attention_trainable

        return flash_attention_trainable(q, k, v)
    if impl.startswith("ring"):
        # sequence-parallel attention: the caller is inside shard_map with
        # the token axis sharded over "<axis>" ("ring" => "model"). Lets a
        # trunk built from the same Blocks span its global attention across
        # a mesh axis (ops/ring_attention.py).
        from .ring_attention import ring_flash_attention_trainable

        axis = impl.split(":", 1)[1] if ":" in impl else "model"
        return ring_flash_attention_trainable(
            q, k, v, axis,
            jax.default_backend() != "tpu",
        )
    raise ValueError(f"unknown attention impl: {impl}")


def _sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    orig_dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    # Scores accumulate in fp32 on the MXU; softmax stays fp32 (the reference
    # model's autocast keeps softmax/layernorm in fp32 as well).
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, -jnp.inf).astype(jnp.float32)
        # (K,) -> (1,1,1,K) or (B,K) -> (B,1,1,K)
        bias = bias[..., None, None, :] if bias.ndim == 2 else bias[None, None, None, :]
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(orig_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
