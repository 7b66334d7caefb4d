"""Multi-view information-sharing transformers (the model trunk).

TPU-native rebuild of the UniCeption MultiView*AttentionTransformer[IFR]
family consumed by the reference at model.py:36-48,224-305 and configured by
configs/model/info_sharing/*.yaml:

  * alternating_attention (the released architecture, VGGT-style; concrete
    in-repo spec: reference external/vggt/models/aggregator.py:27): `depth`
    pre-norm transformer layers alternating between per-frame self-attention
    (tokens of one view) and global self-attention (all views' tokens
    concatenated + extra global tokens);
  * global_attention: every layer is global (ablation);
  * cross_attention: two-branch DUSt3R-style (ablation) — see CrossTrunk.

Design notes (TPU-first):
  * Views live on a leading axis: features (B, V, gh, gw, C). Frame attention
    reshapes to (B*V, P, C) — a free reshape, batched MXU work. Global
    attention reshapes to (B, V*P + T, C) and can run through the Pallas
    flash kernel when V*P is large (attn_impl="flash").
  * The scale token (T extra global tokens) participates in global layers and
    passes through frame layers unchanged (it is a per-sample, not per-view,
    token).
  * `distinguish_ref_and_non_ref_views: True` adds a learned embedding to
    view 0's tokens and a second one to all other views' tokens
    (aat_ifr_24_layers.yaml:16).
  * IFR ("intermediate feature returner") taps the outputs at `indices`
    (default [11, 17]), each normalized by its own LayerNorm when
    `norm_intermediate` (aat_ifr_24_layers.yaml:12-14).
  * Depth counting: `depth: 24` = 24 total attention layers (12 frame + 12
    global, frame first). NOTE (SURVEY.md §2.6): VGGT counts *pairs*; if HF
    checkpoint keys show 24 pairs, set depth=48 at conversion time — the
    layer loop is agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Block, FusedLayerNorm, RingGlobalBlock


class _PairScanBody(nn.Module):
    """One (frame, global) layer pair — the nn.scan body for the alternating
    trunk's O(1)-HLO mode (see AlternatingAttentionTrunk.scan_layers).

    Params land stacked (leading axis depth//2) under
    ``pairs/{frame,global}/...``; `utils.weights.stack_scan_params` maps the
    per-layer ``layers_{2s}``/``layers_{2s+1}`` conversion layout onto it.

    IFR taps: carry holds one buffer per tap index; the body overwrites it
    when the traced layer counter matches (a trace-static parity check skips
    the impossible position, so each tap costs one select per scan step).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    frame_attn_impl: str = "auto"
    global_attn_impl: str = "auto"
    entropy_scaling_base: Optional[int] = None  # global layers only
    mlp_token_chunk: Optional[int] = None
    pad_tokens_to: Optional[int] = None
    tap_layers: tuple = ()  # absolute layer indices (IFR taps)

    @nn.compact
    def __call__(self, carry, step, rope=None):
        x, tok, taps = carry  # x (B, V, P, dim), tok (B, T, dim)
        b, v, p, dim = x.shape
        t = tok.shape[1]

        def update_taps(taps, layer_idx, parity, val):
            out = []
            for li, tap in zip(self.tap_layers, taps):
                if li % 2 != parity:  # statically impossible at this slot
                    out.append(tap)
                else:
                    out.append(jnp.where(layer_idx == li, val, tap))
            return tuple(out)

        frame = Block(
            self.dim, self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, layerscale_init=self.layerscale_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.frame_attn_impl,
            mlp_token_chunk=self.mlp_token_chunk, name="frame",
        )
        x = frame(x.reshape(b * v, p, dim), rope, None).reshape(b, v, p, dim)
        taps = update_taps(taps, 2 * step, 0, x)

        glob = Block(
            self.dim, self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, layerscale_init=self.layerscale_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.global_attn_impl,
            entropy_scaling_base=self.entropy_scaling_base,
            mlp_token_chunk=self.mlp_token_chunk, name="global",
        )
        n_tot = v * p + t
        pieces = [x.reshape(b, v * p, dim), tok]
        n_valid = None
        if self.pad_tokens_to:
            n_pad = -(-n_tot // self.pad_tokens_to) * self.pad_tokens_to
            if n_pad != n_tot:
                pieces.append(jnp.zeros((b, n_pad - n_tot, dim), x.dtype))
                n_valid = n_tot
        flat = glob(jnp.concatenate(pieces, axis=1), None, n_valid)
        x = flat[:, : v * p].reshape(b, v, p, dim)
        tok = flat[:, v * p : n_tot]
        taps = update_taps(taps, 2 * step + 1, 1, x)
        return (x, tok, taps), None


class AlternatingAttentionTrunk(nn.Module):
    """Alternating frame/global multi-view transformer with IFR taps."""

    input_embed_dim: int = 1024
    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distinguish_ref_and_non_ref_views: bool = True
    indices: Sequence[int] = (11, 17)  # IFR tap layer indices
    norm_intermediate: bool = True
    use_view_pe: bool = False
    max_views_for_pe: int = 1000
    layerscale_init: Optional[float] = None
    # 2D rotary PE on frame-attention layers (ablations.py:216-234
    # "RoPE<freq>" strings); None = learned-PE-free trunk (released default)
    rope_freq: Optional[float] = None
    # Entropy-invariant attention scaling for global layers when the token
    # count exceeds the per-view patch count (aat_ifr_*_escaling.yaml
    # "use_entropy_scaling"); base = patches-per-view at trace time.
    use_entropy_scaling: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    frame_attn_impl: str = "auto"
    global_attn_impl: str = "auto"
    # Sequence parallelism: when set, this trunk is being traced inside
    # shard_map with the VIEW axis sharded over this mesh axis — global
    # layers run ring attention (ops/ring_attention.py) and ref/view-PE
    # indices are offset by the shard's global view offset. Frame layers,
    # LN and MLP are per-view and need no change.
    seq_axis: Optional[str] = None
    remat: bool = False
    mlp_token_chunk: Optional[int] = None  # see layers.Mlp.token_chunk
    # Aligned-token mode for global layers: pad [views*patches | extra
    # tokens] to a multiple of this and mask the pad keys (layers.Attention
    # n_valid) instead of letting the flash wrapper pad q/k/v per call.
    # Exact; measured -0.15 ms/global-layer at the 2-view 518 shape. None
    # disables (frame layers are per-view ragged either way).
    pad_tokens_to: Optional[int] = None
    # nn.scan over (frame, global) layer pairs: O(1) HLO in depth — the
    # compile-time fix for the 24-layer trunk (params stacked under
    # pairs/{frame,global}; see _PairScanBody and
    # utils.weights.stack_scan_params). Requires even depth and no
    # seq_axis (the ring path stays unrolled). Numerics identical to the
    # unrolled loop (tests/test_scan_layers.py).
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (B, V, gh, gw, C_in)
        extra_tokens: jnp.ndarray,  # (B, T, C_in) global tokens (scale token)
        view_indices: jnp.ndarray | None = None,  # (B, V) int for view PE
    ):
        b, v, gh, gw, _ = features.shape
        p = gh * gw
        t = extra_tokens.shape[1]

        # global view offset of this shard (0 when not view-sharded)
        view_offset = (
            jax.lax.axis_index(self.seq_axis) * v if self.seq_axis else 0
        )

        x = features.reshape(b, v, p, self.input_embed_dim)
        proj = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")
        x = proj(x.astype(self.dtype))
        tok = proj(extra_tokens.astype(self.dtype))  # (B, T, dim)

        if self.distinguish_ref_and_non_ref_views:
            view_embed = self.param(
                "ref_nonref_embed",
                nn.initializers.truncated_normal(0.02),
                (2, self.dim),
                self.param_dtype,
            ).astype(self.dtype)
            is_ref = (view_offset + jnp.arange(v) == 0).astype(
                self.dtype)[None, :, None, None]
            x = x + is_ref * view_embed[0] + (1.0 - is_ref) * view_embed[1]

        if self.use_view_pe:
            # Learned per-view-index embedding; non-ref indices are randomized
            # up to max_views_for_pe at train time (caller provides
            # view_indices; defaults to arange at inference) —
            # aat_ifr_24_layers_w_view_pe.yaml:23-26.
            pe_table = self.param(
                "view_pe",
                nn.initializers.truncated_normal(0.02),
                (self.max_views_for_pe, self.dim),
                self.param_dtype,
            )
            if view_indices is None:
                view_indices = jnp.broadcast_to(
                    (view_offset + jnp.arange(v))[None], (b, v))
            x = x + pe_table[view_indices].astype(self.dtype)[:, :, None, :]

        rope = None
        if self.rope_freq is not None:
            from .rope import rope_2d_cos_sin

            rope = rope_2d_cos_sin(gh, gw, self.dim // self.num_heads,
                                   self.rope_freq)

        if self.scan_layers and not self.seq_axis:
            if self.depth % 2:
                raise ValueError(
                    "scan_layers needs an even trunk depth (frame/global "
                    f"pairs); got {self.depth}")
            from .layers import scan_blocks

            taps0 = tuple(
                jnp.zeros((b, v, p, self.dim), self.dtype)
                for _ in self.indices
            )
            body = scan_blocks(
                _PairScanBody, self.depth // 2, remat=self.remat,
                in_axes=(0, nn.broadcast),
            )(
                self.dim, self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                layerscale_init=self.layerscale_init,
                dtype=self.dtype, param_dtype=self.param_dtype,
                frame_attn_impl=self.frame_attn_impl,
                global_attn_impl=self.global_attn_impl,
                entropy_scaling_base=(p if self.use_entropy_scaling
                                      else None),
                mlp_token_chunk=self.mlp_token_chunk,
                pad_tokens_to=self.pad_tokens_to,
                tap_layers=tuple(self.indices),
                name="pairs",
            )
            (x, tok, taps), _ = body(
                (x, tok, taps0), jnp.arange(self.depth // 2), rope)
            intermediates = []
            for li, tap in zip(self.indices, taps):
                feat = tap
                if self.norm_intermediate:
                    feat = FusedLayerNorm(
                        epsilon=1e-6, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"norm_intermediate_{li}",
                    )(feat).astype(self.dtype)
                intermediates.append(feat.reshape(b, v, gh, gw, self.dim))
            final_norm = FusedLayerNorm(
                epsilon=1e-6, dtype=self.dtype,
                param_dtype=self.param_dtype, name="norm",
            )
            x = final_norm(x).astype(self.dtype)
            tok = final_norm(tok).astype(self.dtype)
            return (x.reshape(b, v, gh, gw, self.dim), intermediates, tok)

        intermediates = []
        # n_valid (arg 3, counting self) is a static python int
        block_cls = (nn.remat(Block, static_argnums=(3,)) if self.remat
                     else Block)
        ring_cls = (nn.remat(RingGlobalBlock) if self.remat
                    else RingGlobalBlock)
        for i in range(self.depth):
            is_global = i % 2 == 1
            if is_global and self.seq_axis:
                import jax as _jax

                blk = ring_cls(
                    self.dim,
                    self.num_heads,
                    axis_name=self.seq_axis,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    layerscale_init=self.layerscale_init,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    entropy_scaling_base=(
                        p if self.use_entropy_scaling else None
                    ),
                    interpret=_jax.default_backend() != "tpu",
                    mlp_token_chunk=self.mlp_token_chunk,
                    name=f"layers_{i}",
                )
                x_flat, tok = blk(x.reshape(b, v * p, self.dim), tok)
                x = x_flat.reshape(b, v, p, self.dim)
                if i in self.indices:
                    feat = x
                    if self.norm_intermediate:
                        feat = FusedLayerNorm(
                            epsilon=1e-6, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"norm_intermediate_{i}",
                        )(feat).astype(self.dtype)
                    intermediates.append(
                        feat.reshape(b, v, gh, gw, self.dim))
                continue
            blk = block_cls(
                self.dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                layerscale_init=self.layerscale_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.global_attn_impl if is_global else self.frame_attn_impl,
                entropy_scaling_base=(
                    p if (self.use_entropy_scaling and is_global) else None
                ),
                mlp_token_chunk=self.mlp_token_chunk,
                name=f"layers_{i}",
            )
            if is_global:
                n_tot = v * p + tok.shape[1]
                pieces = [x.reshape(b, v * p, self.dim), tok]
                n_valid = None
                if self.pad_tokens_to:
                    mult = self.pad_tokens_to
                    n_pad = -(-n_tot // mult) * mult
                    if n_pad != n_tot:
                        # pad INSIDE the concat: one copy, not concat+pad
                        pieces.append(jnp.zeros(
                            (b, n_pad - n_tot, self.dim), x.dtype))
                        n_valid = n_tot
                flat = blk(jnp.concatenate(pieces, axis=1), None, n_valid)
                x = flat[:, : v * p].reshape(b, v, p, self.dim)
                tok = flat[:, v * p : n_tot]
            else:
                # RoPE applies in frame attention (per-view patch positions)
                x = blk(x.reshape(b * v, p, self.dim), rope, None).reshape(
                    b, v, p, self.dim
                )

            if i in self.indices:
                feat = x
                if self.norm_intermediate:
                    feat = FusedLayerNorm(
                        epsilon=1e-6, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"norm_intermediate_{i}",
                    )(feat).astype(self.dtype)
                intermediates.append(feat.reshape(b, v, gh, gw, self.dim))

        final_norm = FusedLayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )
        x = final_norm(x).astype(self.dtype)
        tok = final_norm(tok).astype(self.dtype)
        final = x.reshape(b, v, gh, gw, self.dim)
        return final, intermediates, tok


class CrossAttentionTrunk(AlternatingAttentionTrunk):
    """DUSt3R-style multi-view cross-attention trunk (the cat_ifr_dust3r
    ablation; reference MultiViewCrossAttentionTransformer, model.py:45-48).

    Each layer: per-view self-attention, then cross-attention from each view
    to the concatenation of all OTHER views' tokens. Extra global tokens are
    appended to every view's context. Two weight sets distinguish the
    reference view (branch 0) from non-reference views (branch 1), matching
    the DUSt3R two-decoder pattern generalized to N views.

    TPU-native vectorization (vs the reference's per-view Python loop,
    gathering V different contexts): every view attends to ONE shared
    key/value set — all views' tokens + the extra tokens — with a key mask
    excluding the query's own view. Softmax over masked scores equals
    softmax over the gathered subset exactly, so the result is identical,
    but the graph is O(1) in V (one vmapped block per weight set per layer)
    and the V=24 training config of cat_ifr_dust3r compiles."""

    @nn.compact
    def __call__(self, features, extra_tokens, view_indices=None):
        from .croco import DecoderBlock

        b, v, gh, gw, _ = features.shape
        p = gh * gw
        t = extra_tokens.shape[1]
        x = features.reshape(b, v, p, self.input_embed_dim)
        proj = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")
        x = proj(x.astype(self.dtype))
        tok = proj(extra_tokens.astype(self.dtype))

        # key j belongs to view j//p; extra tokens (view id -1) always attend
        key_view = jnp.concatenate(
            [jnp.repeat(jnp.arange(v), p), jnp.full((t,), -1, jnp.int32)]
        )
        # (V, V*P + T): True = attendable; row vi excludes view vi's keys
        other_mask = key_view[None, :] != jnp.arange(v)[:, None]

        # Non-ref branch: ONE weight set applied to all views 1..V-1 at once
        # (flax vmap over the view axis, params shared).
        vmapped_block = nn.vmap(
            DecoderBlock,
            in_axes=(1, None, 0),
            out_axes=1,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )

        intermediates = []
        for i in range(self.depth):
            ref_blk = DecoderBlock(self.dim, self.num_heads,
                                   mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   attn_impl=self.global_attn_impl,
                                   name=f"ref_layers_{i}")
            other_blk = vmapped_block(self.dim, self.num_heads,
                                      mlp_ratio=self.mlp_ratio,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      attn_impl=self.global_attn_impl,
                                      name=f"layers_{i}")
            ctx = jnp.concatenate([x.reshape(b, v * p, self.dim), tok], axis=1)
            x_ref = ref_blk(x[:, 0], ctx, key_mask=other_mask[0])
            x_rest = other_blk(x[:, 1:], ctx, other_mask[1:])
            if t:
                # the extra (scale) token must be UPDATED through the
                # layers like the other trunks do, or its output — and the
                # metric scale predicted from it — is a constant
                # independent of the input scene. It rides the ref-branch
                # weights and attends to every view's tokens (the
                # reference's cross configs never carry a scale token, so
                # this combo is this framework's extension).
                tok = ref_blk(tok, ctx, key_mask=None)
            x = jnp.concatenate([x_ref[:, None], x_rest], axis=1)
            if i in self.indices:
                feat = x
                if self.norm_intermediate:
                    feat = FusedLayerNorm(
                        epsilon=1e-6, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"norm_intermediate_{i}",
                    )(feat).astype(self.dtype)
                intermediates.append(feat.reshape(b, v, gh, gw, self.dim))

        final_norm = FusedLayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )
        x = final_norm(x).astype(self.dtype)
        tok = final_norm(tok).astype(self.dtype)
        return x.reshape(b, v, gh, gw, self.dim), intermediates, tok


class GlobalAttentionTrunk(AlternatingAttentionTrunk):
    """Every layer attends globally over all views (VGGT-global ablation,
    reference MultiViewGlobalAttentionTransformer, model.py:41-44)."""

    @nn.compact
    def __call__(self, features, extra_tokens, view_indices=None):
        b, v, gh, gw, _ = features.shape
        p = gh * gw
        x = features.reshape(b, v, p, self.input_embed_dim)
        proj = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")
        x = proj(x.astype(self.dtype))
        tok = proj(extra_tokens.astype(self.dtype))

        if self.distinguish_ref_and_non_ref_views:
            view_embed = self.param(
                "ref_nonref_embed",
                nn.initializers.truncated_normal(0.02),
                (2, self.dim),
                self.param_dtype,
            ).astype(self.dtype)
            is_ref = (jnp.arange(v) == 0).astype(self.dtype)[None, :, None, None]
            x = x + is_ref * view_embed[0] + (1.0 - is_ref) * view_embed[1]

        intermediates = []
        block_cls = (nn.remat(Block, static_argnums=(3,)) if self.remat
                     else Block)
        for i in range(self.depth):
            blk = block_cls(
                self.dim, self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, layerscale_init=self.layerscale_init,
                dtype=self.dtype, param_dtype=self.param_dtype,
                attn_impl=self.global_attn_impl,
                mlp_token_chunk=self.mlp_token_chunk, name=f"layers_{i}",
            )
            n_tot = v * p + tok.shape[1]
            pieces = [x.reshape(b, v * p, self.dim), tok]
            n_valid = None
            if self.pad_tokens_to:
                mult = self.pad_tokens_to
                n_pad = -(-n_tot // mult) * mult
                if n_pad != n_tot:
                    # pad INSIDE the concat: one copy, not concat+pad
                    pieces.append(jnp.zeros(
                        (b, n_pad - n_tot, self.dim), x.dtype))
                    n_valid = n_tot
            flat = blk(jnp.concatenate(pieces, axis=1), None, n_valid)
            x = flat[:, : v * p].reshape(b, v, p, self.dim)
            tok = flat[:, v * p : n_tot]
            if i in self.indices:
                feat = x
                if self.norm_intermediate:
                    feat = FusedLayerNorm(
                        epsilon=1e-6, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"norm_intermediate_{i}",
                    )(feat).astype(self.dtype)
                intermediates.append(feat.reshape(b, v, gh, gw, self.dim))

        final_norm = FusedLayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )
        x = final_norm(x).astype(self.dtype)
        tok = final_norm(tok).astype(self.dtype)
        return x.reshape(b, v, gh, gw, self.dim), intermediates, tok
