"""Blockwise (flash) attention Pallas TPU kernel.

The TPU-native unlock for 100+-view global attention (SURVEY.md §5.7, §7.3):
the reference never tiles its trunk attention — it relies on CUDA SDPA and
chunks only the DPT head, capping practical view counts by HBM. This kernel
computes softmax(QK^T)V with the online-softmax recurrence so the (N, N)
score matrix is never materialized: memory is O(N·D) while V·P tokens scale
to the 10^5-10^6 range.

Measured on TPU v5e (bf16, N=136900 = 100 views x 1369 patches, 16 heads,
d=64): 0.98 s per attention at 78 TFLOP/s with the default blocks — the
equivalent XLA attention would need ~1.2 TB for the score matrix.

Layout: q, k, v are (B, N, H, D) (framework-native). The kernel runs on a
(B*H, num_q_blocks, num_k_blocks) grid, k innermost, with fp32 VMEM
accumulators carried across k-blocks (the canonical TPU flash pattern —
init at j==0, finalize at j==last).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128  # min lane width for fp32 VMEM scratch


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref,
                  *, scale: float, d: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # The (bq, bk) elementwise chain on the VPU — not the matmuls — is the
    # bottleneck at ViT lengths, so every per-element op counts:
    #  * base-2 softmax domain (exp2 is cheaper than exp on the VPU),
    #  * softmax scale folded into q (bq*d elements, not bq*bk),
    #  * no padding mask at all (zero-padded k rows + zeroed ones-column
    #    in padded V rows, see below).
    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]  # (bk, d)
    # bf16 S/P for bf16 inputs (see _flash_kernel_1pass) — the fp32 m/l
    # carry scratch keeps the online-softmax recurrence exact across blocks.
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)  # (bq, bk)

    # Ragged kv tails need NO masking pass here: padded k rows are zero, so
    # their scores are 0 and m only gets clamped to >= 0 (softmax is shift-
    # invariant and the ones-column in V is zeroed on padded rows, so they
    # add nothing to the pv columns OR the row sum). This removed the
    # former additive (1, bk) -inf bias row — one full VPU pass over the
    # score tile (the S chain, not the matmuls, bounds these kernels).

    m_prev = m_ref[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2((s.astype(jnp.float32) - m_new)).astype(s_dtype)

    # V carries a ones column (d+1 wide), so the PV dot emits [pv | rowsum]
    # and column d of the fp32 accumulator IS the running softmax sum — its
    # recurrence (l_new = alpha*l_prev + sum(p)) is the same alpha-rescale
    # the pv columns need, so one multiply-add covers both and the separate
    # l scratch + (bq, bk) VPU reduction disappear.
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        # guard fully-masked rows (only possible for padded q rows)
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:, :d] / safe_l).astype(o_ref.dtype)


def _flash_kernel_1pass(q_ref, k_ref, v_ref, o_ref,
                        *, scale: float, d: int):
    """Single k-block specialization: when the whole kv fits one block
    (every encoder / frame-attention call), the online-softmax carry
    (m/l scratch, init pass, rescale multiplies, broadcast writes) is pure
    overhead — a plain one-shot softmax does strictly less VPU work.

    The softmax row-sum rides the MXU: V arrives with a ones column
    appended (d+1 wide), so the PV dot yields [acc | rowsum] in one op and
    the VPU drops its (bq, bk) fp32 reduction. The PV tile is N=d=64
    padded to 128 lanes either way, so the extra column is free MXU work
    (measured +4% encoder shape, +11% trunk-global shape). Padded kv
    columns contribute nothing to the sum: their V rows (including the
    ones column) are zero."""
    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]
    # The softmax chain is VMEM-BANDWIDTH-bound on the (bq, bk) score
    # matrix, not ALU-bound — for bf16 inputs, keeping S/P in bf16 halves
    # every pass's traffic (the max-sub cancels exactly near the peak and
    # l accumulates fp32 in the reduce). fp32 inputs keep an fp32 chain so
    # fp32 model configs lose no accuracy.
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic requires fp32 acc
    ).astype(s_dtype)  # cast in the epilogue -> S stored bf16 when serving
    # Ragged kv tails: NO bias pass — padded k rows are zero, so their
    # scores are 0; m is merely clamped to >= 0 (softmax shift-invariance)
    # and the zeroed ones-column in padded V rows keeps them out of both
    # the pv accumulation and the row sum. Saves one full (bq, bk) VPU
    # pass on the chain that bounds this kernel.
    m = jnp.max(s, axis=-1, keepdims=True)
    # exp2 directly in the S dtype: for bf16 inputs the fp32 round-trip
    # (cast up, exp2, cast down) costs a full extra (bq, bk) fp32
    # intermediate and measures ~4% slower; the result rounds identically
    # (s - m is already bf16-quantized, exp2 output lands in [0, 1]).
    p = jnp.exp2(s - m)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d+1): last column is the softmax row sum
    l = acc[:, d:d + 1]
    o_ref[0] = (acc[:, :d] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_block(n: int, target: int) -> int:
    """Largest block <= ~target that minimizes padding waste.

    Blocks must be lane-aligned (multiples of 128). Naively clamping the
    default block to round_up(n, 128) pads ragged sequences up to 2x — at
    the ViT sequence length 1370, block 1024 pads to 2048 (+49% wasted
    MXU work). Instead split n into ceil(n/target) blocks and round the
    per-block size up to 128: 1370 -> 2 blocks of 704 (pad 1408, +2.7%).
    """
    num_blocks = max(1, -(-n // target))
    return _round_up(-(-n // num_blocks), 128)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "single_pass_max",
                     "n_valid"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1408,  # single q-block at ViT-518 length (measured +7%)
    block_k: int = 2048,
    interpret: bool = False,
    single_pass_max: int = 2816,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v without materializing the score matrix.

    Args:
        q, k, v: (B, N, H, D); N may be ragged w.r.t. block sizes (padded +
            masked internally).
        single_pass_max: kv widths up to this take the 1-pass kernel (test
            knob: lower it to exercise the online multi-block kernel at
            small shapes).
        n_valid: static count of REAL tokens when the inputs arrive already
            padded to an aligned length (aligned-token mode: the caller pads
            the token axis once per stack instead of this wrapper padding
            q/k/v on every layer). CONTRACT: rows >= n_valid of k AND v must
            be exactly zero (the Attention module zeroes them in the qkv
            projection's fused epilogue); this wrapper then only masks the
            softmax row-sum ones-column so pad keys add nothing, the same
            zero-k/zero-v trick the internal padding path uses. q pad rows
            produce garbage output rows — the caller slices them off.

    Returns:
        (B, N, H, D) in q.dtype.
    """
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5

    # Prefer ONE k-block whenever the whole kv fits a VMEM-safe width:
    # the single-pass kernel then applies (no online-softmax carry). At
    # 2816 x block_q the score tile still fits comfortably; longer kv
    # (32/100-view global attention) takes the online multi-block path.
    if _round_up(kv_len, 128) <= single_pass_max:
        block_k = _round_up(kv_len, 128)
        block_q = pick_block(n, block_q)
    else:
        block_k = pick_block(kv_len, block_k)
        # The online kernel's VMEM footprint scales with block_q x block_k
        # (bf16 S and P tiles plus an fp32 exp2 intermediate): 1024 x 2048
        # overflows the 16 MB scoped-VMEM limit. Cap q-blocks so the tile
        # area stays within the proven budget — a wide k-block is preferred
        # over a tall q-block because the acc-rescale work per k-block is
        # O(n_pad * d * num_k_blocks), independent of block_q.
        block_q = pick_block(n, min(block_q, 2**20 // block_k))
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, target_len, extra_ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if extra_ones:  # MXU row-sum column (see _flash_kernel_1pass)
            # appended BEFORE row padding: padded rows carry 0 here, which
            # is what excludes them from the softmax row sum without any
            # in-kernel masking (see the ragged-tail notes in the kernels)
            if n_valid is not None and n_valid < x.shape[1]:
                # aligned-token mode: the tail rows are pre-padded garbage-
                # turned-zero (see the n_valid contract) — the ones column
                # must be 0 there too, a trace-time constant vector
                import numpy as _np

                col = (_np.arange(x.shape[1]) < n_valid).astype(_np.float32)
                ones = jnp.broadcast_to(
                    jnp.asarray(col, x.dtype)[None, :, None],
                    (b * h, x.shape[1], 1))
            else:
                ones = jnp.ones((b * h, x.shape[1], 1), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        if x.shape[1] != target_len:
            x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
        return x

    qb = to_bh(q, n_pad)
    kb = to_bh(k, kv_pad)

    if kv_pad == block_k:
        # single k-block: one-shot softmax, no carry scratch
        vb = to_bh(v, kv_pad, extra_ones=True)
        grid = (b * h, n_pad // block_q)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_1pass, scale=scale, d=d
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, d + 1), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
            interpret=interpret,
        )(qb, kb, vb)
        out = out[:, :n].reshape(b, h, n, d)
        return jnp.swapaxes(out, 1, 2)

    vb = to_bh(v, kv_pad, extra_ones=True)
    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            # output accumulator; column d carries the running softmax sum
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)
