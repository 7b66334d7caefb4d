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
    # exp2 directly in the S dtype (no fp32 up/down round-trip): s - m_new
    # is bf16-quantized anyway, exp2 lands in [0, 1], and dropping the
    # (bq, bk) fp32 intermediate measures +6% at 32/100-view lengths AND
    # halves the tile's VMEM footprint (which unlocks block_q=1024; see
    # the cap in the wrapper).
    p = jnp.exp2(s - m_new.astype(s_dtype))

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


def _flash_kernel_T(k_ref, qt_ref, vt_ref, o_ref, m_ref, acc_ref,
                    *, scale: float, d: int):
    """Transposed-layout online kernel: S^T = K Q^T, acc^T = V^T P^T.

    Why: with H=16, D=64 heads, BOTH matmuls of the row-major kernel run
    the 128x128 MXU at half rate — QK contracts over d=64 (half the
    systolic depth) and PV's output is d+1=65 lanes (half the lane width) —
    capping it at ~98 TF/s; the measured no-softmax variant hits 79
    (scripts/perf/flash_bottleneck_probe.py). Transposing flips PV to
    (d_pad, bk) x (bk, bq): FULL bk-deep contraction and FULL bq-lane
    output, lifting the balanced ceiling to ~131 TF/s. QK keeps its
    structural d=64 half-rate either way. The softmax reductions become
    sublane-axis reductions; m/alpha live as (1, bq) lane vectors.

    vt carries the ones ROW at index d (rows > d are zero padding to the
    16-sublane multiple), so column d of the accumulator is the running
    softmax sum, exactly like the row-major kernels' ones-column.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = qt_ref[0] * jnp.asarray(scale * 1.4426950408889634, qt_ref.dtype)
    s_dtype = jnp.bfloat16 if qt_ref.dtype == jnp.bfloat16 else jnp.float32
    # (bk, d) x (d, bq) -> (bk, bq); contraction d=64 (the structural half)
    s = jax.lax.dot_general(
        k_ref[0], qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(s_dtype)

    m_prev = m_ref[:1]  # (1, bq)
    m_cur = jnp.max(s, axis=0, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)  # (1, bq) fp32
    p = jnp.exp2(s - m_new.astype(s_dtype))  # (bk, bq)
    # (d_pad, bk) x (bk, bq): full-depth contraction, full-lane output
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = acc_ref[d:d + 1, :]  # (1, bq) running softmax sum
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:d, :] / safe_l).astype(o_ref.dtype)


def _flash_kernel_1pass_T(k_ref, qt_ref, vt_ref, o_ref, *, scale: float,
                          d: int):
    """Transposed single k-block kernel (see _flash_kernel_T for why the
    transposed layout doubles the PV matmul's MXU rate). One-shot softmax:
    no carry scratch, reductions run along the sublane axis."""
    qt = qt_ref[0] * jnp.asarray(scale * 1.4426950408889634, qt_ref.dtype)
    s_dtype = jnp.bfloat16 if qt_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        k_ref[0], qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(s_dtype)  # (bk, bq)
    m = jnp.max(s, axis=0, keepdims=True)  # (1, bq)
    p = jnp.exp2(s - m)
    acc = jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dv, bq); row d is the softmax row sum
    l = acc[d:d + 1, :]
    o_ref[0] = (acc[:d, :] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


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
                     "n_valid", "onepass_t", "tile_budget"),
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
    onepass_t: bool = True,
    tile_budget: int | None = None,
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
        if (block_q, block_k) == (1408, 2048):
            # canonical defaults -> the measured-best blocks for the
            # transposed multi-block kernel (tall q: bq is the LANES axis
            # there, and narrow k amortizes the per-k-block rescale):
            # 90.7 TF/s at 32 views / 104.2 at 100 views vs 87.4/100.8 for
            # 1024x2048 (scripts/perf/flash_longseq_tuning.py). Explicit
            # caller blocks (tests exercising small shapes) are respected.
            block_q, block_k = 2048, 1024
        block_k = pick_block(kv_len, block_k)
        # The kernel's VMEM footprint scales with block_q x block_k. bf16
        # inputs keep the whole S/P chain in bf16 (no fp32 tile), so a
        # 2^21-element tile fits scoped VMEM; fp32 inputs carry an fp32
        # score tile and keep the smaller cap. Callers (tuning sweeps) may
        # override via tile_budget to probe larger tiles.
        if tile_budget is None:
            tile_budget = 2**21 if q.dtype == jnp.bfloat16 else 2**20
        block_q = pick_block(n, min(block_q, tile_budget // block_k))
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

    if kv_pad == block_k and not onepass_t:
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

    # Multi-block (long-sequence) path: TRANSPOSED layout. S^T = K Q^T and
    # acc^T = V^T P^T run the PV matmul at full MXU rate (see
    # _flash_kernel_T); measured +~30% over the row-major online kernel at
    # 32/100-view lengths. The q/v transposes and the output transpose are
    # one-time full-array passes (~0.3 ms at 100 views), amortized over the
    # num_k_blocks-deep grid.
    qt = jnp.swapaxes(qb, 1, 2)  # (b*h, d, n_pad)
    # v^T with the ones row at index d, rows padded to a sublane multiple
    dv = _round_up(d + 1, 16)
    vt = jnp.swapaxes(v, 1, 2).reshape(b * h, kv_len, d)
    if n_valid is not None and n_valid < kv_len:
        import numpy as _np

        col = (_np.arange(kv_len) < n_valid).astype(_np.float32)
        ones_row = jnp.broadcast_to(
            jnp.asarray(col, v.dtype)[None, :, None], (b * h, kv_len, 1))
    else:
        ones_row = jnp.ones((b * h, kv_len, 1), v.dtype)
    vt = jnp.concatenate([vt, ones_row], axis=-1)  # (b*h, kv, d+1)
    vt = jnp.swapaxes(vt, 1, 2)  # (b*h, d+1, kv)
    vt = jnp.pad(vt, ((0, 0), (0, dv - d - 1), (0, kv_pad - kv_len)))

    if kv_pad == block_k:
        # transposed single k-block: one-shot softmax, no carry scratch.
        # Cap the score tile (kv_pad x bq) to scoped VMEM — at the default
        # single_pass_max (2816) the standard blocks fit, but callers that
        # raise it (tests/probes) would otherwise stack-OOM the kernel.
        tile_budget = 2**22 if q.dtype == jnp.bfloat16 else 2**21
        bq1 = pick_block(n, max(128, min(block_q, tile_budget // kv_pad)))
        n_pad1 = _round_up(n, bq1)
        if n_pad1 > n_pad:
            qt = jnp.pad(qt, ((0, 0), (0, 0), (0, n_pad1 - n_pad)))
        elif n_pad1 < n_pad:
            qt = qt[:, :, :n_pad1]  # only garbage q pad rows are dropped
        grid = (b * h, n_pad1 // bq1)
        out = pl.pallas_call(
            functools.partial(_flash_kernel_1pass_T, scale=scale, d=d),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((1, d, bq1), lambda bh, i: (bh, 0, i)),
                pl.BlockSpec((1, dv, block_k), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, d, bq1), lambda bh, i: (bh, 0, i)),
            out_shape=jax.ShapeDtypeStruct((b * h, d, n_pad1), q.dtype),
            interpret=interpret,
        )(kb, qt, vt)
        out = jnp.swapaxes(out, 1, 2)[:, :n].reshape(b, h, n, d)
        return jnp.swapaxes(out, 1, 2)

    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_T, scale=scale, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, dv, block_k), lambda bh, i, j: (bh, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, n_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),  # running max (row 0)
            # transposed accumulator; row d carries the softmax row sum
            pltpu.VMEM((dv, block_q), jnp.float32),
        ],
        interpret=interpret,
    )(kb, qt, vt)

    out = jnp.swapaxes(out, 1, 2)[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)
