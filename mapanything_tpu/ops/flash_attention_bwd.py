"""Backward pass for the Pallas flash attention kernel (custom VJP).

Training at the reference's 24-view curriculum puts ~33k tokens through the
global-attention layers; an XLA attention backward would materialize the
(N, N) score matrix per head (~4 GB fp32 per head at N=33k) — impossible.
These kernels recompute probabilities blockwise from the saved output and
per-row log-sum-exp, the standard flash-attention backward:

    delta = rowsum(dO * O)                       (host-side jnp)
    dV = P^T dO
    dS = P * (dO V^T - delta)
    dK = dS^T Q ;  dQ = dS K

Two kernels: a kv-major pass accumulating dK/dV and a q-major pass for dQ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _round_up, flash_attention, pick_block


def _fwd_with_lse_kernel_T(k_ref, qt_ref, vt_ref, o_ref, lse_ref,
                           m_ref, acc_ref, *, scale, d):
    """Transposed-layout online fwd-with-lse (see _flash_kernel_T in
    flash_attention.py for the MXU rate argument: PV as V^T P^T contracts
    full-depth over block_k with a full-width block_q-lane output). No
    ragged-kv bias pass: padded k rows give score 0, which only clamps the
    running max to >= 0 — softmax shift-invariance keeps both o and
    lse = m2 + log2(l) exact because the zeroed ones ROW of v^T excludes
    pads from l."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = qt_ref[0] * jnp.asarray(scale * 1.4426950408889634, qt_ref.dtype)
    s_dtype = jnp.bfloat16 if qt_ref.dtype == jnp.bfloat16 else jnp.float32
    st = jax.lax.dot_general(
        k_ref[0], qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(s_dtype)  # (bk, bq)

    m_prev = m_ref[:1]  # (1, bq)
    m_cur = jnp.max(st, axis=0, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    pt = jnp.exp2(st - m_new.astype(s_dtype))
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        vt_ref[0], pt.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _fin():
        l = acc_ref[d:d + 1, :]  # (1, bq) softmax row sum
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:d, :] / safe_l).astype(o_ref.dtype)
        lse_row = m_ref[:1] + jnp.log2(safe_l)  # (1, bq), base-2 domain
        lse_ref[0, 0] = jnp.broadcast_to(lse_row, lse_ref.shape[2:])


def _fwd_with_lse_kernel_1pass_T(k_ref, qt_ref, vt_ref, o_ref, lse_ref,
                                 *, scale, d):
    """Transposed single-k-block fwd-with-lse: one-shot softmax, no carry.
    Ragged kv handled bias-free (see _fwd_with_lse_kernel_T)."""
    qt = qt_ref[0] * jnp.asarray(scale * 1.4426950408889634, qt_ref.dtype)
    s_dtype = jnp.bfloat16 if qt_ref.dtype == jnp.bfloat16 else jnp.float32
    st = jax.lax.dot_general(
        k_ref[0], qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(s_dtype)  # (bk, bq)
    m = jnp.max(st, axis=0, keepdims=True).astype(jnp.float32)  # (1, bq)
    pt = jnp.exp2(st - m.astype(s_dtype))
    acc = jax.lax.dot_general(
        vt_ref[0], pt.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dv, bq); row d is the softmax row sum
    l = acc[d:d + 1, :]
    safe_l = jnp.where(l == 0, 1.0, l)
    o_ref[0] = (acc[:d, :] / safe_l).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log2(safe_l),
                                     lse_ref.shape[2:])


def _dkv_kernel(q_ref, qt_ref, k_ref, v_ref, do_ref, dot_ref, lse_ref,
                delta_ref, dkt_ref, dvt_ref, dkt_acc, dvt_acc,
                *, scale, q_len, kv_len, block_q, block_k):
    """dK/dV with TRANSPOSED outputs.

    With H=16/D=64 heads the natural dv = p^T do and dk = ds^T q matmuls
    fill only 64 of the MXU's 128 output lanes (half rate). Emitting the
    transposes instead — dv^T = do^T p and dk^T = q^T ds, with do^T/q^T
    streamed pre-transposed from HBM — contracts over block_q (full
    128-deep) with a block_k-lane output (full width), doubling both
    matmuls' rate. s and dp keep their structural d=64 contraction (no
    layout fixes that). The caller transposes dk^T/dv^T back (one bulk
    pass, amortized over the q-block-deep grid).
    """
    i = pl.program_id(2)  # q-block index (inner)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dkt_acc[:] = jnp.zeros_like(dkt_acc)
        dvt_acc[:] = jnp.zeros_like(dvt_acc)

    q = q_ref[0]          # (bq, d)
    k = k_ref[0]          # (bk, d)
    v = v_ref[0]
    do = do_ref[0]        # (bq, d)
    lse = lse_ref[0, 0, 0]      # (bq,)
    delta = delta_ref[0, 0, 0]  # (bq,)
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # No validity mask needed (the fwd kernels had one): padded q rows are
    # ZERO rows, so do=0 and delta=0 kill their dv/dk contributions
    # (dv^T += do^T·0-cols, ds = p·(0-0)); padded k cols give finite p but
    # land in dk/dv rows >= kv_len, which the caller slices off. Dropping
    # the (bq, bk) iota/compare/select saves two full VPU passes per block.
    qs = q * jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # lse is base-2 (m2 + log2 l): p = exp2(s2 - lse2) == softmax weight
    p = jnp.exp2(s - lse[:, None]).astype(s_dtype)  # (bq, bk)

    # dv^T (d, bk) = do^T (d, bq) x p (bq, bk): full-depth, full-lane
    dvt_acc[:] = dvt_acc[:] + jax.lax.dot_general(
        dot_ref[0], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) * (dp - delta[:, None])
          * scale).astype(s_dtype)
    # dk^T (d, bk) = q^T (d, bq) x ds (bq, bk): full-depth, full-lane
    dkt_acc[:] = dkt_acc[:] + jax.lax.dot_general(
        qt_ref[0], ds, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _fin():
        dkt_ref[0] = dkt_acc[:].astype(dkt_ref.dtype)
        dvt_ref[0] = dvt_acc[:].astype(dvt_ref.dtype)


def _dq_kernel(k_ref, qt_ref, v_ref, dot_ref, kt_ref, lse_ref, delta_ref,
               dqt_ref, dqt_acc, *, scale, q_len, kv_len, block_q, block_k):
    """dQ in the fully TRANSPOSED frame (see _flash_kernel_T for the MXU
    argument): s^T = K Qs^T and dp^T = V dO^T keep the structural d=64
    contraction, but dq^T = K^T ds^T then contracts over block_k (full
    128-deep) with a block_q-lane output — full MXU rate, vs the row-major
    dq = ds k whose d=64-lane output ran at half rate. lse/delta become
    (1, bq) lane vectors broadcast along sublanes."""
    j = pl.program_id(2)  # kv-block index (inner)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dqt_acc[:] = jnp.zeros_like(dqt_acc)

    k = k_ref[0]            # (bk, d)
    v = v_ref[0]            # (bk, d)
    dot = dot_ref[0]        # (d, bq)
    lse = lse_ref[0, 0, :1]      # (1, bq)
    delta = delta_ref[0, 0, :1]  # (1, bq)
    s_dtype = jnp.bfloat16 if k_ref.dtype == jnp.bfloat16 else jnp.float32

    # No validity mask (see _dkv_kernel): padded q cols only produce garbage
    # dq^T cols that the caller slices off; padded k/v rows are zero, so
    # their nonzero p^T entries contribute k^T[., pad] ds^T[pad, .] = 0.
    qst = qt_ref[0] * jnp.asarray(scale * 1.4426950408889634, qt_ref.dtype)
    st = jax.lax.dot_general(k, qst, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bk, bq)
    pt = jnp.exp2(st - lse).astype(s_dtype)

    dpt = jax.lax.dot_general(v, dot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (bk, bq)
    dst = (pt.astype(jnp.float32) * (dpt - delta)
           * scale).astype(s_dtype)
    # dq^T (d, bq) = k^T (d, bk) x ds^T (bk, bq): full-depth, full-lane
    dqt_acc[:] = dqt_acc[:] + jax.lax.dot_general(
        kt_ref[0], dst, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _fin():
        dqt_ref[0] = dqt_acc[:].astype(dqt_ref.dtype)


def _prep(x, target_len, b, h, d):
    x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
    if x.shape[1] != target_len:
        x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
    return x


def _fwd_with_lse(q, k, v, block_q, block_k, single_pass_max=2816,
                  n_valid=None):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5

    def ones_col(width):
        # The MXU row-sum ones column, zeroed at every non-real row: rows
        # >= kv_len are this wrapper's own padding, rows >= n_valid are the
        # caller's pre-padded tail (aligned-token mode). The transposed
        # kernels have NO -inf bias pass, so a pad row with a live ones
        # entry would leak exp2(0 - m) into the softmax sum — the zeroed
        # column (a trace-time constant) is what keeps the bias-free path
        # exact (see flash_attention.to_bh).
        valid = kv_len if n_valid is None else min(kv_len, n_valid)
        if valid < width:
            import numpy as _np

            col = (_np.arange(width) < valid).astype(_np.float32)
            return jnp.broadcast_to(
                jnp.asarray(col, v.dtype)[None, :, None], (b * h, width, 1))
        return jnp.ones((b * h, width, 1), v.dtype)
    block_q = pick_block(n, block_q)
    # Single k-block whenever the whole kv fits a VMEM-safe width — same
    # policy as serving (flash_attention.py): every frame-attention call and
    # the global attention at training view counts take the 1-pass kernel.
    # (single_pass_max is a test knob for exercising the multi-block path
    # at small shapes.)
    #
    # Unlike serving, the backward kernels materialize ~three fp32
    # (block_q, block_k) intermediates (s, p, dp in _dkv_kernel), so the
    # single-pass widening must ALSO respect a tile-area budget: 2^20
    # elements (3 x 4 MB of scoped VMEM). Without it, the flagship 2-view
    # global shape (kv=2739 -> 2816 single-pass at block_q=1024) would
    # build 32 MB of tiles and overflow VMEM — the caller's
    # min(block_k, 1024) cap alone cannot prevent that because this branch
    # overrides block_k.
    if (_round_up(kv_len, 128) <= single_pass_max
            and block_q * _round_up(kv_len, 128) <= 2**20):
        block_k = _round_up(kv_len, 128)
    else:
        block_k = pick_block(kv_len, block_k)
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)
    qb, kb, vb = (_prep(q, n_pad, b, h, d), _prep(k, kv_pad, b, h, d),
                  _prep(v, kv_pad, b, h, d))
    # TRANSPOSED-layout primal (see _fwd_with_lse_kernel_T): q^T streamed
    # (d, n_pad); v^T carries the ones ROW at index d (the MXU row-sum),
    # rows padded to a sublane multiple. Residuals stay row-major — the
    # dkv/dq kernels build their own transposed operands in _run_*.
    qt = jnp.swapaxes(qb, 1, 2)  # (bh, d, n_pad)
    dv_rows = _round_up(d + 1, 16)
    vt = jnp.concatenate([vb, ones_col(kv_pad)], axis=-1)
    vt = jnp.swapaxes(vt, 1, 2)  # (bh, d+1, kv_pad)
    vt = jnp.pad(vt, ((0, 0), (0, dv_rows - d - 1), (0, 0)))
    if kv_pad == block_k:
        grid = (b * h, n_pad // block_q)
        out_t, lse = pl.pallas_call(
            functools.partial(_fwd_with_lse_kernel_1pass_T, scale=scale, d=d),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((1, d, block_q), lambda bh, i: (bh, 0, i)),
                pl.BlockSpec((1, dv_rows, block_k), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, d, block_q), lambda bh, i: (bh, 0, i)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bh, i: (bh, i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, d, n_pad), q.dtype),
                jax.ShapeDtypeStruct(
                    (b * h, n_pad // block_q, 8, block_q), jnp.float32
                ),
            ],
        )(kb, qt, vt)
        out = jnp.swapaxes(out_t, 1, 2)  # row-major residual + user out
        out_user = jnp.swapaxes(out[:, :n].reshape(b, h, n, d), 1, 2)
        return out_user, (qb, kb, vb, out, lse, (b, n, h, d, kv_len, n_pad,
                                                 kv_pad, block_q, block_k))
    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out_t, lse = pl.pallas_call(
        functools.partial(_fwd_with_lse_kernel_T, scale=scale, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, dv_rows, block_k), lambda bh, i, j: (bh, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, n_pad), q.dtype),
            jax.ShapeDtypeStruct(
                (b * h, n_pad // block_q, 8, block_q), jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),  # running max (row 0)
            # transposed accumulator; row d carries the running softmax sum
            pltpu.VMEM((dv_rows, block_q), jnp.float32),
        ],
    )(kb, qt, vt)
    out = jnp.swapaxes(out_t, 1, 2)
    out_user = jnp.swapaxes(out[:, :n].reshape(b, h, n, d), 1, 2)
    return out_user, (qb, kb, vb, out, lse, (b, n, h, d, kv_len, n_pad,
                                             kv_pad, block_q, block_k))


def _run_dkv(qb, kb, vb, gb, lse, delta, *, scale, n, kv_len, d,
             block_q, block_k, out_dtype, interpret=False):
    """dK/dV pallas invocation on prepped (bh, ., d) arrays — shared by the
    single-device backward and the ring backward's per-pair partials."""
    bh, n_pad = qb.shape[0], qb.shape[1]
    kv_pad = kb.shape[1]
    nq, nk = n_pad // block_q, kv_pad // block_k
    # q^T/do^T streamed alongside q/do: the transposed-output matmuls (see
    # _dkv_kernel) need (d, bq) operands; one bulk host-side transpose each
    # beats an in-kernel (bq, d) tile transpose every grid step.
    qt = jnp.swapaxes(qb, 1, 2)  # (bh, d, n_pad)
    gt = jnp.swapaxes(gb, 1, 2)
    dkt, dvt = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, q_len=n, kv_len=kv_len,
                          block_q=block_q, block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),  # q
            pl.BlockSpec((1, d, block_q), lambda bh, j, i: (bh, 0, i)),  # qt
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),  # v
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),  # do
            pl.BlockSpec((1, d, block_q), lambda bh, j, i: (bh, 0, i)),  # dot
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, j, i: (bh, i, 0, 0)),  # lse
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, j, i: (bh, i, 0, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_k), lambda bh, j, i: (bh, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda bh, j, i: (bh, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, kv_pad), out_dtype),
            jax.ShapeDtypeStruct((bh, d, kv_pad), out_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, block_k), jnp.float32),
            pltpu.VMEM((d, block_k), jnp.float32),
        ],
        # only pass interpret when set: tests monkeypatch pl.pallas_call
        # with a partial(interpret=True) that an explicit False would
        # override
        **({"interpret": True} if interpret else {}),
    )(qb, qt, kb, vb, gb, gt, lse, delta)
    return jnp.swapaxes(dkt, 1, 2), jnp.swapaxes(dvt, 1, 2)


def _run_dq(qb, kb, vb, gb, lse, delta, *, scale, n, kv_len, d,
            block_q, block_k, out_dtype, interpret=False):
    """dQ pallas invocation on prepped arrays (see _run_dkv)."""
    bh, n_pad = qb.shape[0], qb.shape[1]
    kv_pad = kb.shape[1]
    nq, nk = n_pad // block_q, kv_pad // block_k
    # transposed-frame operands (see _dq_kernel): q^T/do^T as (d, n) and
    # k^T as (d, kv) — bulk host transposes amortized over the grid
    qt = jnp.swapaxes(qb, 1, 2)
    gt = jnp.swapaxes(gb, 1, 2)
    kt = jnp.swapaxes(kb, 1, 2)
    dqt = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, q_len=n, kv_len=kv_len,
                          block_q=block_q, block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),  # k
            pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),  # qt
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),  # v
            pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),  # dot
            pl.BlockSpec((1, d, block_k), lambda bh, i, j: (bh, 0, j)),  # kt
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda bh, i, j: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bh, d, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((d, block_q), jnp.float32)],
        **({"interpret": True} if interpret else {}),
    )(kb, qt, vb, gt, kt, lse, delta)
    return jnp.swapaxes(dqt, 1, 2)


def _bwd(res, g):
    qb, kb, vb, ob, lse, meta = res
    b, n, h, d, kv_len, n_pad, kv_pad, block_q, block_k = meta
    scale = d**-0.5
    gb = _prep(g, n_pad, b, h, d)
    delta = jnp.sum(gb.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    # tile delta like lse: (bh, nq, 8, block_q)
    delta = jnp.broadcast_to(
        delta.reshape(b * h, n_pad // block_q, 1, block_q),
        (b * h, n_pad // block_q, 8, block_q),
    )

    dk, dv = _run_dkv(qb, kb, vb, gb, lse, delta, scale=scale, n=n,
                      kv_len=kv_len, d=d, block_q=block_q, block_k=block_k,
                      out_dtype=qb.dtype)
    dq = _run_dq(qb, kb, vb, gb, lse, delta, scale=scale, n=n,
                 kv_len=kv_len, d=d, block_q=block_q, block_k=block_k,
                 out_dtype=qb.dtype)

    def unprep(x, orig_len):
        x = x[:, :orig_len].reshape(b, h, orig_len, d)
        return jnp.swapaxes(x, 1, 2)

    return unprep(dq, n), unprep(dk, kv_len), unprep(dv, kv_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, block_q: int = 1408,
                              block_k: int = 2048,
                              n_valid: int | None = None):
    """Flash attention with a Pallas backward pass (for training graphs).

    The primal (serving) body runs the flash kernel at the full block_q —
    one q-block at ViT-518 length (measured +7%). Under differentiation the
    fwd-with-lse / dq / dkv kernels cap block_q at 1024: their VMEM tiles
    scale with block_q x block_k (three fp32 (bq, bk) intermediates in the
    dkv kernel), and 1408 x 1408 tiles would overflow VMEM.

    n_valid (aligned-token mode, see flash_attention): requires zero k/v pad
    rows from the caller. The backward needs NO changes on top: pad-row
    output cotangents are zero by construction (every pad-row path to a real
    output runs through the caller's zero row-mask, whose backward zeroes
    the cotangents), so ds vanishes on pad q rows via dp = do·v = 0 and
    delta = 0; pad k columns contribute ds·k_pad = 0 to dq; garbage pad ROWS
    of dk/dv are zeroed by the caller's mask backward.
    """
    return flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                           n_valid=n_valid)


def _vjp_fwd(q, k, v, block_q, block_k, n_valid):
    return _fwd_with_lse(q, k, v, min(block_q, 1024), min(block_k, 1024),
                         n_valid=n_valid)


def _vjp_bwd(block_q, block_k, n_valid, res, g):
    return _bwd(res, g)


flash_attention_trainable.defvjp(_vjp_fwd, _vjp_bwd)
