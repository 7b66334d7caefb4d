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

from .flash_attention import _LANES, _round_up, flash_attention, pick_block


def _fwd_with_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                         m_ref, acc_ref,
                         *, scale, kv_len, block_k, d):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Same VPU-economy tricks as the serving kernel (flash_attention.py):
    # base-2 softmax domain, softmax scale folded into q (bq*d elements
    # instead of bq*bk), ragged-kv mask as one additive (1, bk) bias row,
    # bf16 score/probability storage for bf16 inputs (the fp32 m/l carry
    # keeps the recurrence exact).
    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)
    if kv_len % block_k != 0:  # static: no mask at all for aligned kv
        # Unconditional like the serving kernel: branch-gating on the final
        # k-block with lax.cond measured slower (see flash_attention.py).
        col = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(col < kv_len, 0.0, -jnp.inf).astype(s.dtype)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s.astype(jnp.float32) - m_new).astype(s_dtype)
    # V carries a ones column: column d of the fp32 accumulator is the
    # running softmax sum (its alpha-rescale recurrence is the same one the
    # pv columns need), so the l scratch + VPU reduction disappear — see
    # flash_attention._flash_kernel.
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _fin():
        l = acc_ref[:, d:d + 1]
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:, :d] / safe_l).astype(o_ref.dtype)
        # lse kept in the base-2 domain: lse2 = m2 + log2(l)
        lse_row = m_ref[:, 0] + jnp.log2(safe_l[:, 0])  # (bq,)
        # lse is stored (bh, nq, 8, bq) to satisfy TPU block tiling
        lse_ref[0, 0] = jnp.broadcast_to(lse_row[None, :], lse_ref.shape[2:])


def _fwd_with_lse_kernel_1pass(q_ref, k_ref, v_ref, o_ref, lse_ref,
                               *, scale, kv_len, d):
    """Single k-block specialization (every frame-attention call and the
    global attention at training view counts): no online-softmax carry.
    V arrives with a ones column appended so the PV dot also yields the
    softmax row sum on the MXU (see flash_attention._flash_kernel_1pass)."""
    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)
    if kv_len != s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(col < kv_len, 0.0, -jnp.inf).astype(s.dtype)
    m = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    p = jnp.exp2(s.astype(jnp.float32) - m).astype(s_dtype)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d+1): last column is the softmax row sum
    l = acc[:, d:d + 1]
    safe_l = jnp.where(l == 0, 1.0, l)
    o_ref[0] = (acc[:, :d] / safe_l).astype(o_ref.dtype)
    lse_row = m[:, 0] + jnp.log2(safe_l[:, 0])
    lse_ref[0, 0] = jnp.broadcast_to(lse_row[None, :], lse_ref.shape[2:])


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, q_len, kv_len, block_q, block_k):
    i = pl.program_id(2)  # q-block index (inner)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]          # (bq, d)
    k = k_ref[0]          # (bk, d)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, 0]      # (bq,)
    delta = delta_ref[0, 0, 0]  # (bq,)
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # No validity mask needed (the fwd kernels had one): padded q rows are
    # ZERO rows, so do=0 and delta=0 kill their dv/dk contributions
    # (dv += p^T·0, ds = p·(0-0)); padded k cols give finite p but land in
    # dk/dv rows >= kv_len, which the caller slices off. Dropping the
    # (bq, bk) iota/compare/select saves two full VPU passes per block.
    qs = q * jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # lse is base-2 (m2 + log2 l): p = exp2(s2 - lse2) == softmax weight
    p = jnp.exp2(s - lse[:, None]).astype(s_dtype)  # (bq, bk)

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) * (dp - delta[:, None])
          * scale).astype(s_dtype)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, do_ref, v_ref, lse_ref, delta_ref,
               dq_ref, dq_acc, *, scale, q_len, kv_len, block_q, block_k):
    j = pl.program_id(2)  # kv-block index (inner)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, 0]
    delta = delta_ref[0, 0, 0]
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    # No validity mask (see _dkv_kernel): padded q rows only produce garbage
    # dq rows that the caller slices off; padded k/v cols are zero, so their
    # nonzero p entries contribute ds[col]*k[col] = 0 to dq.
    qs = q * jnp.asarray(scale * 1.4426950408889634, q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse[:, None]).astype(s_dtype)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) * (dp - delta[:, None])
          * scale).astype(s_dtype)
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _fin():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


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
        # aligned-token mode: exclude the caller's pre-padded tail rows from
        # the MXU row sum (trace-time constant; see flash_attention.to_bh)
        if n_valid is not None and n_valid < width:
            import numpy as _np

            col = (_np.arange(width) < n_valid).astype(_np.float32)
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
    if kv_pad == block_k:
        # ones column for the MXU row-sum; saved residual vb stays d-wide
        # (the bwd kernels consume plain V)
        vb_ones = jnp.concatenate([vb, ones_col(kv_pad)], axis=-1)
        grid = (b * h, n_pad // block_q)
        out, lse = pl.pallas_call(
            functools.partial(
                _fwd_with_lse_kernel_1pass, scale=scale, kv_len=kv_len, d=d
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, d + 1), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda bh, i: (bh, i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
                jax.ShapeDtypeStruct(
                    (b * h, n_pad // block_q, 8, block_q), jnp.float32
                ),
            ],
        )(qb, kb, vb_ones)
        out_user = jnp.swapaxes(out[:, :n].reshape(b, h, n, d), 1, 2)
        return out_user, (qb, kb, vb, out, lse, (b, n, h, d, kv_len, n_pad,
                                                 kv_pad, block_q, block_k))
    vb_ones = jnp.concatenate([vb, ones_col(kv_pad)], axis=-1)
    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_with_lse_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct(
                (b * h, n_pad // block_q, 8, block_q), jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            # output accumulator; column d carries the running softmax sum
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
    )(qb, kb, vb_ones)
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
    return pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, q_len=n, kv_len=kv_len,
                          block_q=block_q, block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),  # q
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),  # v
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),  # do
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, j, i: (bh, i, 0, 0)),  # lse
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, j, i: (bh, i, 0, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, kv_pad, d), out_dtype),
            jax.ShapeDtypeStruct((bh, kv_pad, d), out_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        # only pass interpret when set: tests monkeypatch pl.pallas_call
        # with a partial(interpret=True) that an explicit False would
        # override
        **({"interpret": True} if interpret else {}),
    )(qb, kb, vb, gb, lse, delta)


def _run_dq(qb, kb, vb, gb, lse, delta, *, scale, n, kv_len, d,
            block_q, block_k, out_dtype, interpret=False):
    """dQ pallas invocation on prepped arrays (see _run_dkv)."""
    bh, n_pad = qb.shape[0], qb.shape[1]
    kv_pad = kb.shape[1]
    nq, nk = n_pad // block_q, kv_pad // block_k
    return pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, q_len=n, kv_len=kv_len,
                          block_q=block_q, block_k=block_k),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),  # q
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),  # k
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),  # do
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),  # v
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
            pl.BlockSpec((1, 1, 8, block_q), lambda bh, i, j: (bh, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        **({"interpret": True} if interpret else {}),
    )(qb, kb, gb, vb, lse, delta)


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
