"""Ring (sequence-parallel) flash attention over a device mesh axis.

The reference caps its view count by one GPU's HBM — its trunk attention is
never tiled ACROSS devices (SURVEY §5.7; reference model.py:1263-1300 chunks
only the DPT head). This module shards the token axis (views × patches)
over a mesh axis: each device holds one shard of q/k/v, computes flash
attention against the k/v shard it currently holds, and passes k/v around
the ring with `ppermute` — after `p` steps every q row has attended to the
full sequence while no device ever materialized more than 1/p of k/v.
Per-device memory is O(N/p · D), so the view ceiling scales linearly with
the ring size (the 16 GB-chip ceiling × number of chips).

Mechanics:
  * `_flash_stats` is the production multi-block flash kernel
    (ops/flash_attention.py) emitting the UNNORMALIZED accumulator plus the
    online-softmax stats (row max `m`, row sum `l`) as two extra lanes of
    the output tile — same (block_q, d+2) layout, no cross-lane transpose.
  * ring steps merge in the standard online-softmax way:
        m = max(m1, m2); acc = acc1·2^(m1−m) + acc2·2^(m2−m); same for l
    and the final output is acc / l.
  * `ring_flash_attention` is the shard_map-level function (call it inside
    `shard_map` with q/k/v sharded on `axis_name`);
    `ring_sdpa` wraps it for jit-level callers given a mesh + axis.

Numerics match single-device flash attention exactly up to the usual
reduction-order ulps (tested against ops/flash_attention.py and XLA
attention on an 8-device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from .flash_attention import _round_up, pick_block

_LANES = 128


def _flash_stats_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref,
                        *, scale: float, kv_len: int, block_k: int, d: int):
    """Multi-block flash (ops/flash_attention._flash_kernel) that finalizes
    to [unnormalized acc | m | l] in one (block_q, d+2) tile.

    V carries a ones column, so column d of the fp32 accumulator is the
    running softmax sum (same MXU row-sum fusion as the serving kernels)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)

    if kv_len % block_k != 0:
        col = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(col < kv_len, 0.0, -jnp.inf).astype(s.dtype)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2((s.astype(jnp.float32) - m_new)).astype(s_dtype)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        # fully-masked q rows (padded or an all-padded k shard) keep
        # m = -inf / l = 0; the ring merge and final divide guard them.
        out = jnp.concatenate(
            [acc_ref[:, :d],
             m_ref[:, :1].astype(jnp.float32),
             acc_ref[:, d:d + 1]],
            axis=-1,
        )
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1408,
    block_k: int = 2048,
    interpret: bool = False,
):
    """One flash pass returning (acc, m, l) in fp32.

    acc is the UNNORMALIZED output accumulator (B, N, H, D); m/l are the
    base-2-domain online-softmax stats (B, N, H). `acc / l` equals
    `flash_attention(q, k, v)`.
    """
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5

    block_k = min(pick_block(kv_len, block_k), _round_up(kv_len, 128))
    block_q = pick_block(n, min(block_q, 2**20 // block_k))
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, target_len, extra_ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if x.shape[1] != target_len:
            x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
        if extra_ones:  # MXU row-sum column (see _flash_stats_kernel)
            ones = jnp.ones((b * h, target_len, 1), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        return x

    qb = to_bh(q, n_pad)
    kb = to_bh(k, kv_pad)
    vb = to_bh(v, kv_pad, extra_ones=True)

    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_stats_kernel, scale=scale, kv_len=kv_len,
            block_k=block_k, d=d,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d + 2),
                               lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d + 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            # output accumulator; column d carries the running softmax sum
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :n].reshape(b, h, n, d + 2)
    out = jnp.swapaxes(out, 1, 2)  # (B, N, H, d+2)
    return out[..., :d], out[..., d], out[..., d + 1]


def _merge(acc1, m1, l1, acc2, m2, l2):
    """Online-softmax merge of two partial attention states."""
    m = jnp.maximum(m1, m2)
    # guard -inf - -inf (rows no shard attended to yet)
    a1 = jnp.where(m1 == -jnp.inf, 0.0, jnp.exp2(m1 - m))
    a2 = jnp.where(m2 == -jnp.inf, 0.0, jnp.exp2(m2 - m))
    return (acc1 * a1[..., None] + acc2 * a2[..., None],
            jnp.where(m == -jnp.inf, -jnp.inf, m),
            l1 * a1 + l2 * a2)


def ring_flash_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    interpret: bool = False,
):
    """Full-ring partial-attention state from per-device shards.

    Returns (acc, m, l) fp32 for the LOCAL q rows after attending to the
    FULL sequence (every k/v shard around the ring). Callers that need to
    merge more context in (e.g. replicated global tokens) merge with
    `_merge` before normalizing by `l`.
    """
    p = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    acc, m, l = flash_attention_stats(q, k, v, interpret=interpret)

    def step(_, carry):
        acc, m, l, kc, vc = carry
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        acc2, m2, l2 = flash_attention_stats(q, kc, vc, interpret=interpret)
        acc, m, l = _merge(acc, m, l, acc2, m2, l2)
        return acc, m, l, kc, vc

    acc, m, l, _, _ = jax.lax.fori_loop(0, p - 1, step, (acc, m, l, k, v))
    return acc, m, l


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-sequence attention from per-device shards (shard_map level).

    Args:
        q, k, v: the LOCAL shard (B, N/p, H, D) of arrays sharded along the
            token axis over `axis_name`; every shard must be the same size
            (pad tokens before sharding — softmax of padded q rows is
            garbage but sliced away by the caller, and padded k rows must
            be masked by the caller if their dot products could be finite;
            standard practice is to pad with zeros, which this kernel's
            scale-folded q makes harmless only for zero q — use
            `ring_sdpa` which handles padding).
        axis_name: mesh axis the sequence is sharded over.

    Returns:
        (B, N/p, H, D) — the local shard of the full attention output.
    """
    acc, m, l = ring_flash_stats(q, k, v, axis_name, interpret=interpret)
    out = acc / jnp.where(l == 0.0, 1.0, l)[..., None]
    return out.astype(q.dtype)


def attention_stats(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Exact (XLA) partial-attention state in the kernel's base-2 domain.

    For tiny key sets (the trunk's replicated scale token) where a pallas
    call would be overhead: returns (acc, m, l) fp32 mergeable with
    `ring_flash_stats` outputs via `_merge`. q, k, v are (B, N, H, D).
    """
    d = q.shape[-1]
    scale = d**-0.5 * 1.4426950408889634  # base-2 domain, scale folded in
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    m = jnp.max(s, axis=-1)  # (B, H, N)
    p = jnp.exp2(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))
    # match (B, N, H, ...) layout of flash_attention_stats
    return acc, jnp.swapaxes(m, 1, 2), jnp.swapaxes(l, 1, 2)


def ring_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    seq_axis: str = "model",
    interpret: bool = False,
) -> jnp.ndarray:
    """jit-level ring attention: shards the token axis of GLOBAL (B, N, H, D)
    arrays over `mesh[seq_axis]` and runs the ring.

    N must divide evenly by the axis size (pad + slice at the caller if
    ragged — the model's view×patch token counts are multiples of the
    patch count per view, so sharding by views is the natural choice).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = q.shape[1]
    size = mesh.shape[seq_axis]
    assert n % size == 0, (
        f"token axis {n} must divide the ring size {size}; pad views first"
    )
    kwargs = dict(
        mesh=mesh,
        in_specs=(P(None, seq_axis, None, None),) * 3,
        out_specs=P(None, seq_axis, None, None),
    )
    body = functools.partial(ring_flash_attention, axis_name=seq_axis,
                             interpret=interpret)
    try:
        fn = shard_map(body, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(body, check_rep=False, **kwargs)
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Training: ring backward (custom VJP)
# ---------------------------------------------------------------------------

def _tile_rows(x_user, b, h, n_pad, block_q):
    """(B, N, H) user-layout row stats -> the (bh, nq, 8, block_q) tiling
    the backward kernels consume (flash_attention_bwd._bwd)."""
    x = jnp.swapaxes(x_user, 1, 2).reshape(b * h, x_user.shape[1])
    if x.shape[1] != n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1])))
    x = x.reshape(b * h, n_pad // block_q, 1, block_q)
    return jnp.broadcast_to(x, (b * h, n_pad // block_q, 8, block_q))


def _pair_blocks(n, kv_len):
    """VMEM-safe block sizes for one backward pair (mirrors the caps in
    flash_attention_bwd: block_q <= 1024, tile area <= 2^20)."""
    block_q = pick_block(n, 1024)
    block_k = pick_block(kv_len, min(1024, 2**20 // block_q))
    return block_q, block_k


def _pair_bwd(q, k, v, g, lse2, delta, interpret: bool = False):
    """Per-(q shard, kv shard) flash backward with GLOBAL row stats.

    Runs the production dq/dkv kernels (via flash_attention_bwd._run_dq /
    _run_dkv) for one pair: because the probabilities are recomputed from
    the full-sequence lse (base-2 `m + log2(l)`), the pair gradients are
    exact partials that sum across kv shards (dq) / q shards (dk, dv) —
    the ring backward's merge is plain addition, no softmax
    renormalization. Partials come back fp32 so the ring's cross-shard
    accumulation rounds once at the very end, matching single-device
    backward numerics.

    q, g: (B, Nq, H, D); k, v: (B, Nk, H, D); lse2, delta: (B, Nq, H).
    Returns (dq, dk, dv) fp32 in user layout.
    """
    from .flash_attention_bwd import _prep, _run_dkv, _run_dq

    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5
    block_q, block_k = _pair_blocks(n, kv_len)
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)

    qb = _prep(q, n_pad, b, h, d)
    kb = _prep(k, kv_pad, b, h, d)
    vb = _prep(v, kv_pad, b, h, d)
    gb = _prep(g, n_pad, b, h, d)
    lse_t = _tile_rows(lse2, b, h, n_pad, block_q)
    delta_t = _tile_rows(delta, b, h, n_pad, block_q)

    kw = dict(scale=scale, n=n, kv_len=kv_len, d=d, block_q=block_q,
              block_k=block_k, out_dtype=jnp.float32, interpret=interpret)
    dk, dv = _run_dkv(qb, kb, vb, gb, lse_t, delta_t, **kw)
    dq = _run_dq(qb, kb, vb, gb, lse_t, delta_t, **kw)

    def unprep(x, orig_len):
        x = x[:, :orig_len].reshape(b, h, orig_len, d)
        return jnp.swapaxes(x, 1, 2)

    return unprep(dq, n), unprep(dk, kv_len), unprep(dv, kv_len)


def _pt_do_kernel(q_ref, k_ref, do_ref, lse_ref, out_ref, acc,
                  *, scale, block_q, block_k):
    """out_j = sum_i p_ij do_i — the dV arm of _dkv_kernel alone. Used by
    the lse-cotangent backward (dk += P^T (g*c*q)) without paying for the
    discarded ds/dk matmuls."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    qs = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    s = jax.lax.dot_general(qs, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    p = jnp.exp2(s - lse_ref[0, 0, 0][:, None]).astype(s_dtype)
    acc[:] = acc[:] + jax.lax.dot_general(
        p, do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _fin():
        out_ref[0] = acc[:]


def _pair_pt_do(q, k, do, lse2, interpret: bool = False):
    """sum_i p_ij do_i per kv row, fp32 (B, Nk, H, D)."""
    from .flash_attention_bwd import _prep

    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5
    block_q, block_k = _pair_blocks(n, kv_len)
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)
    qb = _prep(q, n_pad, b, h, d)
    kb = _prep(k, kv_pad, b, h, d)
    dob = _prep(do, n_pad, b, h, d)
    lse_t = _tile_rows(lse2, b, h, n_pad, block_q)

    bh, nq, nk = b * h, n_pad // block_q, kv_pad // block_k
    out = pl.pallas_call(
        functools.partial(_pt_do_kernel, scale=scale, block_q=block_q,
                          block_k=block_k),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda bh, j, i: (bh, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, kv_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
    )(qb, kb, dob, lse_t)
    out = out[:, :kv_len].reshape(b, h, kv_len, d)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_flash_attention_trainable(q, k, v, axis_name: str,
                                   interpret: bool = False):
    """`ring_flash_attention` with a ring backward — sequence-parallel
    attention usable in TRAINING graphs.

    Backward: each device keeps its q/do and the saved full-sequence lse
    resident, accumulates dq locally, and circulates (k, v, dk, dv)
    together around the ring — after p steps every k/v shard arrives home
    carrying its complete gradient. Per-device backward memory stays
    O(N/p · D), the same scaling as the forward.
    """
    return ring_flash_attention(q, k, v, axis_name, interpret=interpret)


def _ring_vjp_fwd(q, k, v, axis_name, interpret):
    acc, m, l = ring_flash_stats(q, k, v, axis_name, interpret=interpret)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    out = (acc / safe_l[..., None]).astype(q.dtype)
    lse2 = m + jnp.log2(safe_l)  # (B, N/p, H) base-2, FULL-sequence
    return out, (q, k, v, out, lse2)


def _ring_vjp_bwd(axis_name, interpret, res, g):
    q, k, v, out, lse2 = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (B, N/p, H)
    p = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def pair(kc, vc, dkc, dvc, dq):
        dq_p, dk_p, dv_p = _pair_bwd(q, kc, vc, g, lse2, delta,
                                     interpret=interpret)
        return dkc + dk_p, dvc + dv_p, dq + dq_p

    def step(_, carry):
        kc, vc, dkc, dvc, dq = carry
        dkc, dvc, dq = pair(kc, vc, dkc, dvc, dq)
        # rotate the kv shard WITH its gradient accumulators: after p
        # rotations each shard is home with its complete dk/dv
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        dkc = jax.lax.ppermute(dkc, axis_name, perm)
        dvc = jax.lax.ppermute(dvc, axis_name, perm)
        return kc, vc, dkc, dvc, dq

    init = (k, v, jnp.zeros_like(k, jnp.float32),
            jnp.zeros_like(v, jnp.float32), jnp.zeros_like(q, jnp.float32))
    kc, vc, dkc, dvc, dq = jax.lax.fori_loop(0, p - 1, step, init)
    # final pair: only dk/dv need the last hop home — k/v do not
    dkc, dvc, dq = pair(kc, vc, dkc, dvc, dq)
    dk = jax.lax.ppermute(dkc, axis_name, perm)
    dv = jax.lax.ppermute(dvc, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_flash_attention_trainable.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_flash_attention_with_lse(q, k, v, axis_name: str,
                                  interpret: bool = False):
    """Trainable ring attention that ALSO returns the base-2 row
    log-sum-exp — the primitive the scale-token merge needs.

    The extra-token merge (nn/layers._RingAttention) weights the ring
    output by 2^lse against the tokens' own exact stats; training through
    that merge needs d(out)/d(lse) too, so this variant's VJP accepts
    cotangents for BOTH outputs. The lse cotangent decomposes into the
    same kernel patterns the standard backward uses:

        dq_i += g_i · c · Σ_j p_ij k_j        (stats kernel with V := K)
        dk_j += c · Σ_i g_i p_ij q_i          (dkv kernel's dV arm with
                                               dO := g·q·c, delta := 0)

    with p recomputed from the saved full-sequence lse, so pair partials
    again sum exactly across shards.
    """
    out, _ = _ring_with_lse_fwd_impl(q, k, v, axis_name, interpret)
    return out


def _ring_with_lse_fwd_impl(q, k, v, axis_name, interpret):
    acc, m, l = ring_flash_stats(q, k, v, axis_name, interpret=interpret)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    # out stays fp32: the caller's merge re-weights it against the extra
    # tokens' stats in fp32, so truncating here would add a rounding
    out = acc / safe_l[..., None]
    lse2 = m + jnp.log2(safe_l)
    return (out, lse2), (q, k, v, out, lse2)


def _ring_with_lse_vjp_fwd(q, k, v, axis_name, interpret):
    return _ring_with_lse_fwd_impl(q, k, v, axis_name, interpret)


def _ring_with_lse_vjp_bwd(axis_name, interpret, res, g):
    q, k, v, out, lse2 = res
    g_out, g_lse = g
    g_out = jnp.zeros_like(out) if g_out is None else g_out
    g_lse = jnp.zeros_like(lse2) if g_lse is None else g_lse
    d = q.shape[-1]
    c2 = d**-0.5 * 1.4426950408889634  # base-2 logit scale

    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    # dO substitute for the lse part: Σ_i p_ij (g_i c q_i) = dk_extra_j
    do_lse = (g_lse[..., None] * q.astype(jnp.float32) * c2).astype(q.dtype)

    p = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def pair(kc, vc, dkc, dvc, dq):
        # standard output-cotangent part
        dq_p, dk_p, dv_p = _pair_bwd(q, kc, vc, g_out, lse2, delta,
                                     interpret=interpret)
        # lse-cotangent part, dk: dV-arm-only kernel with substituted dO
        dk_lse = _pair_pt_do(q, kc, do_lse, lse2, interpret=interpret)
        # lse-cotangent part, dq: Σ_j p_ij k_j = stats(q, kc, V:=kc)
        # rescaled from the pair max to the global lse
        acc_k, m_pair, _ = flash_attention_stats(q, kc, kc,
                                                 interpret=interpret)
        pk = acc_k * jnp.exp2(m_pair - lse2)[..., None]
        dq_lse = g_lse[..., None] * c2 * pk
        return dkc + dk_p + dk_lse, dvc + dv_p, dq + dq_p + dq_lse

    def step(_, carry):
        kc, vc, dkc, dvc, dq = carry
        dkc, dvc, dq = pair(kc, vc, dkc, dvc, dq)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        dkc = jax.lax.ppermute(dkc, axis_name, perm)
        dvc = jax.lax.ppermute(dvc, axis_name, perm)
        return kc, vc, dkc, dvc, dq

    init = (k, v, jnp.zeros_like(k, jnp.float32),
            jnp.zeros_like(v, jnp.float32), jnp.zeros_like(q, jnp.float32))
    kc, vc, dkc, dvc, dq = jax.lax.fori_loop(0, p - 1, step, init)
    # final pair: only dk/dv need the last hop home — k/v do not
    dkc, dvc, dq = pair(kc, vc, dkc, dvc, dq)
    dk = jax.lax.ppermute(dkc, axis_name, perm)
    dv = jax.lax.ppermute(dvc, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_flash_attention_with_lse.defvjp(_ring_with_lse_vjp_fwd,
                                     _ring_with_lse_vjp_bwd)
