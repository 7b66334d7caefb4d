"""Experiment: move the softmax row-sum onto the MXU (ones-column in V).

Variant kernel: V is passed with an extra ones column (d+1); the PV dot
then yields [acc | rowsum] in one MXU op and the VPU drops its (bq, bk)
fp32 reduction. Compare against the production kernel at the two hot
shapes (encoder/frame: bh=128 N=1370; trunk-global: bh=64 N=2740).
Also sweep block_q for the trunk-global single-pass shape.
"""
import sys, time, functools
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mapanything_tpu.ops.flash_attention import (
    flash_attention, _round_up, pick_block,
)


def _kernel_1pass_sumfuse(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, d):
    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    k = k_ref[0]
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)
    if kv_len != s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(col < kv_len, 0.0, -jnp.inf).astype(s.dtype)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d+1): last col is the row sum
    l = acc[:, d:d + 1]
    o_ref[0] = (acc[:, :d] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_sumfuse(q, k, v, block_q=1408):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d ** -0.5
    block_k = _round_up(kv_len, 128)
    block_q = pick_block(n, block_q)
    n_pad = _round_up(n, block_q)

    def to_bh(x, target_len, extra_ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], x.shape[-1])
        if x.shape[1] != target_len:
            x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
        if extra_ones:
            ones = jnp.ones((b * h, target_len, 1), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        return x

    qb = to_bh(q, n_pad)
    kb = to_bh(k, block_k)
    vb = to_bh(v, block_k, extra_ones=True)
    grid = (b * h, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_1pass_sumfuse, scale=scale, kv_len=kv_len,
                          d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
    )(qb, kb, vb)
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


def timeit(fn, *args, iters=30, **kw):
    # honest timing over the tunnel: lax.scan-free but amortized via
    # repeated dispatch + ONE final fetch
    out = fn(*args, **kw)
    _ = np.asarray(out[0, 0, 0, 0])
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args, **kw)
    _ = np.asarray(out[0, 0, 0, 0])
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("encoder b8", (8, 1370, 16, 64), 1370),
        ("global b4", (4, 2740, 16, 64), 2740),
    ]
    for name, qshape, kvn in shapes:
        b, n, h, d = qshape
        q = jnp.asarray(rng.normal(size=qshape).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, kvn, h, d)).astype(np.float32),
                        jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, kvn, h, d)).astype(np.float32),
                        jnp.bfloat16)
        base = timeit(flash_attention, q, k, v)
        fuse = timeit(flash_sumfuse, q, k, v)
        # correctness
        o1 = np.asarray(flash_attention(q, k, v), np.float32)
        o2 = np.asarray(flash_sumfuse(q, k, v), np.float32)
        err = np.max(np.abs(o1 - o2))
        print(f"{name}: base {base*1e3:.3f} ms  sumfuse {fuse*1e3:.3f} ms "
              f"({(base/fuse-1)*100:+.1f}%)  maxdiff {err:.2e}", flush=True)

        if "global" in name:
            for bq in (512, 704, 960, 1408):
                t = timeit(flash_sumfuse, q, k, v, block_q=bq)
                tb = timeit(flash_attention, q, k, v, block_q=bq)
                print(f"  block_q={bq}: base {tb*1e3:.3f} sumfuse "
                      f"{t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
