"""Isolate the flash kernel's bottleneck at long sequences.

The tuning sweep showed the production kernel plateaus ~69-73 TF/s at 32/100
views regardless of block sizes. Candidate culprits:
  (a) the d=64 QK contraction only half-fills the 128-deep MXU (hard cap
      ~98.5 TF/s on that matmul, ~131 TF/s balanced with a full-rate PV);
  (b) VPU cost of the online softmax (exp2, running max, alpha rescale);
  (c) HBM re-reads of k/v per q-block / pipeline bubbles.

This probe measures, with all timing loops running ON DEVICE inside
lax.fori_loop (the earlier raw dot_general probes were dispatch-bound over
the axon tunnel and read 3-14 TF/s for matmuls the kernel itself sustains
at 69):

  1. raw QK-shaped and PV-shaped dot_generals at kernel block shapes;
  2. kernel variants: production, no-exp (p = s, pure matmul+accumulate),
     no-max (single-pass exp without the running max / rescale).

Usage: python flash_bottleneck_probe.py
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mapanything_tpu.ops.flash_attention import _round_up

H, D = 16, 64
rng = np.random.default_rng(0)


def fetch(x):
    return float(jnp.asarray(x.reshape(-1)[0]))


# ------------------------------------------------ on-device looped matmuls
def raw_matmul_rates(bq=512, bk=2048, reps=64):
    g = 16  # heads' worth of parallel programs per iteration
    a = jnp.asarray(rng.standard_normal(size=(g, bq, D), dtype=np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(size=(g, bk, D), dtype=np.float32),
                    jnp.bfloat16)
    p = jnp.asarray(rng.standard_normal(size=(g, bq, bk), dtype=np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(size=(g, bk, 128), dtype=np.float32),
                    jnp.bfloat16)

    @jax.jit
    def qk_loop(a, b):
        def body(i, acc):
            s = jax.lax.dot_general(
                a, b, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + s[:, :1, :1] + i * 0.0
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((g, 1, 1)))

    out = qk_loop(a, b)
    fetch(out)
    t0 = time.time()
    out = qk_loop(a, b)
    fetch(out)
    dt = (time.time() - t0) / reps
    tf = 2 * g * bq * bk * D / dt / 1e12
    print(f"raw QK  ({bq}x{D})({D}x{bk}) x{g} looped: {tf:7.1f} TF/s")

    @jax.jit
    def pv_loop(p, v):
        def body(i, acc):
            o = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + o[:, :1, :1] + i * 0.0
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((g, 1, 1)))

    out = pv_loop(p, v)
    fetch(out)
    t0 = time.time()
    out = pv_loop(p, v)
    fetch(out)
    dt = (time.time() - t0) / reps
    tf = 2 * g * bq * bk * 128 / dt / 1e12
    print(f"raw PV  ({bq}x{bk})({bk}x128) x{g} looped: {tf:7.1f} TF/s")


# ------------------------------------------------------- kernel variants
def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, scale, d, mode):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        if mode != "noexp":
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if mode == "prod":  # online softmax (production semantics)
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    elif mode == "nomax":  # exp, no running max / rescale
        p = jnp.exp2(s)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:  # noexp: pure matmul + accumulate (bottom bound: matmuls alone)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            s.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _fin():
        l = acc_ref[:, d:d + 1]
        safe = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:, :d] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "mode"))
def variant(q, k, v, block_q=1024, block_k=2048, mode="prod"):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d ** -0.5
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, target, ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if ones:
            x = jnp.concatenate(
                [x, jnp.ones((b * h, x.shape[1], 1), x.dtype)], axis=-1)
        if x.shape[1] != target:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
        return x

    qb, kb = to_bh(q, n_pad), to_bh(k, kv_pad)
    vb = to_bh(v, kv_pad, ones=True)
    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, d=d, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
    )(qb, kb, vb)
    return jnp.swapaxes(out[:, :n].reshape(b, h, n, d), 1, 2)


def main():
    print(f"device: {jax.devices()[0]}")
    raw_matmul_rates(512, 2048)
    raw_matmul_rates(1024, 2048)

    n_tok = 32 * 1369 + 1
    fl = 4 * n_tok * n_tok * H * D
    shape = (1, n_tok, H, D)
    qkv = [jnp.asarray(
        rng.standard_normal(size=shape, dtype=np.float32) * 0.2,
        jnp.bfloat16) for _ in range(3)]
    for mode in ("prod", "nomax", "noexp"):
        for bq, bk in [(1024, 2048), (512, 2048)]:
            f = functools.partial(variant, block_q=bq, block_k=bk, mode=mode)
            out = f(*qkv)
            fetch(out)
            t0 = time.time()
            for _ in range(3):
                out = f(*qkv)
            fetch(out)
            dt = (time.time() - t0) / 3
            print(f"{mode:5s} bq={bq:4d} bk={bk:4d}: {dt*1000:7.1f} ms "
                  f"{fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
