"""Experiment: 1-pass flash kernel with G heads per program (grid b*h/G).

Hypothesis: at ViT lengths each program's compute (~5 us) is too small to
hide Mosaic's per-step overheads; packing G heads per program amortizes
them. Measures G in {1 (current), 2, 4} at the encoder shape (8,1369,16,64)
and the trunk-global shape (4,2739,16,64)."""
import sys, time, os, functools
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mapanything_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.ops.flash_attention import flash_attention, _round_up

REPS = 24


def _kernel_g(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, d, g):
    for gi in range(g):
        q = q_ref[gi] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
        k = k_ref[gi]
        s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(s_dtype)
        if kv_len != s.shape[1]:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
            s = s + jnp.where(col < kv_len, 0.0, -jnp.inf).astype(s.dtype)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[gi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l = acc[:, d:d + 1]
        o_ref[gi] = (acc[:, :d] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g",))
def flash_g(q, k, v, g=2):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d ** -0.5
    n_pad = _round_up(n, 128)
    kv_pad = _round_up(kv_len, 128)

    def to_bh(x, target, ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if x.shape[1] != target:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
        if ones:
            x = jnp.concatenate(
                [x, jnp.ones((b * h, target, 1), x.dtype)], axis=-1)
        return x

    qb, kb = to_bh(q, n_pad), to_bh(k, kv_pad)
    vb = to_bh(v, kv_pad, ones=True)
    grid = (b * h // g,)
    out = pl.pallas_call(
        functools.partial(_kernel_g, scale=scale, kv_len=kv_len, d=d, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, n_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, kv_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, kv_pad, d + 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n_pad, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
    )(qb, kb, vb)
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


def loop_timed(name, fn, q, k, v, flops, iters=4):
    @jax.jit
    def run(z):
        return jax.lax.fori_loop(0, REPS, lambda i, acc: fn(acc, k, v), z)
    out = run(q); _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = run(q)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / (iters * REPS)
    print(f"{name:30s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
          flush=True)


rng = np.random.default_rng(0)
for (B, N) in [(8, 1369), (4, 2739)]:
    H, D = 16, 64
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), dtype=jnp.bfloat16)
    fl = 4 * B * N * N * H * D
    print(f"--- shape ({B},{N})", flush=True)
    loop_timed("current kernel", lambda qq, kk, vv: flash_attention(qq, kk, vv), q, k, v, fl)
    # correctness
    ref = flash_attention(q, k, v)
    for g in (2, 4):
        # rough VMEM estimate: g*(q+k+v+o) tiles + 2 score tiles (bf16)
        n_pad = _round_up(N, 128)
        est = g * n_pad * (64 * 2 * 3 + 65 * 2) + 2 * n_pad * n_pad * 2
        if est > 12 * 2**20:
            print(f"    g={g}: skipped (est VMEM {est/2**20:.1f} MB)",
                  flush=True)
            continue
        got = flash_g(q, k, v, g=g)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        loop_timed(f"g={g} heads/program",
                   lambda qq, kk, vv, g=g: flash_g(qq, kk, vv, g=g),
                   q, k, v, fl)
        print(f"    max abs err vs current: {err:.2e}", flush=True)
