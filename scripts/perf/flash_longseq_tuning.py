"""Tuning sweep for the MULTI-BLOCK flash kernel at many-view lengths.

The 32/100-view wall time is dominated by the trunk's 12 global-attention
layers (94 TFLOP at 32v, 923 TFLOP at 100v of pure attention matmuls), so
every TF/s the kernel gains moves views/s almost 1:1. This sweep measures,
on the real chip:

  1. raw MXU ceilings at the two kernel matmul shapes — QK contracts over
     d=64 (half the 128-deep systolic array) and PV contracts over block_k
     with a 65-wide output — to know what fraction of peak is reachable;
  2. the production kernel across (block_q, block_k) grids;
  3. a bf16-exp2 variant (drop the fp32 upcast in the online p compute);
  4. jax's in-tree pallas flash kernel as an external comparison point.

Usage: python flash_longseq_tuning.py [32|100|both]
"""
import functools
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mapanything_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.ops.flash_attention import (  # noqa: E402
    _round_up,
    flash_attention,
    pick_block,
)

H, D = 16, 64
rng = np.random.default_rng(0)


def fetch(x):
    return float(jnp.asarray(x.reshape(-1)[0]))


def timed(fn, args, iters=3):
    out = fn(*args)
    fetch(out)  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.time() - t0) / iters


def attn_flops(n):
    return 4 * n * n * H * D


def make_qkv(n):
    shape = (1, n, H, D)
    return [
        jnp.asarray(rng.standard_normal(size=shape, dtype=np.float32) * 0.2,
                    jnp.bfloat16)
        for _ in range(3)
    ]


# ---------------------------------------------------------------- raw MXU
def mxu_ceilings(bq, bk):
    g = 16 * 16  # enough programs to saturate; the (g, bq, bk) fp probe
    # output is the big allocation (full 16*86 OOMed the 16 GB chip)
    a = jnp.asarray(rng.standard_normal(size=(g, bq, D), dtype=np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(size=(g, bk, D), dtype=np.float32),
                    jnp.bfloat16)
    p = jnp.asarray(rng.standard_normal(size=(g, bq, bk), dtype=np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(size=(g, bk, 128), dtype=np.float32),
                    jnp.bfloat16)

    qk = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t = timed(qk, (a, b))
    tf = 2 * g * bq * bk * D / t / 1e12
    print(f"raw QK   ({bq}x{D})({D}x{bk}) batched: {tf:7.1f} TF/s")

    pv = jax.jit(lambda p, v: jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t = timed(pv, (p, v))
    tf = 2 * g * bq * bk * 128 / t / 1e12
    print(f"raw PV   ({bq}x{bk})({bk}x128) batched: {tf:7.1f} TF/s")
    del a, b, p, v  # free before the next probe shape (16 GB chip)


# ------------------------------------------------- bf16-exp2 online kernel
def _kernel_bf16p(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref,
                  *, scale: float, d: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale * 1.4426950408889634, q_ref.dtype)
    s_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(s_dtype)
    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    # exp2 directly in the S dtype (no fp32 upcast round-trip): s - m_new is
    # bf16-quantized anyway and exp2 lands in [0, 1].
    p = jnp.exp2(s - m_new.astype(s_dtype))
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:, :d] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "which"))
def flash_variant(q, k, v, block_q, block_k, which="bf16p"):
    b, n, h, d = q.shape
    kv_len = k.shape[1]
    scale = d ** -0.5
    n_pad = _round_up(n, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, target_len, extra_ones=False):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if extra_ones:
            x = jnp.concatenate(
                [x, jnp.ones((b * h, x.shape[1], 1), x.dtype)], axis=-1)
        if x.shape[1] != target_len:
            x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
        return x

    qb = to_bh(q, n_pad)
    kb = to_bh(k, kv_pad)
    vb = to_bh(v, kv_pad, extra_ones=True)
    kern = {"bf16p": _kernel_bf16p}[which]
    grid = (b * h, n_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(kern, scale=scale, d=d),
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
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


def run_shape(n_tok):
    print(f"\n===== N = {n_tok} ({n_tok // 1369} views) =====")
    qkv = make_qkv(n_tok)
    fl = attn_flops(n_tok)

    # reference correctness value from the production kernel
    base = jax.jit(flash_attention)
    t = timed(base, qkv)
    ref = base(*qkv)
    ref_val = fetch(ref)
    print(f"production default (q512 k2048 eff): {t*1000:7.1f} ms "
          f"{fl/t/1e12:6.1f} TF/s")

    # rescale/softmax-carry VPU work in the transposed kernel scales as
    # N^2 * dv / block_k (independent of block_q!), so big-bk combos are the
    # lever; tile_budget raised so the wrapper doesn't silently cap bq.
    for bq, bk in [(256, 2048), (512, 1024), (512, 2048), (512, 4096),
                   (768, 2048), (1024, 1024), (1024, 2048), (2048, 512),
                   (1024, 4096), (2048, 1024), (2048, 2048), (2048, 4096),
                   (4096, 1024), (4096, 2048), (1024, 8192), (2048, 8192)]:
        try:
            f = jax.jit(functools.partial(flash_attention,
                                          block_q=bq, block_k=bk,
                                          single_pass_max=128,
                                          tile_budget=2**24))
            t = timed(f, qkv)
            out = f(*qkv)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"prod kernel bq={bq:5d} bk={bk:5d}: {t*1000:7.1f} ms "
                  f"{fl/t/1e12:6.1f} TF/s  maxerr {err:.1e}")
        except Exception as e:
            print(f"prod kernel bq={bq:5d} bk={bk:5d}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}")

    for bq, bk in [(512, 2048), (512, 4096), (1024, 2048), (1024, 4096),
                   (2048, 2048)]:
        try:
            f = functools.partial(flash_variant, block_q=bq, block_k=bk,
                                  which="bf16p")
            t = timed(f, qkv)
            out = f(*qkv)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"bf16-exp2   bq={bq:5d} bk={bk:5d}: {t*1000:7.1f} ms "
                  f"{fl/t/1e12:6.1f} TF/s  maxerr {err:.1e}")
        except Exception as e:
            print(f"bf16-exp2   bq={bq:5d} bk={bk:5d}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}")

    # jax in-tree kernel (layout (b, h, n, d))
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention as jax_flash,
        )

        qt, kt, vt = [jnp.swapaxes(x, 1, 2) for x in qkv]
        n_pad = _round_up(n_tok, 512)
        pad = n_pad - n_tok
        if pad:
            qt, kt, vt = [jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                          for x in (qt, kt, vt)]
        bs = BlockSizes(block_q=512, block_k_major=1024, block_k=1024,
                        block_b=1)
        f = jax.jit(functools.partial(jax_flash, block_sizes=bs,
                                      sm_scale=D ** -0.5))
        t = timed(f, (qt, kt, vt))
        print(f"jax in-tree (q512 k1024):           {t*1000:7.1f} ms "
              f"{fl/t/1e12:6.1f} TF/s  (padded N={n_pad})")
    except Exception as e:
        print(f"jax in-tree: FAIL {type(e).__name__}: {str(e)[:140]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"device: {jax.devices()[0]}")
    mxu_ceilings(512, 2048)
    mxu_ceilings(1024, 2048)
    if which in ("32", "both"):
        run_shape(32 * 1369 + 1)
    if which in ("100", "both"):
        run_shape(100 * 1369 + 1)


if __name__ == "__main__":
    main()
