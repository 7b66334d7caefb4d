"""Attention data-path experiments at the headline shapes.

The e2e trace shows ~19 ms of layout copies + ~8 ms of pads around the
flash kernels (the price of d=64 head tiles + ragged N=1370/2739). Three
candidate removals, timed as 24-call chained stacks so dispatch overhead
amortizes:

  E1. production Block stack at N=1370 (baseline; pads 1370->1408 inside
      every flash call).
  E2. the same stack at N=1408 (pre-aligned tokens; flash skips its pad
      branch entirely). Timing-only: pad-row contents are garbage here —
      production would zero k rows via a fused mask (see notes).
  E3. single flash call reading (B, N, H, D) directly via a 4-D BlockSpec
      (1, bq, 1, d) — no swapaxes relayout at all — vs the production call.
  E4. global-layer scale-token concat/slice cost: Block on pre-concatenated
      (B, V*P+1) vs concat+Block+slice per call.
"""
import sys, time, os, functools
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.nn.layers import Block
from mapanything_tpu.ops.flash_attention import flash_attention

B, D, H = 8, 1024, 16
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)


def timed(name, fn, *xs, iters=4, reps=1):
    @jax.jit
    def run(z0, *rest):
        def body(i, z):
            out = fn(z, *rest)
            return z + (out.reshape(-1)[0] * 1e-12 + i * 1e-12).astype(z.dtype)
        return lax.fori_loop(0, reps, body, z0)
    out = run(*xs); _ = float(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = run(*xs)
    _ = float(out.reshape(-1)[0])
    dt = (time.time() - t0) / (iters * reps)
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


# ---- E1/E2: 24-block stack, ragged vs aligned tokens ------------------------
blk = Block(D, H, dtype=DT)
x1370 = jnp.asarray(rng.normal(size=(B, 1370, D)), DT)
bp = jax.jit(blk.init)(key, x1370)
t1 = timed("E1 Block stack N=1370 (ragged)", lambda z: blk.apply(bp, z),
           x1370, reps=24)
x1408 = jnp.asarray(rng.normal(size=(B, 1408, D)), DT)
t2 = timed("E2 Block stack N=1408 (aligned)", lambda z: blk.apply(bp, z),
           x1408, reps=24)
print(f"   -> per-stack delta {24*(t1-t2)*1e3:+.2f} ms "
      f"({(t1-t2)/t1*100:+.1f}%/block)", flush=True)

# global shape: 2739 ragged vs 2816 aligned (B=4)
x2739 = jnp.asarray(rng.normal(size=(4, 2739, D)), DT)
x2816 = jnp.asarray(rng.normal(size=(4, 2816, D)), DT)
t1g = timed("E1g Block global N=2739 (ragged)", lambda z: blk.apply(bp, z),
            x2739, reps=12)
t2g = timed("E2g Block global N=2816 (aligned)", lambda z: blk.apply(bp, z),
            x2816, reps=12)
print(f"   -> per-12-layer delta {12*(t1g-t2g)*1e3:+.2f} ms", flush=True)

# ---- E3: direct (B, N, H, D) BlockSpec read ---------------------------------
def _kernel_nhd(q_ref, k_ref, v_ref, o_ref, *, scale, d):
    q = q_ref[0, :, 0, :] * jnp.asarray(scale * 1.4426950408889634,
                                        q_ref.dtype)
    k = k_ref[0, :, 0, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, :, 0, :],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o_ref[0, :, 0, :] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_nhd(q, k, v, block_q=1408):
    b, n, h, d = q.shape
    scale = d ** -0.5
    n_pad = (n + block_q - 1) // block_q * block_q
    if n_pad != n:
        padw = ((0, 0), (0, n_pad - n), (0, 0), (0, 0))
        q = jnp.pad(q, padw); k = jnp.pad(k, padw); v = jnp.pad(v, padw)
    grid = (b * h, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_nhd, scale=scale, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1, d),
                         lambda bh, i: (bh // 16, i, bh % 16, 0)),
            pl.BlockSpec((1, n_pad, 1, d),
                         lambda bh, i: (bh // 16, 0, bh % 16, 0)),
            pl.BlockSpec((1, n_pad, 1, d),
                         lambda bh, i: (bh // 16, 0, bh % 16, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 1, d),
                               lambda bh, i: (bh // 16, i, bh % 16, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h, d), q.dtype),
    )(q, k, v)
    return out[:, :n]


q4 = jnp.asarray(rng.normal(size=(B, 1370, H, 64)), DT)
k4 = jnp.asarray(rng.normal(size=(B, 1370, H, 64)), DT)
v4 = jnp.asarray(rng.normal(size=(B, 1370, H, 64)), DT)
try:
    a = flash_nhd(q4, k4, v4)
    bref = flash_attention(q4, k4, v4)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                bref.astype(jnp.float32))))
    print(f"E3 parity max|nhd-prod| = {err:.2e}", flush=True)
    timed("E3 flash prod (B,N,H,D)+swapaxes",
          lambda z: flash_attention(z, k4, v4), q4, reps=8)
    timed("E3 flash nhd direct BlockSpec",
          lambda z: flash_nhd(z, k4, v4), q4, reps=8)
except Exception as e:
    print(f"E3 failed: {type(e).__name__}: {e}", flush=True)

# ---- E4: scale-token concat/slice per global layer --------------------------
xg = jnp.asarray(rng.normal(size=(4, 2738, D)), DT)
tok = jnp.asarray(rng.normal(size=(4, 1, D)), DT)


def with_concat(z, tk):
    flat = jnp.concatenate([z, tk], axis=1)
    flat = blk.apply(bp, flat)
    return flat[:, :-1] + flat[:, -1:] * 1e-12  # consume both slices


t4a = timed("E4 global layer concat+slice", with_concat, xg, tok, reps=12)
xgt = jnp.asarray(rng.normal(size=(4, 2739, D)), DT)
t4b = timed("E4 global layer pre-packed", lambda z: blk.apply(bp, z),
            xgt, reps=12)
print(f"   -> concat/slice cost over 12 layers "
      f"{12*(t4a-t4b)*1e3:+.2f} ms", flush=True)
