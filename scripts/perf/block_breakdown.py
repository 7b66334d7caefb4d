"""Per-piece timing of one ViT-L block at the encoder shape (8, 1369, 1024).

Each op is iterated REPS times inside a single jitted lax.fori_loop (with a
data dependence chaining iterations) so per-call dispatch overhead over the
axon tunnel (~1.2 ms/program) doesn't swamp sub-millisecond ops.

Usage: python block_breakdown.py [block ln qkv attn proj mlp attmod]
"""
import sys, time
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import os

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import flax.linen as nn
from mapanything_tpu.nn.layers import Block, FusedLayerNorm, Mlp, Attention
from mapanything_tpu.ops.flash_attention import flash_attention

B, N, D, H = 8, 1369, 1024, 16
REPS = 24
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32),
                dtype=jnp.bfloat16)


def loop_timed(name, fn, x0, iters=4, flops=None):
    """fn: x -> y with y.shape == x0.shape; chained REPS times in-program."""
    @jax.jit
    def run(z):
        def body(i, acc):
            return fn(acc) + 1e-6 * i  # data dep, negligible cost
        return jax.lax.fori_loop(0, REPS, body, z)

    out = run(x0)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = run(x0)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / (iters * REPS)
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:30s} {dt*1e3:7.3f} ms{tf}", flush=True)
    return dt


SECTIONS = set(sys.argv[1:]) or {"block", "ln", "qkv", "attn", "proj",
                                 "mlp", "attmod"}

if "block" in SECTIONS:
    blk = Block(D, H, dtype=jnp.bfloat16)
    bp = jax.jit(blk.init)(key, x)
    loop_timed("Block", lambda z: blk.apply(bp, z), x,
               flops=B*N*D*(6*D + 2*D + 16*D) + 4*B*N*N*D)

if "ln" in SECTIONS:
    ln = FusedLayerNorm(dtype=jnp.bfloat16)
    lp = jax.jit(ln.init)(key, x)
    loop_timed("LayerNorm", lambda z: ln.apply(lp, z), x)

if "qkv" in SECTIONS:
    qkv = nn.Dense(3 * D, dtype=jnp.bfloat16)
    qp = jax.jit(qkv.init)(key, x)
    loop_timed("qkv dense + fold", lambda z: (
        lambda y: y[..., :D] + y[..., D:2*D] + y[..., 2*D:]
    )(qkv.apply(qp, z)), x, flops=2*B*N*D*3*D)

if "attn" in SECTIONS:
    k_ = jnp.asarray(rng.normal(size=(B, N, H, 64)), dtype=jnp.bfloat16)
    v_ = jnp.asarray(rng.normal(size=(B, N, H, 64)), dtype=jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(B, N, H, 64)), dtype=jnp.bfloat16)
    loop_timed("flash attn (8,1369)",
               lambda q: flash_attention(q, k_, v_), q0,
               flops=4*B*N*N*D)

    k2 = jnp.asarray(rng.normal(size=(4, 2739, H, 64)), dtype=jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(4, 2739, H, 64)), dtype=jnp.bfloat16)
    q2 = jnp.asarray(rng.normal(size=(4, 2739, H, 64)), dtype=jnp.bfloat16)
    loop_timed("flash attn (4,2739)",
               lambda q: flash_attention(q, k2, v2), q2,
               flops=4*4*2739*2739*D)

if "proj" in SECTIONS:
    proj = nn.Dense(D, dtype=jnp.bfloat16)
    pp = jax.jit(proj.init)(key, x)
    loop_timed("proj dense (1024->1024)", lambda z: proj.apply(pp, z), x,
               flops=2*B*N*D*D)

if "mlp" in SECTIONS:
    mlp = Mlp(4 * D, D, dtype=jnp.bfloat16)
    mp = jax.jit(mlp.init)(key, x)
    loop_timed("mlp (1024->4096->1024)", lambda z: mlp.apply(mp, z), x,
               flops=4*B*N*D*4*D)

if "attmod" in SECTIONS:
    att = Attention(D, H, dtype=jnp.bfloat16)
    ap = jax.jit(att.init)(key, x)
    loop_timed("Attention module", lambda z: att.apply(ap, z), x,
               flops=2*B*N*D*4*D + 4*B*N*N*D)
