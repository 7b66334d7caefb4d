"""Patch-embed data-path experiment at the encoder shape (8, 518, 518, 3).

Candidates (same contraction, same params):
  A. production im2col + matmul (_PatchEmbedMatmul data path)
  B. row-slab sum: out = sum_j x[:, :, j] @ K[j] — every slice is a
     contiguous row-major view (gw*p*C runs), so NO transpose exists in
     the program at all; 14 matmuls of K=42.
  C. XLA conv (lax.conv_general_dilated, the pre-round-3 baseline).
Timing: fori_loop-chained reps, one host fetch (block_until_ready is a
no-op over the axon tunnel).
"""
import sys, time, os
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from jax import lax

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

B, H, W, C, P, D = 8, 518, 518, 3, 14, 1024
GH, GW = H // P, W // P
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
kern = jnp.asarray(rng.normal(size=(P, P, C, D)).astype(np.float32) * 0.02,
                   jnp.bfloat16)
bias = jnp.zeros((D,), jnp.bfloat16)
REPS = 20

def im2col(x):
    xb = x.astype(jnp.bfloat16)
    xr = xb.reshape(B, GH, P, GW, P * C)
    xr = xr.transpose(0, 1, 3, 2, 4).reshape(B * GH * GW, P * P * C)
    wm = kern.reshape(P * P * C, D)
    return (xr @ wm + bias).reshape(B, GH, GW, D)

def rowslab(x):
    # view (B, GH, P, GW, P*C): row-major, so x[:, :, j] slices contiguous
    # GW*(P*C) runs — no transpose anywhere in the program
    xb = x.astype(jnp.bfloat16).reshape(B, GH, P, GW, P * C)
    out = jnp.zeros((B, GH, GW, D), jnp.bfloat16)
    for j in range(P):
        xj = xb[:, :, j].reshape(B, GH, GW, P * C)
        kj = kern[j].reshape(P * C, D)
        out = out + xj @ kj
    return out + bias

def conv(x):
    xb = x.astype(jnp.bfloat16)
    return lax.conv_general_dilated(
        xb, kern, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

def timed(name, fn):
    @jax.jit
    def run(z):
        def body(i, acc):
            return acc + fn(z + 1e-6 * i)[0, 0, 0, :1].astype(jnp.float32)
        return lax.fori_loop(0, REPS, body, jnp.zeros((1,), jnp.float32))
    out = run(x); _ = float(out[0])
    t0 = time.time()
    for _ in range(4):
        out = run(x)
    _ = float(out[0])
    dt = (time.time() - t0) / (4 * REPS)
    print(f"{name:12s} {dt*1e3:7.3f} ms", flush=True)
    return fn(x)

a = timed("im2col", im2col)
b = timed("rowslab", rowslab)
c = timed("conv", conv)
print("max|A-B|:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
print("max|A-C|:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))))
