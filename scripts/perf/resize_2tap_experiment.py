"""Bilinear resize lowering: dense interpolation-matrix einsum (production,
ops/resize.py) vs 2-tap gather+lerp at the DPT shapes.

torch bilinear (align_corners or not, no antialias) uses at most TWO source
taps per output sample, so the (dst, src) matrix is 2-sparse per row — the
einsum pays src MACs per output where 2 suffice (148x waste at 296->518).
The candidate computes out = take(x, lo)*(1-f) + take(x, hi)*f per axis with
static numpy index/weight vectors (XLA gather with constant indices).

Shapes: the DPT regression tail (296^2x128 -> 518^2, the measured 3.5 ms
piece) and the refinenet 2x upsamples (37->74, 74->148, 148->296 @256ch).
"""
import sys, time, os
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import math

import jax, jax.numpy as jnp, numpy as np
from jax import lax

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.ops.resize import bilinear_resize, _linear_matrix

rng = np.random.default_rng(0)
REPS = 10


def taps(src, dst, align_corners):
    lo = np.zeros(dst, np.int32)
    hi = np.zeros(dst, np.int32)
    f = np.zeros(dst, np.float32)
    for i in range(dst):
        if align_corners:
            s = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            s = min(max((i + 0.5) * src / dst - 0.5, 0.0), src - 1)
        lo[i] = math.floor(s)
        hi[i] = min(lo[i] + 1, src - 1)
        f[i] = s - lo[i]
    return lo, hi, f


def resize_2tap(x, out_hw, align_corners=True):
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    dt = x.dtype
    lo, hi, f = taps(h, oh, align_corners)
    fcol = jnp.asarray(f, dt)[:, None, None]
    x = (jnp.take(x, jnp.asarray(lo), axis=-3) * (1 - fcol)
         + jnp.take(x, jnp.asarray(hi), axis=-3) * fcol)
    lo, hi, f = taps(w, ow, align_corners)
    frow = jnp.asarray(f, dt)[:, None]
    x = (jnp.take(x, jnp.asarray(lo), axis=-2) * (1 - frow)
         + jnp.take(x, jnp.asarray(hi), axis=-2) * frow)
    return x


def timed(name, fn, x, iters=4):
    @jax.jit
    def run(z0):
        def body(i, z):
            out = fn(z0 + (i * 1e-12).astype(z0.dtype))
            return z + out.reshape(-1)[0].astype(jnp.float32)
        return lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
    out = run(x); _ = float(out)
    t0 = time.time()
    for _ in range(iters):
        out = run(x)
    _ = float(out)
    dt = (time.time() - t0) / (iters * REPS)
    print(f"{name:44s} {dt*1e3:7.3f} ms", flush=True)
    return dt


for (b, s, c, d) in ((8, 296, 128, 518), (8, 148, 256, 296),
                     (8, 74, 256, 148), (8, 37, 256, 74)):
    x = jnp.asarray(rng.normal(size=(b, s, s, c)), jnp.bfloat16)
    a = bilinear_resize(x, (d, d))
    bb = resize_2tap(x, (d, d))
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"== {s}^2x{c} -> {d}^2  parity max|A-B| = {err:.2e}", flush=True)
    timed(f"matmul einsum {s}->{d} c{c}", lambda z: bilinear_resize(z, (d, d)), x)
    timed(f"2-tap gather  {s}->{d} c{c}", lambda z: resize_2tap(z, (d, d)), x)
