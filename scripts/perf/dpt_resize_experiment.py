"""DPT resize-layer lowering experiment at the headline dense-head shape.

Hypothesis: XLA lowers ConvTranspose(k=stride) as an input-dilated
convolution — for resize_0 (4x4, stride 4) that is 16 taps of work per
output pixel where exactly ONE is nonzero. The weight-identical
alternative is a plain matmul to (s*s*C_out) channels followed by a
depth-to-space reshuffle (pixel shuffle): same math, all of it on the MXU.

Candidates per layer (x: (8, 37, 37, C_in), kernel (s, s, C_in, C_out)):
  A. lax.conv_transpose (the production path via nn.ConvTranspose)
  B. matmul + depth-to-space
Also times the full DPTFeature with both paths.
"""
import sys, time, os
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from jax import lax

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

rng = np.random.default_rng(0)
REPS = 20


def timed(name, fn, x):
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
    print(f"{name:36s} {dt*1e3:7.3f} ms", flush=True)


def mk(c_in, c_out, s, gh=37, gw=37, b=8):
    x = jnp.asarray(rng.normal(size=(b, gh, gw, c_in)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(s, s, c_in, c_out)) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((c_out,), jnp.bfloat16)

    def conv_t(z):
        return lax.conv_transpose(
            z, k, strides=(s, s), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    km = k.transpose(2, 0, 1, 3).reshape(c_in, s * s * c_out)

    def matmul_d2s(z):
        bz, h, w, _ = z.shape
        y = z.reshape(bz * h * w, c_in) @ km  # (bhw, s*s*co)
        y = y.reshape(bz, h, w, s, s, c_out)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bz, h * s, w * s, c_out)
        return y + bias

    a = conv_t(x)
    bb = matmul_d2s(x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"  parity max|A-B| = {err:.2e}")
    timed(f"conv_transpose {s}x{s} C{c_in}->{c_out}", conv_t, x)
    timed(f"matmul+d2s    {s}x{s} C{c_in}->{c_out}", matmul_d2s, x)


print("== resize_0: 4x4 stride 4, 256->256 @37^2 ==")
mk(256, 256, 4)
print("== resize_1: 2x2 stride 2, 512->512 @37^2 ==")
mk(512, 512, 2)
