"""Piece-by-piece device timing of the DPT dense head at the headline shape
(8 views, 37x37 grid, 518x518 output) — find where the 27 ms goes.

Each piece is fori_loop-chained inside one jitted program with a host fetch
barrier (block_until_ready is a no-op over the axon tunnel).
"""
import sys, time, os
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from jax import lax
import flax.linen as nn

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.nn.dpt import (DPTFeature, DPTRegressionProcessor,
                                    FeatureFusionBlock, ResidualConvUnit)
from mapanything_tpu.ops.resize import bilinear_resize

B, GH, GW, D = 8, 37, 37, 1024
H = W = 518
DT = jnp.bfloat16
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
REPS = 10


def timed(name, fn, *xs, flops=None, iters=4):
    # chain iterations through the FIRST input so XLA cannot hoist fn out
    # of the loop (a non-chained body gets loop-invariant-code-motioned and
    # times one call as REPS)
    @jax.jit
    def run(z0, *rest):
        def body(i, z):
            out = fn(z, *rest)
            return z + (out.reshape(-1)[0] * 1e-12 + i * 1e-12).astype(z.dtype)
        return lax.fori_loop(0, REPS, body, z0)
    out = run(*xs); _ = float(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = run(*xs)
    _ = float(out.reshape(-1)[0])
    dt = (time.time() - t0) / (iters * REPS)
    tf = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:40s} {dt*1e3:7.3f} ms{tf}", flush=True)
    return dt


hooks = [jnp.asarray(rng.normal(size=(B, GH, GW, D)), DT) for _ in range(4)]

# full head for reference
feat_mod = DPTFeature(dtype=DT)
fp = jax.jit(feat_mod.init)(key, hooks)
t_feat = timed("DPTFeature total",
               lambda h0, *hr: feat_mod.apply(fp, [h0, *hr]), *hooks)

reg_mod = DPTRegressionProcessor(output_dim=6, dtype=DT)
x_feat = jnp.asarray(rng.normal(size=(B, GH * 8, GW * 8, 256)), DT)
rp = jax.jit(lambda k, z: reg_mod.init(k, z, (H, W)))(key, x_feat)
t_reg = timed("DPTRegressionProcessor total",
              lambda z: reg_mod.apply(rp, z, (H, W)), x_feat)

# ---- pieces -----------------------------------------------------------------
def conv(c_out, kern, stride=1, c_in=256, shape=None, name=""):
    x = jnp.asarray(rng.normal(size=(B, shape, shape, c_in)), DT)
    m = nn.Conv(c_out, (kern, kern), strides=(stride, stride),
                padding=kern // 2, dtype=DT)
    p = jax.jit(m.init)(key, x)
    fl = 2 * B * (shape // stride) ** 2 * kern * kern * c_in * c_out
    timed(f"conv{kern}x{kern} {c_in}->{c_out} @{shape}{name}",
          lambda z: m.apply(p, z), x, flops=fl)


print("\n-- projections + resizes --")
conv(256, 1, c_in=1024, shape=37, name=" proj0")
conv(1024, 1, c_in=1024, shape=37, name=" proj3")
print("-- layer_rn 3x3 --")
conv(256, 3, c_in=256, shape=148, name=" rn0")
conv(256, 3, c_in=512, shape=74, name=" rn1")
conv(256, 3, c_in=1024, shape=37, name=" rn2")
conv(256, 3, c_in=1024, shape=19, name=" rn3")
print("-- refinenet RCU convs --")
conv(256, 3, c_in=256, shape=37, name=" rcu@37")
conv(256, 3, c_in=256, shape=74, name=" rcu@74")
conv(256, 3, c_in=256, shape=148, name=" rcu@148")
print("-- tail --")
conv(128, 3, c_in=256, shape=296, name=" tail1")
x128 = jnp.asarray(rng.normal(size=(B, 296, 296, 128)), DT)
timed("bilinear 296->518 (128ch)",
      lambda z: bilinear_resize(z, (H, W), align_corners=True), x128,
      flops=2 * B * (518 * 296 + 518 * 518) * 296 * 128)
conv(64, 3, c_in=128, shape=518, name=" tail2")
x64 = jnp.asarray(rng.normal(size=(B, 518, 518, 64)), DT)
m_out = nn.Conv(6, (1, 1), dtype=jnp.float32)
p_out = jax.jit(m_out.init)(key, x64.astype(jnp.float32))
timed("conv_out 1x1 64->6 fp32 @518",
      lambda z: m_out.apply(p_out, z.astype(jnp.float32)), x64)
print("-- fusion upsample (align-corners bilinear x2) --")
x256 = jnp.asarray(rng.normal(size=(B, 148, 148, 256)), DT)
timed("bilinear 148->296 (256ch)",
      lambda z: bilinear_resize(z, (296, 296), align_corners=True), x256)
x256b = jnp.asarray(rng.normal(size=(B, 74, 74, 256)), DT)
timed("bilinear 74->148 (256ch)",
      lambda z: bilinear_resize(z, (148, 148), align_corners=True), x256b)
print("-- out_conv 1x1 after upsample --")
conv(256, 1, c_in=256, shape=296, name=" outconv@296")
conv(256, 1, c_in=256, shape=148, name=" outconv@148")

print(f"\nfeat {t_feat*1e3:.1f} + reg {t_reg*1e3:.1f} = "
      f"{(t_feat+t_reg)*1e3:.1f} ms", flush=True)
