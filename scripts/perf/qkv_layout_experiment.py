"""Experiment: hand the flash kernel (B*H, N, D)-laid-out q/k/v directly.

The production Attention passes (B, N, H, D) and flash_attention does
swapaxes+reshape+pad per tensor per call — the e2e trace shows ~19 ms of
`copy` + ~8 ms of `pad` around 48 flash calls. If the attention module
instead transposes the fused qkv output ONCE to (3, B*H, N, D), XLA may
fuse that transpose into the qkv matmul epilogue and the per-tensor
relayouts disappear. This script times a 24-block ViT-L-shaped stack both
ways on the chip.
"""
import sys
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import functools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mapanything_tpu.nn.layers import FusedLayerNorm, Mlp
from mapanything_tpu.ops.flash_attention import (
    _flash_kernel_1pass, _round_up, pick_block,
)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_bh(qb, kb, vb_ones, block_q=1408):
    """1-pass flash on pre-laid-out (B*H, N, D) inputs (+ones col on V)."""
    bh, n, d = qb.shape
    kv_len = kb.shape[1]
    block_k = _round_up(kv_len, 128)
    block_q = pick_block(n, block_q)
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        qb = jnp.pad(qb, ((0, 0), (0, n_pad - n), (0, 0)))
    if kb.shape[1] != block_k:
        kb = jnp.pad(kb, ((0, 0), (0, block_k - kv_len), (0, 0)))
        vb_ones = jnp.pad(vb_ones, ((0, 0), (0, block_k - kv_len), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_flash_kernel_1pass, scale=d**-0.5,
                          kv_len=kv_len, d=d),
        grid=(bh, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), qb.dtype),
    )(qb, kb, vb_ones)
    return out[:, :n]


class AttnBH(nn.Module):
    dim: int = 1024
    num_heads: int = 16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h, dh = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=jnp.bfloat16, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        qkv = qkv.reshape(3, b * h, n, dh)
        ones = jnp.ones((b * h, n, 1), qkv.dtype)
        o = flash_bh(qkv[0], qkv[1],
                     jnp.concatenate([qkv[2], ones], axis=-1))
        o = o.reshape(b, h, n, dh).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=jnp.bfloat16, name="proj")(o)


class AttnStd(nn.Module):
    dim: int = 1024
    num_heads: int = 16

    @nn.compact
    def __call__(self, x):
        from mapanything_tpu.ops.flash_attention import flash_attention

        b, n, c = x.shape
        h, dh = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=jnp.bfloat16, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, dh)
        o = flash_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        o = o.reshape(b, n, c)
        return nn.Dense(self.dim, dtype=jnp.bfloat16, name="proj")(o)


class Stack(nn.Module):
    attn_cls: type

    @nn.compact
    def __call__(self, x):
        for i in range(24):
            h = FusedLayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(x)
            x = x + self.attn_cls(name=f"attn_{i}")(h)
            h = FusedLayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(x)
            x = x + Mlp(4096, 1024, dtype=jnp.bfloat16, name=f"mlp_{i}")(h)
        return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 1370, 1024)).astype(np.float32),
                    jnp.bfloat16)
    outs = {}
    for name, cls in (("std(BNHD)", AttnStd), ("bh(B*H,N,D)", AttnBH)):
        m = Stack(attn_cls=cls)
        p = m.init(jax.random.PRNGKey(0), x)
        f = jax.jit(m.apply)
        out = f(p, x); _ = np.asarray(out[0, 0, 0])
        t0 = time.time()
        for _ in range(20):
            out = f(p, x)
        _ = np.asarray(out[0, 0, 0])
        dt = (time.time() - t0) / 20
        outs[name] = np.asarray(out, np.float32)
        print(f"{name}: {dt*1e3:.2f} ms / 24-block stack", flush=True)
    print("maxdiff:", np.max(np.abs(outs["std(BNHD)"] - outs["bh(B*H,N,D)"])))


if __name__ == "__main__":
    main()
