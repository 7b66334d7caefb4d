"""Component-level device timing of the flagship forward at the headline
config (B=4, V=2, 518x518): encoder / trunk / dense head / pose+scale heads
/ postprocess pieces. Each stage jitted alone, timed with a host fetch
barrier (block_until_ready is a no-op over the axon tunnel)."""
import sys, time
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
import os

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mapanything_tpu.models import (MapAnything, MapAnythingConfig,
                                    images_only_config, jit_init)
from mapanything_tpu.nn.dinov2 import DinoViT
from mapanything_tpu.nn.trunk import AlternatingAttentionTrunk
from mapanything_tpu.models.mapanything import _DenseHead
from mapanything_tpu.utils.inference import postprocess_outputs

B, V, H, W = 4, 2, 518, 518
GH, GW = H // 14, W // 14
DIM = 1024
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


@jax.jit
def _scalarize(tree):
    # device-side reduction so the completion barrier fetches 4 bytes, not
    # the full output tensor over the axon tunnel
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in
              jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")
              and jnp.issubdtype(x.dtype, jnp.number)]
    return sum(leaves[:1])


def fetch(tree):
    return float(_scalarize(tree))


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)  # one barrier: device time, dispatch overlapped
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e3:7.1f} ms", flush=True)
    return dt


# ---- encoder ---------------------------------------------------------------
enc = DinoViT(size="large", patch_size=14, dtype=jnp.bfloat16,
              fold_layerscale=True)
x_img = jnp.asarray(rng.normal(size=(B * V, H, W, 3)).astype(np.float32) * .3)
ep = jax.jit(enc.init)(key, x_img)
enc_fn = jax.jit(enc.apply)
t_enc = timed("encoder (8x518x518)", enc_fn, ep, x_img)

# patch embed alone
from flax import linen as nn


class PatchOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(DIM, (14, 14), strides=(14, 14), dtype=jnp.bfloat16,
                       name="pe")(x)


po = PatchOnly()
pp = jax.jit(po.init)(key, x_img)
t_pe = timed("patch-embed conv alone", jax.jit(po.apply), pp, x_img)

# ---- trunk -----------------------------------------------------------------
trunk = AlternatingAttentionTrunk(
    input_embed_dim=DIM, dim=DIM, depth=24, num_heads=16, indices=(11, 17),
    dtype=jnp.bfloat16)
x_tok = jnp.asarray(rng.normal(size=(B, V, GH, GW, DIM)).astype(np.float32))
tok = jnp.asarray(rng.normal(size=(B, 1, DIM)).astype(np.float32))
tp = jax.jit(trunk.init)(key, x_tok.astype(jnp.bfloat16), tok)
trunk_fn = jax.jit(lambda p, x, t: trunk.apply(p, x, t))
t_trunk = timed("trunk (24L alt, 2x1369 tok)", trunk_fn, tp,
                x_tok.astype(jnp.bfloat16), tok)

# ---- dense head ------------------------------------------------------------
cfg = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True)
dh = _DenseHead(cfg)
hooks = [jnp.asarray(rng.normal(size=(B * V, GH, GW, DIM)).astype(np.float32),
                     dtype=jnp.bfloat16) for _ in range(4)]
dp = jax.jit(lambda k, h: dh.init(k, h, (H, W)))(key, hooks)
dh_fn = jax.jit(lambda p, h: dh.apply(p, h, (H, W)))
t_dh = timed("dense head (DPT, 8 views)", dh_fn, dp, hooks)

# ---- full model + postprocess ----------------------------------------------
cfgm = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True)
model = MapAnything(cfg=cfgm)
views = {"img": jnp.asarray(
    rng.normal(size=(B, V, H, W, 3)).astype(np.float32) * 0.3)}
params = jit_init(model, key, views, images_only_config())
geom = images_only_config()
fwd = jax.jit(lambda p, v: model.apply(p, v, geom))
t_fwd = timed("FULL forward", fwd, params, views)
preds = jax.tree.map(lambda x: x, fwd(params, views))

post_full = jax.jit(lambda pr, im: postprocess_outputs(
    pr, im, apply_mask=True, mask_edges=True, apply_confidence_mask=True))
t_post = timed("postprocess full", post_full, preds, views["img"])

post_noq = jax.jit(lambda pr, im: postprocess_outputs(
    pr, im, apply_mask=True, mask_edges=True, apply_confidence_mask=False))
timed("postprocess w/o conf quantile", post_noq, preds, views["img"])

post_noe = jax.jit(lambda pr, im: postprocess_outputs(
    pr, im, apply_mask=True, mask_edges=False, apply_confidence_mask=True))
timed("postprocess w/o edges", post_noe, preds, views["img"])

post_min = jax.jit(lambda pr, im: postprocess_outputs(
    pr, im, apply_mask=True, mask_edges=False, apply_confidence_mask=False))
timed("postprocess mask only", post_min, preds, views["img"])

print(f"\nsum(enc+trunk+dense) = {(t_enc+t_trunk+t_dh)*1e3:.1f} ms "
      f"vs full fwd {t_fwd*1e3:.1f} ms; post {t_post*1e3:.1f} ms", flush=True)
