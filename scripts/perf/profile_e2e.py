"""Per-stage device profile of the flagship forward over the axon tunnel.

jax.profiler traces over the tunnel may or may not include device ops; if
the trace is host-only, fall back to stage-by-stage timing with one fetch
per stage (each stage amortized over iters inside the measurement loop).
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

from mapanything_tpu.models import (MapAnything, MapAnythingConfig,
                                    images_only_config, jit_init)
from mapanything_tpu.utils.inference import postprocess_outputs

B, V, H, W = 4, 2, 518, 518
cfg = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True)
model = MapAnything(cfg=cfg)
rng = np.random.default_rng(0)
views = {"img": jnp.asarray(rng.normal(size=(B, V, H, W, 3)).astype(np.float32) * 0.3)}
params = jit_init(model, jax.random.PRNGKey(0), views, images_only_config())

geom = images_only_config()
fwd = jax.jit(lambda p, v: model.apply(p, v, geom))
post = jax.jit(lambda preds, imgs: postprocess_outputs(
    preds, imgs, apply_mask=True, mask_edges=True,
    apply_confidence_mask=True))


def fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf).ravel()[0]


def timed(fn, *args, iters=8):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.time() - t0) / iters


t_fwd = timed(fwd, params, views)
preds = fwd(params, views)
t_post = timed(lambda pr: post(pr, views["img"]), preds)
t_e2e = timed(lambda p, v: post(fwd(p, v), v["img"]), params, views)
print(f"forward: {t_fwd*1e3:.1f} ms  post: {t_post*1e3:.1f} ms  "
      f"e2e: {t_e2e*1e3:.1f} ms  ({B*V/t_e2e:.2f} views/s)", flush=True)

# profiler trace (inspect whether device ops appear)
try:
    with jax.profiler.trace("/tmp/jax_trace"):
        out = post(fwd(params, views), views["img"])
        fetch(out)
    print("trace written to /tmp/jax_trace", flush=True)
except Exception as e:
    print(f"profiler failed: {type(e).__name__}: {e}", flush=True)
