"""Single view-count ceiling probe, run as a SUBPROCESS of bench.py.

Why a subprocess: after bench has compiled+run its five sweep configs and
the train step, the loaded executables pin enough device scratch that even
a 128-view program hits RESOURCE_EXHAUSTED in-process, while the same probe
succeeds in a fresh client (measured). A fresh process also shields the
parent from allocator poisoning if the probe itself OOMs.

Prints ONE JSON line on success: {"ok": true, "view_count": V, "ms": ...}.
Exits nonzero on failure.

Ceiling context (16 GB v5e): 192 views fits (XLA memory analysis: 14.6 GiB
with the chunked postprocess + chunked-MLP memory path); 256 needs
16.4 GiB and was observed to CRASH the TPU worker, so the bench ladder
must not attempt it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    # --compile-only: lower+compile the probe's two programs (populating the
    # persistent XLA cache) WITHOUT touching device HBM, then exit. bench.py
    # launches this concurrently with its AOT pool at start-up so the real
    # end-of-run probe finds a warm cache instead of paying a ~400s fresh
    # compile inside its end-of-budget timeout window.
    compile_only = "--compile-only" in sys.argv
    cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        images_only_config,
        jit_init,
    )
    from mapanything_tpu.utils.inference import postprocess_outputs

    cfg = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True)
    model = MapAnything(cfg=cfg)
    rng = np.random.default_rng(0)
    geom = images_only_config()
    views2 = {"img": jnp.asarray(
        rng.normal(size=(1, 2, 518, 518, 3)).astype(np.float32) * 0.3)}

    fwd = jax.jit(lambda p, vw: model.apply(p, vw, geom,
                                            memory_efficient=True))
    post = jax.jit(
        lambda pr, im: postprocess_outputs(
            pr, im, apply_mask=True, mask_edges=True,
            apply_confidence_mask=True, view_chunk=8),
        donate_argnums=(0,),
    )

    if compile_only:
        params_sds = jax.eval_shape(
            lambda: jit_init(model, jax.random.PRNGKey(0), views2, geom))
        img_sds = jax.ShapeDtypeStruct((1, v, 518, 518, 3), jnp.float32)
        preds_sds = jax.eval_shape(fwd, params_sds, {"img": img_sds})
        t0 = time.time()
        fwd.lower(params_sds, {"img": img_sds}).compile()
        post.lower(preds_sds, img_sds).compile()
        print(json.dumps({"ok": True, "compile_only": True, "view_count": v,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
        return

    params = jit_init(model, jax.random.PRNGKey(0), views2, geom)
    imgs = jnp.asarray(
        rng.normal(size=(1, v, 518, 518, 3)).astype(np.float32) * 0.3)

    out = post(fwd(params, {"img": imgs}), imgs)
    _ = float(out["metric_scaling_factor"][0])  # compile + warm
    # serving consume-and-drop: release the previous scene's outputs
    # before the next dispatch (holding two generations halves the ceiling)
    out = None
    t0 = time.time()
    out = post(fwd(params, {"img": imgs}), imgs)
    _ = float(out["metric_scaling_factor"][0])
    dt = time.time() - t0
    print(json.dumps({"ok": True, "view_count": v,
                      "ms": round(dt * 1000, 1)}), flush=True)


if __name__ == "__main__":
    main()
