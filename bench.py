"""Benchmark: views/sec per chip for the flagship model at 518 resolution.

Runs the full jitted inference path (forward + on-device postprocess with
mask_edges + confidence percentile — BASELINE.json config 2 semantics) on the
attached TPU chip, bf16, random weights (throughput is weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured views/sec divided by an A100 reference-throughput
estimate for the same model (see A100_BASELINE_VIEWS_PER_SEC below); the
reference repo publishes no wall-clock numbers (BASELINE.md), so the estimate
derives from the reference's own memory heuristic and typical A100 bf16
ViT-L throughput. Replace with a measured number when A100 hardware is
available.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Estimated A100 views/sec for 2-view 518x518 MapAnything inference (bf16,
# torch reference). Derivation: reference forward is ~0.95 TFLOP/view at 518²
# (ViT-L encoder ~0.37, 24-layer trunk ~0.45, DPT+heads ~0.13); A100 bf16
# peak 312 TFLOPs at ~35% MFU for this mixed conv/attention graph ≈ 110
# TFLOPs sustained ≈ 8.7 views/sec/GPU. Rounded optimistically to 10.
A100_BASELINE_VIEWS_PER_SEC = 10.0


def main():
    # persistent XLA compile cache: repeat bench runs skip the ~3 min compile
    try:
        cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

    from mapanything_tpu.models import (
        GeometricInputConfig,
        MapAnything,
        MapAnythingConfig,
        images_only_config,
    )
    from mapanything_tpu.utils.inference import postprocess_outputs

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    cfg = MapAnythingConfig(dtype=jnp.bfloat16)
    model = MapAnything(cfg=cfg)

    # B=4 pairs: the throughput-optimal batch for 2-view sets (the dense
    # N-view protocol itself batches 2-view sets, mapa_24v.sh:11)
    b, v, h, w = 4, 2, 518, 518
    rng = np.random.default_rng(0)
    views = {
        "img": jnp.asarray(rng.normal(size=(b, v, h, w, 3)).astype(np.float32) * 0.3)
    }
    geom = images_only_config()

    params = model.init(jax.random.PRNGKey(0), views, geom)

    # forward and postprocess jitted separately (fused compile is ~10x slower)
    fwd = jax.jit(lambda params, views: model.apply(params, views, geom))
    post = jax.jit(
        lambda preds, imgs: postprocess_outputs(
            preds, imgs, apply_mask=True, mask_edges=True,
            apply_confidence_mask=True,
        )
    )

    def infer_fn(params, views):
        return post(fwd(params, views), views["img"])

    # compile + warmup. NOTE: jax.block_until_ready is a no-op over the axon
    # TPU tunnel — the only honest completion barrier is a host value fetch.
    t0 = time.time()
    out = infer_fn(params, views)
    _ = float(out["metric_scaling_factor"][0])
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s", flush=True)

    # Each iteration ends with a host fetch: conservative (includes tunnel
    # RTT per call) but reproducible — chained-dispatch timings behave
    # erratically over the axon tunnel.
    t0 = time.time()
    out = infer_fn(params, views)
    _ = float(out["metric_scaling_factor"][0])
    latency_ms = (time.time() - t0) * 1000
    print(f"# p50 single-call latency (incl host RTT): {latency_ms:.0f} ms",
          flush=True)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = infer_fn(params, views)
        _ = float(out["metric_scaling_factor"][0])
    elapsed = time.time() - t0

    views_per_sec = (b * v * iters) / elapsed
    print(
        json.dumps(
            {
                "metric": "views_per_sec_per_chip_518",
                "value": round(views_per_sec, 3),
                "unit": "views/s",
                "vs_baseline": round(views_per_sec / A100_BASELINE_VIEWS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
