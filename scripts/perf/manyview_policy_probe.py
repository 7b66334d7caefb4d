"""Measure (HBM, runtime) of the many-view forward across chunking policies.

Round-4 verdict: the 32-view path pays memory-efficient costs (mlp token
chunking, dense-head chunk 4, postprocess chunk 8) unconditionally, at ~19%
MFU. This probe AOT-compiles the forward at (views, policy) combinations and
reports XLA's peak-HBM estimate BEFORE running anything (an OOM would crash
the remote TPU worker); policies whose estimate fits the budget are then
timed for real.

Usage: python manyview_policy_probe.py [views ...]   (default: 32 64 100)
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/mapanything_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import dataclasses

HBM_BUDGET_GB = 15.0  # 16 GB chip minus runtime reserves


def main():
    views_list = [int(a) for a in sys.argv[1:]] or [32, 64, 100]
    from mapanything_tpu.models import (MapAnything, MapAnythingConfig,
                                        images_only_config, jit_init)
    from mapanything_tpu.utils.inference import postprocess_outputs

    print(f"device: {jax.devices()[0]}")
    geom = images_only_config()
    rng = np.random.default_rng(0)
    base = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True,
                             scan_layers=True)

    # (label, mem_eff, dense_head_chunk, mlp_token_chunk, post_chunk)
    policies = [
        ("dense       (no chunking)", False, 4, 16384, None),
        ("head16+post16            ", True, 16, None, 16),
        ("head8+post8              ", True, 8, None, 8),
        ("current (head4 mlp16k p8)", True, 4, 16384, 8),
    ]

    params = None
    for v in views_list:
        print(f"\n===== {v} views @518 =====", flush=True)
        imgs = jnp.asarray(
            rng.standard_normal(size=(1, v, 518, 518, 3),
                                dtype=np.float32) * 0.3)
        views = {"img": imgs}
        for label, mem_eff, head_chunk, mlp_chunk, post_chunk in policies:
            cfg = dataclasses.replace(base, dense_head_chunk=head_chunk,
                                      mlp_token_chunk=mlp_chunk)
            model = MapAnything(cfg=cfg)
            if params is None:
                t0 = time.time()
                params = jit_init(model, jax.random.PRNGKey(0),
                                  {"img": imgs[:, :2]}, geom)
                print(f"init: {time.time() - t0:.1f}s", flush=True)
            fwd = jax.jit(lambda p, vw: model.apply(
                p, vw, geom, memory_efficient=mem_eff))
            post = jax.jit(
                lambda preds, im: postprocess_outputs(
                    preds, im, apply_mask=True, mask_edges=True,
                    apply_confidence_mask=True, view_chunk=post_chunk),
                donate_argnums=(0,))
            try:
                t0 = time.time()
                cfwd = fwd.lower(params, views).compile()
                t_c = time.time() - t0
                mem = cfwd.memory_analysis()
                peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                        + mem.output_size_in_bytes) / 2**30
                # postprocess peak (donated preds alias into it)
                pshape = jax.eval_shape(lambda p, vw: model.apply(
                    p, vw, geom, memory_efficient=mem_eff), params, views)
                cpost = post.lower(pshape, views["img"]).compile()
                pmem = cpost.memory_analysis()
                ppeak = (pmem.temp_size_in_bytes
                         + pmem.argument_size_in_bytes
                         + pmem.output_size_in_bytes) / 2**30
                print(f"{label}: fwd peak {peak:5.1f} GiB, post peak "
                      f"{ppeak:5.1f} GiB (compile {t_c:.0f}s)", flush=True)
            except Exception as e:
                print(f"{label}: compile FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            if max(peak, ppeak) > HBM_BUDGET_GB:
                print("  -> over budget; not timed", flush=True)
                continue
            try:
                out = cpost(cfwd(params, views), views["img"])
                _ = float(jnp.asarray(out["metric_scaling_factor"][0]))
                iters = 3 if v <= 64 else 2
                t0 = time.time()
                for _ in range(iters):
                    out = cpost(cfwd(params, views), views["img"])
                _ = float(jnp.asarray(out["metric_scaling_factor"][0]))
                dt = (time.time() - t0) / iters
                print(f"  -> e2e {dt * 1000:7.1f} ms  ({v / dt:5.1f} "
                      f"views/s)", flush=True)
                del out
            except Exception as e:
                print(f"  -> run FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
