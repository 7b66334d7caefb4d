"""Dense N-view benchmark CLI (rebuild of bash_scripts/benchmark/dense_n_view
+ benchmarking/dense_n_view/benchmark.py).

Sweeps (batch, views) pairs per the reference protocol
((10,2) (10,4) (10,8) (5,16) (4,24) (2,32) (1,50) (1,100) at full scale)
over WAI test scenes and writes per-set + summary JSON.

Example (smoke):
    python scripts/benchmark_dense_n_view.py --wai_root /tmp/wai_scenes \
        --tiny --views 2 4 --batch_sizes 2 1 --output_dir /tmp/bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wai_root", required=True)
    ap.add_argument("--dataset", default="eth3d")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--views", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--batch_sizes", type=int, nargs="+", default=None)
    ap.add_argument("--resolution", type=int, nargs=2, default=[56, 42])
    ap.add_argument("--num_sets", type=int, default=8,
                    help="multi-view sets per views-count")
    ap.add_argument("--output_dir", default="./benchmark_out")
    ap.add_argument("--task", default="images_only",
                    choices=["images_only", "all_priors"])
    ap.add_argument("--memory_efficient", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mapanything_tpu.benchmarks import run_dense_n_view_benchmark
    from mapanything_tpu.data.loader import get_test_data_loader
    from mapanything_tpu.data.wai_datasets import WAIDataset
    from mapanything_tpu.models import (
        jit_init,
        GeometricInputConfig,
        MapAnything,
        MapAnythingConfig,
        images_only_config,
    )

    if args.tiny:
        cfg = MapAnythingConfig(
            encoder_size="small", trunk_dim=384, trunk_depth=4,
            trunk_num_heads=6, trunk_indices=(1, 2), dpt_feature_dim=32,
            dtype=jnp.float32,
        )
    else:
        cfg = MapAnythingConfig(dtype=jnp.bfloat16)
    model = MapAnything(cfg=cfg)
    geom_cfg = (images_only_config() if args.task == "images_only"
                else GeometricInputConfig())

    batch_sizes = args.batch_sizes or [max(1, 20 // v) for v in args.views]
    assert len(batch_sizes) == len(args.views)

    params = None
    all_results = {}
    for n_views, bs in zip(args.views, batch_sizes):
        ds = WAIDataset(
            ROOT=args.wai_root, spec=args.dataset, split="test",
            num_views=n_views, covisibility_thres=0.25,
            resolution=tuple(args.resolution), data_norm_type="dinov2", seed=0,
        )
        ds_sized = args.num_sets @ ds
        loader = get_test_data_loader(ds_sized, batch_size=bs, num_workers=2)

        if params is None:
            loader.set_epoch(0)
            first = next(iter(loader))
            views0 = {k: jnp.asarray(v) for k, v in first["views"].items()}
            if args.checkpoint:
                from mapanything_tpu.train.checkpoints import load_params

                params = load_params(args.checkpoint)
            else:
                params = jit_init(model, jax.random.PRNGKey(0), views0, geom_cfg)
                print("WARNING: random weights (no --checkpoint)")

        summary = run_dense_n_view_benchmark(
            model, params, loader, geom_cfg,
            output_json=os.path.join(
                args.output_dir, f"{args.dataset}_{n_views}views.json"
            ),
            memory_efficient=args.memory_efficient,
        )
        all_results[n_views] = summary
        print(f"views={n_views}: " + json.dumps(summary))

    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(all_results, f, indent=1)
    print(f"wrote {args.output_dir}/summary.json")


if __name__ == "__main__":
    main()
