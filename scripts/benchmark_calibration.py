"""Calibration benchmark CLI (rebuild of bash_scripts/benchmark/calibration
+ benchmarking/calibration/benchmark.py:25-235).

Single-view ray-direction angular error (degrees) over WAI test scenes.

Example (smoke):
    python scripts/benchmark_calibration.py --wai_root /tmp/wai_scenes \
        --tiny --output_dir /tmp/calib
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
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--resolution", type=int, nargs=2, default=[56, 42])
    ap.add_argument("--num_sets", type=int, default=20,
                    help="single-view samples drawn from the test split")
    ap.add_argument("--output_dir", default="./calibration_out")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mapanything_tpu.benchmarks.calibration import (
        run_calibration_benchmark,
    )
    from mapanything_tpu.data.loader import get_test_data_loader
    from mapanything_tpu.data.wai_datasets import WAIDataset
    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        images_only_config,
        jit_init,
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
    geom_cfg = images_only_config()

    # the dataset still yields >=2-view sets; the harness keeps view 0 only
    ds = WAIDataset(
        ROOT=args.wai_root, spec=args.dataset, split="test",
        num_views=2, covisibility_thres=0.25,
        resolution=tuple(args.resolution), data_norm_type="dinov2", seed=0,
    )
    loader = get_test_data_loader(
        args.num_sets @ ds, batch_size=args.batch_size, num_workers=2)

    loader.set_epoch(0)
    first = next(iter(loader))
    views0 = {k: jnp.asarray(v) for k, v in first["views"].items()}
    if args.checkpoint:
        from mapanything_tpu.train.checkpoints import load_params

        params = load_params(args.checkpoint)
    else:
        params = jit_init(model, jax.random.PRNGKey(0), views0, geom_cfg)
        print("WARNING: random weights (no --checkpoint)")

    summary = run_calibration_benchmark(
        model, params, loader, geom_cfg,
        output_json=os.path.join(args.output_dir,
                                 f"{args.dataset}_calibration.json"),
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
