"""Robust-MVD benchmark driver (reference
benchmarking/rmvd_mvs_benchmark/benchmark.py).

Wires the framework's `RMVDAdaptor` into the external `rmvd` package's
evaluation API — `create_dataset(name, "mvd", input_size, root)` +
`create_evaluation("mvd", out_dir, inputs, alignment, max_source_views=7)`
then `evaluation(dataset=..., model=adaptor)` — exactly the call shape the
reference uses (benchmark.py:63-117). The package is not installed in this
environment; the import is gated so the CLI runs the day it exists, and
`--selftest` exercises the same adaptor through the self-contained
`evaluate_mvs_depth` loop instead.

Usage:
  python scripts/benchmark_rmvd.py --dataset eth3d --data-root <dir> \
      --checkpoint <ckpt> --conditioning image+intrinsics --out out/rmvd
  python scripts/benchmark_rmvd.py --selftest   # no rmvd pkg needed
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_adaptor(args):
    import jax

    from mapanything_tpu.benchmarks.rmvd import RMVDAdaptor
    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        images_only_config,
        jit_init,
    )

    if args.checkpoint:
        from mapanything_tpu.models.pretrained import from_pretrained

        model, params = from_pretrained(args.checkpoint)
    else:  # random weights: contract/selftest runs
        import jax.numpy as jnp
        import numpy as np

        from mapanything_tpu.models import GeometricInputConfig

        model = MapAnything(cfg=MapAnythingConfig(
            encoder_size="test", trunk_dim=64, trunk_depth=2,
            trunk_num_heads=2, trunk_indices=(0, 1), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        ))
        # init with the multimodal SUPERSET signature so every prior
        # encoder materializes regardless of --conditioning (bench.py
        # does the same)
        h = w = args.selftest_res
        rays = np.zeros((1, 2, h, w, 3), np.float32)
        rays[..., 2] = 1.0
        views = {
            "img": jnp.zeros((1, 2, h, w, 3), jnp.float32),
            "ray_directions_cam": jnp.asarray(rays),
            "camera_pose_quats": jnp.tile(
                jnp.asarray([0.0, 0.0, 0.0, 1.0]), (1, 2, 1)),
            "camera_pose_trans": jnp.zeros((1, 2, 3), jnp.float32),
            "is_metric_scale": jnp.ones((1, 2), dtype=bool),
        }
        params = jit_init(model, jax.random.PRNGKey(0), views,
                          GeometricInputConfig(
                              overall_prob=1.0, dropout_prob=0.0,
                              ray_dirs_prob=1.0, depth_prob=0.0,
                              cam_prob=1.0))
        del images_only_config
    adaptor = RMVDAdaptor(
        model, params,
        inference_conditioning=args.conditioning,
        evaluate_single_view=args.views == "single_view",
    )
    adaptor.name = args.name
    return adaptor


def run_external(args) -> dict:
    """Drive the real `rmvd` harness (reference benchmark.py:63-121)."""
    from rmvd import create_dataset, create_evaluation  # import-gated

    w, h = args.resolution
    root = os.path.join(args.data_root, args.dataset)
    dataset = create_dataset(args.dataset, "mvd", input_size=(h, w),
                             root=root)
    inputs = []
    if "intrinsics" in args.conditioning:
        inputs.append("intrinsics")
    if "pose" in args.conditioning:
        inputs.append("poses")
    evaluation = create_evaluation(
        evaluation_type="mvd",
        out_dir=args.out,
        inputs=inputs,
        alignment=None if args.alignment == "none" else args.alignment,
        eval_uncertainty=False,
        max_source_views=7,  # reference benchmark.py:88 (MVSAnywhere)
    )
    adaptor = build_adaptor(args)
    results = evaluation(dataset=dataset, model=adaptor)
    setting = {k: v for k, v in vars(args).items() if k != "func"}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "setting.json"), "w") as f:
        json.dump(setting, f, indent=1)
    return {"results": repr(results)}


def run_selftest(args) -> dict:
    """Adaptor-contract run through the self-contained evaluation loop."""
    import numpy as np

    from mapanything_tpu.benchmarks.rmvd import evaluate_mvs_depth

    adaptor = build_adaptor(args)
    rng = np.random.default_rng(0)
    h = w = args.selftest_res
    K = np.array([[[w / 2.0, 0, w / 2], [0, w / 2.0, h / 2], [0, 0, 1]]],
                 np.float32)
    samples = []
    for _ in range(2):
        imgs = [rng.integers(0, 255, size=(1, 3, h, w)).astype(np.uint8)
                for _ in range(2)]
        samples.append({
            "images": imgs,
            "keyview_idx": 0,
            "gt_depth": rng.uniform(1, 4, size=(h, w)).astype(np.float32),
            "intrinsics": [K, K],
            "poses": [np.eye(4, dtype=np.float32)[None]] * 2,
        })
    metrics = evaluate_mvs_depth(adaptor, samples)
    assert np.isfinite(metrics["depth_abs_rel"])
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="eth3d",
                    help="rmvd dataset name (eth3d, kitti, scannet, ...)")
    ap.add_argument("--data-root", default="",
                    help="external_benchmark_data_root (benchmark.py:58)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--name", default="mapanything_tpu")
    ap.add_argument("--conditioning", default="image",
                    choices=("image", "image+intrinsics",
                             "image+intrinsics+pose"))
    ap.add_argument("--views", default="multi_view",
                    choices=("multi_view", "single_view"))
    ap.add_argument("--alignment", default="median",
                    help="rmvd alignment mode or 'none'")
    ap.add_argument("--resolution", type=int, nargs=2, default=(518, 384),
                    metavar=("W", "H"))
    ap.add_argument("--out", default="out/rmvd")
    ap.add_argument("--selftest", action="store_true",
                    help="run the adaptor through the built-in eval loop "
                         "(no rmvd package required)")
    ap.add_argument("--selftest-res", type=int, default=56)
    args = ap.parse_args(argv)

    if args.selftest:
        out = run_selftest(args)
    else:
        try:
            import rmvd  # noqa: F401
        except ImportError:
            print("ERROR: the `rmvd` package is not installed; the external "
                  "harness cannot run. Use --selftest for the adaptor-"
                  "contract check, or `pip install rmvd` on a machine with "
                  "network access.", file=sys.stderr)
            return 2
        out = run_external(args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
