"""Training entry point (rebuild of reference scripts/train.py + hydra tree).

Config comes from CLI flags + a dataset-mix DSL string instead of the hydra
yaml tree — the same knobs (model preset, task/geom probabilities, optimizer
schedule, dynamic view batching) with explicit arguments.

Example (tiny smoke run on synthetic WAI scenes):
    python scripts/train.py --wai_root /tmp/wai --dataset_spec \
        "8 @ WAIDataset(ROOT=wai_root, spec='eth3d', num_views=2, \
         covisibility_thres=0.25, resolution=(56, 42), seed=7)" \
        --tiny --epochs 2 --output_dir /tmp/run
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wai_root", required=True)
    ap.add_argument("--dataset_spec", required=True,
                    help="dataset mix DSL, e.g. '100 @ WAIDataset(...)'")
    ap.add_argument("--val_dataset_spec", default=None)
    ap.add_argument("--output_dir", default="./out")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--encoder_lr_scale", type=float, default=0.05)
    ap.add_argument("--warmup_steps", type=int, default=100)
    ap.add_argument("--total_steps", type=int, default=10000)
    ap.add_argument("--max_imgs_per_device", type=int, default=48)
    ap.add_argument("--accum_steps", type=int, default=1)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--print_freq", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model for smoke runs")
    ap.add_argument("--task", default="aug_training",
                    choices=["aug_training", "images_only"])
    ap.add_argument("--cpu", action="store_true", help="force CPU devices")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel width (mesh 'model' axis)")
    ap.add_argument("--single_device", action="store_true",
                    help="skip mesh sharding even with multiple devices")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # Multi-host bootstrap: no-op single-process unless coordinator env vars
    # are set (JAX_COORDINATOR_ADDRESS/... or torchrun-style MASTER_ADDR).
    from mapanything_tpu.parallel.distributed import (
        init_distributed,
        is_main_process,
    )

    dist = init_distributed()

    from mapanything_tpu.data.loader import (
        get_test_data_loader,
        get_train_data_loader,
    )
    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        aug_training_config,
        images_only_config,
    )
    from mapanything_tpu.train import (
        OptimConfig,
        TrainLoopConfig,
        build_dataset_mix,
        train,
    )

    print(f"process {dist['process_id']}/{dist['num_processes']}, "
          f"devices: {jax.devices()}")

    mesh = None
    if not args.single_device and (len(jax.devices()) > 1 or args.tp > 1):
        from mapanything_tpu.parallel import make_mesh

        mesh = make_mesh(n_model=args.tp)
        print(f"mesh: {mesh.shape}")

    dataset = build_dataset_mix(args.dataset_spec, wai_root=args.wai_root)
    # Per-DEVICE image budget: in single-controller mode one process feeds
    # every data-axis shard, so the host batch is n_data x the per-device
    # budget (multi-process mode contributes one local batch per process).
    imgs_budget = args.max_imgs_per_device
    if mesh is not None and dist["num_processes"] == 1:
        imgs_budget *= mesh.shape["data"]
    train_loader = get_train_data_loader(
        dataset, max_num_of_imgs_per_gpu=imgs_budget,
        world_size=dist["num_processes"], rank=dist["process_id"],
        num_workers=args.num_workers,
    )
    test_loaders = None
    if args.val_dataset_spec and is_main_process():
        val_ds = build_dataset_mix(args.val_dataset_spec, wai_root=args.wai_root)
        test_loaders = {"val": get_test_data_loader(val_ds, batch_size=2,
                                                    num_workers=args.num_workers)}

    if args.tiny:
        cfg = MapAnythingConfig(
            encoder_size="test", trunk_dim=64, trunk_depth=4,
            trunk_num_heads=2, trunk_indices=(1, 2), dpt_feature_dim=32,
            dpt_out_channels=(32, 32, 32, 32), dpt_hidden_dims=(16, 8),
            dtype=jnp.float32,
        )
    else:
        cfg = MapAnythingConfig(dtype=jnp.bfloat16)
    model = MapAnything(cfg=cfg)

    geom_cfg = (aug_training_config() if args.task == "aug_training"
                else images_only_config())

    train(
        model,
        train_loader,
        TrainLoopConfig(
            output_dir=args.output_dir, epochs=args.epochs,
            print_freq=args.print_freq, seed=args.seed,
        ),
        OptimConfig(
            lr=args.lr, encoder_lr_scale=args.encoder_lr_scale,
            warmup_steps=args.warmup_steps, total_steps=args.total_steps,
            accum_steps=args.accum_steps,
        ),
        geom_cfg=geom_cfg,
        test_loaders=test_loaders,
        mesh=mesh,
    )
    print("training finished")


if __name__ == "__main__":
    main()
