"""Input-pipeline profiler (rebuild of mapanything/train/profile_dataloading.py
+ scripts/profile_dataloading.py): simulate training epochs without model
execution and report loader throughput.

Usage:
    python scripts/profile_dataloading.py --wai_root /data/wai --dataset_spec \
        "32 @ WAIDataset(ROOT=wai_root, spec='eth3d', num_views=4, \
         covisibility_thres=0.25, resolution=(518,392), seed=0)" \
        --epochs 2 --num_workers 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wai_root", required=True)
    ap.add_argument("--dataset_spec", required=True)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max_imgs_per_device", type=int, default=48)
    ap.add_argument("--num_workers", type=int, default=4)
    args = ap.parse_args()

    from mapanything_tpu.data.loader import get_train_data_loader
    from mapanything_tpu.train.loop import build_dataset_mix
    from mapanything_tpu.utils.timing import block_timer, _default_manager

    dataset = build_dataset_mix(args.dataset_spec, wai_root=args.wai_root)
    loader = get_train_data_loader(
        dataset, max_num_of_imgs_per_gpu=args.max_imgs_per_device,
        num_workers=args.num_workers,
    )

    total_imgs = 0
    t_start = time.perf_counter()
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        n_batches = 0
        with block_timer(f"epoch_{epoch}"):
            for batch in loader:
                b, v = batch["views"]["img"].shape[:2]
                total_imgs += b * v
                n_batches += 1
        print(f"epoch {epoch}: {n_batches} batches")
    elapsed = time.perf_counter() - t_start
    print(_default_manager)
    print(f"TOTAL: {total_imgs} images in {elapsed:.2f}s "
          f"-> {total_imgs / elapsed:.1f} images/s "
          f"({args.num_workers} workers)")


if __name__ == "__main__":
    main()
