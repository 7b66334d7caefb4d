"""Images-only metric 3D reconstruction demo.

Rebuild of the reference scripts/demo_images_only_inference.py:125-236:
load a folder of images -> MapAnything inference -> combined masks -> export
a point cloud (PLY) + per-view depth/intrinsics/pose summary.

Usage:
    python scripts/demo_images_only_inference.py --image_folder PATH \
        [--checkpoint params.msgpack] [--output out.ply] [--views N]

Without --checkpoint the model runs with random weights (pipeline smoke
mode) — geometry will be meaningless but the full TPU path executes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    """Minimal binary-less ASCII PLY pointcloud writer (replaces trimesh)."""
    points = points.reshape(-1, 3)
    colors = (np.clip(colors.reshape(-1, 3), 0, 1) * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_folder", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax/msgpack params checkpoint (optional)")
    ap.add_argument("--output", default="reconstruction.ply")
    ap.add_argument("--views", type=int, default=None, help="limit #views")
    ap.add_argument("--resolution_set", type=int, default=518)
    ap.add_argument("--memory_efficient", action="store_true")
    ap.add_argument("--apply_confidence_mask", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="use a tiny random model (fast smoke run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.image import load_images
    from mapanything_tpu.models import (
        jit_init,
        MapAnything,
        MapAnythingConfig,
        images_only_config,
    )
    from mapanything_tpu.utils.inference import (
        InferencePipeline,
        preprocess_input_views_for_inference,
        stack_views,
    )

    print(f"device: {jax.devices()[0]}")
    t0 = time.time()
    views = load_images(args.image_folder, resolution_set=args.resolution_set,
                        verbose=True)
    if args.views:
        views = views[: args.views]
    print(f"loaded {len(views)} views in {time.time() - t0:.2f}s; "
          f"shape {views[0]['img'].shape}")

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
        print(f"loaded checkpoint {args.checkpoint}")
    else:
        params = jit_init(model, jax.random.PRNGKey(0), batched, images_only_config())
        print("WARNING: random weights (no --checkpoint) — smoke mode")

    pipe = InferencePipeline(model, params)
    t0 = time.time()
    preds = pipe.infer(
        views,
        memory_efficient_inference=args.memory_efficient,
        apply_confidence_mask=args.apply_confidence_mask,
    )
    # force completion (block_until_ready is unreliable over the tunnel)
    _ = float(preds[0]["metric_scaling_factor"][0])
    print(f"inference: {time.time() - t0:.2f}s for {len(views)} views")

    all_pts, all_cols = [], []
    for i, p in enumerate(preds):
        pts = np.asarray(p["pts3d"][0])
        mask = np.asarray(p["mask"][0, ..., 0]).astype(bool)
        cols = np.asarray(p["img_no_norm"][0])
        all_pts.append(pts[mask])
        all_cols.append(cols[mask])
        K = np.asarray(p["intrinsics"][0])
        print(f"view {i}: {int(mask.sum())} valid px, "
              f"fx={K[0, 0]:.1f} fy={K[1, 1]:.1f}, "
              f"depth_z range [{float(p['depth_z'][0].min()):.3f}, "
              f"{float(p['depth_z'][0].max()):.3f}], "
              f"scale={float(p['metric_scaling_factor'][0]):.4f}")

    pts = np.concatenate(all_pts)
    cols = np.concatenate(all_cols)
    write_ply(args.output, pts, cols)
    print(f"wrote {len(pts)} points -> {args.output}")

    # GLB scene with camera-frustum wireframes (the reference's
    # predictions_to_glb output, hf_utils/viz.py)
    from mapanything_tpu.utils.viz import write_glb_scene

    glb_path = os.path.splitext(args.output)[0] + ".glb"
    poses = np.stack([np.asarray(p["camera_poses"][0]) for p in preds])
    Ks = np.stack([np.asarray(p["intrinsics"][0]) for p in preds])
    h, w = preds[0]["pts3d"].shape[1:3]
    write_glb_scene(glb_path, pts, cols, poses, Ks, (w, h))
    print(f"wrote GLB scene with {len(preds)} camera frustums -> {glb_path}")


if __name__ == "__main__":
    main()
