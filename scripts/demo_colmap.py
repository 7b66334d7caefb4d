"""COLMAP export demo (rebuild of reference scripts/demo_colmap.py:45-642).

Loads a folder of images, runs MapAnything inference, and writes a COLMAP
sparse reconstruction (sparse/cameras.bin, images.bin, points3D.bin) plus a
points.ply — the feed-forward export path. `--ba` additionally refines
poses/intrinsics/points with the TPU-native pipeline (the reference's
VGGSfM-tracks + pycolmap stage, demo_colmap.py:438-487, rebuilt as
utils/tracking.py NCC tracks + utils/ba.py jax LM bundle adjustment — no
pycolmap/Ceres dependency, everything on device).

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
                    help="refine with the on-device track + LM-BA path")
    ap.add_argument("--max_query_pts", type=int, default=1024)
    ap.add_argument("--num_query_frames", type=int, default=3,
                    help="track from this many ranked query frames "
                         "(reference default behavior; 1 = frame 0 only)")
    ap.add_argument("--vis_thresh", type=float, default=0.6)
    ap.add_argument("--ba_iters", type=int, default=20)
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
        params = jit_init(model, jax.random.PRNGKey(0), batched,
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
        # TPU-native BA path (reference demo_colmap.py:438-487 uses VGGSfM
        # tracks + pycolmap; here both stages run on-device in jax —
        # tracking.py NCC tracker + ba.py LM/Schur bundle adjustment).
        from mapanything_tpu.geometry import rotation_matrix_to_quaternion
        from mapanything_tpu.utils.ba import BAProblem, bundle_adjust
        from mapanything_tpu.utils.tracking import (
            frame_features_from_encoder,
            rank_query_frames,
            select_query_points,
            to_gray,
            track_points,
        )

        imgs = np.stack([np.asarray(p["img_no_norm"][0]) for p in preds])

        # Query-frame ranking (reference third_party/track_predict.py:68
        # ranks with a separately-downloaded DINO; here the model's OWN
        # DINOv2 encoder supplies the frame features), then frame 0 is
        # forced to the front exactly like the reference (:71-74).
        query_frames = [0]
        if args.num_query_frames > 1 and v > 1:
            if cfg.encoder_type == "dinov2":
                from mapanything_tpu.nn.dinov2 import DinoViT

                enc = DinoViT(size=cfg.encoder_size,
                              patch_size=cfg.patch_size, dtype=cfg.dtype,
                              fold_layerscale=cfg.fold_layerscale)
                enc_params = {"params": params["params"]["encoder"]}
                feats = frame_features_from_encoder(
                    jax.jit(lambda x: enc.apply(enc_params, x)),
                    batched["img"][0],
                )
                ranked = rank_query_frames(feats, args.num_query_frames)
            else:  # luma histogram fallback for croco/radio configs
                f = jnp.stack([jnp.histogram(to_gray(jnp.asarray(im)),
                                             bins=64, range=(0, 1))[0]
                               for im in imgs]).astype(jnp.float32)
                ranked = rank_query_frames(f, args.num_query_frames)
            query_frames += [i for i in ranked if i != 0]
            query_frames = query_frames[:args.num_query_frames]
        print(f"query frames: {query_frames}")

        # Track from every query frame, concatenate the track sets
        # (reference track_predict.py:93-117 loops query_frame_indexes).
        pts_per_frame = max(1, args.max_query_pts // len(query_frames))
        all_xy, all_mask, all_pts, all_rgb = [], [], [], []
        for qf in query_frames:
            if "conf" in preds[qf]:
                conf_q = np.asarray(preds[qf]["conf"][0])
            else:
                conf_q = np.ones(imgs.shape[1:3], np.float32)
            q_yx, _ = select_query_points(
                jnp.asarray(conf_q), to_gray(jnp.asarray(imgs[qf])),
                pts_per_frame,
            )
            tracks_yx, vis_q = track_points(jnp.asarray(imgs), q_yx,
                                            query_frame=qf)
            all_xy.append(np.asarray(tracks_yx)[..., ::-1])
            all_mask.append(np.asarray(vis_q) > args.vis_thresh)
            qi = np.asarray(q_yx).astype(int)
            all_pts.append(
                np.asarray(preds[qf]["pts3d"][0])[qi[:, 0], qi[:, 1]])
            all_rgb.append(
                (imgs[qf][qi[:, 0], qi[:, 1]] * 255).astype(np.uint8))

        tracks_xy = np.concatenate(all_xy, axis=1).copy()   # (F, P, 2)
        track_mask = np.concatenate(all_mask, axis=1)
        ba_points = np.concatenate(all_pts, axis=0)
        point_rgb = np.concatenate(all_rgb, axis=0)

        w2c = np.linalg.inv(poses)
        quats0 = np.asarray(
            rotation_matrix_to_quaternion(jnp.asarray(w2c[:, :3, :3]))
        )
        intr0 = np.array([intrinsics[0, 0, 0], intrinsics[0, 1, 1],
                          intrinsics[0, 0, 2], intrinsics[0, 1, 2]],
                         np.float32)

        prob = BAProblem(
            tracks=jnp.asarray(tracks_xy),
            track_mask=jnp.asarray(track_mask),
            base_quats=jnp.asarray(quats0),
            base_trans=jnp.asarray(w2c[:, :3, 3]),
            intrinsics=jnp.asarray(intr0),
            points=jnp.asarray(ba_points),
        )
        out = bundle_adjust(prob, iters=args.ba_iters)
        print(f"BA: rms {float(out['rms_before']):.2f} px -> "
              f"{float(out['rms_after']):.2f} px over "
              f"{int(track_mask.sum())} observations")

        # refined cam-from-world -> cam2world for export
        from mapanything_tpu.geometry import (
            pose_quats_trans_to_matrix,
        )

        w2c_ref = np.asarray(pose_quats_trans_to_matrix(
            out["cam_quats"], out["cam_trans"]
        ))
        c2w_ref = np.linalg.inv(w2c_ref)
        fx, fy, cx, cy = np.asarray(out["intrinsics"])
        K_ref = np.stack([np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                                   np.float32)] * v)
        ba_dir = os.path.join(args.output_dir, "sparse_ba")
        export_colmap_reconstruction(
            ba_dir, K_ref, c2w_ref, sizes, names,
            np.asarray(out["points"]), point_rgb,
        )
        print(f"wrote BA-refined reconstruction -> {ba_dir}")


if __name__ == "__main__":
    main()
