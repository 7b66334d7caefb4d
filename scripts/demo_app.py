"""Interactive-demo driver: the reference's scripts/gradio_app.py flow.

Headless by default (this environment has no gradio): images folder ->
inference -> GLB scene (triangle mesh + camera markers), per-view
colorized depth/normal PNGs, and an optional measure query — all via
`mapanything_tpu.utils.demo_core`, the UI-free core of the demo. With
`--ui` and gradio installed, the same functions back a minimal web UI.

Usage:
    python scripts/demo_app.py --image_folder PATH --out_dir OUT \
        [--checkpoint params.msgpack] [--tiny] [--pointcloud] \
        [--conf_percentile P] [--measure x1,y1,x2,y2 --view N] [--ui]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_pipeline(args, views):
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models import (
        MapAnything, MapAnythingConfig, images_only_config, jit_init,
    )
    from mapanything_tpu.utils.inference import (
        InferencePipeline,
        preprocess_input_views_for_inference,
        stack_views,
    )

    print(f"device: {jax.devices()[0]}")
    if args.checkpoint:
        from mapanything_tpu.models.pretrained import from_pretrained

        model, params = from_pretrained(args.checkpoint)
    else:
        if args.tiny:
            cfg = MapAnythingConfig(
                encoder_size="small", trunk_dim=384, trunk_depth=4,
                trunk_num_heads=6, trunk_indices=(1, 2), dpt_feature_dim=32,
                dtype=jnp.bfloat16,
            )
        else:
            cfg = MapAnythingConfig(dtype=jnp.bfloat16)
        model = MapAnything(cfg=cfg)
        batched = stack_views(
            preprocess_input_views_for_inference(list(views)))
        params = jit_init(model, jax.random.PRNGKey(0), batched,
                          images_only_config())
        print("running with RANDOM weights (smoke mode)")
    return InferencePipeline(model, params)


def export_outputs(args, predictions, processed):
    from PIL import Image

    from mapanything_tpu.utils import demo_core as dc

    os.makedirs(args.out_dir, exist_ok=True)
    glb_path = os.path.join(args.out_dir, "scene.glb")
    n = dc.predictions_to_glb_scene(
        glb_path, predictions,
        as_mesh=not args.pointcloud,
        conf_percentile=args.conf_percentile,
        mask_black_bg=args.filter_black_bg,
        mask_white_bg=args.filter_white_bg,
    )
    print(f"wrote {glb_path} ({n} vertices)")

    for i, view in processed.items():
        Image.fromarray(dc.colorize_depth(view["depth"], view["mask"])).save(
            os.path.join(args.out_dir, f"depth_{i:03d}.png"))
        Image.fromarray(dc.colorize_normal(view["normal"], view["mask"])
                        ).save(
            os.path.join(args.out_dir, f"normal_{i:03d}.png"))
    print(f"wrote {len(processed)} depth + normal maps")

    if args.measure:
        x1, y1, x2, y2 = (int(v) for v in args.measure.split(","))
        result = dc.measure(processed[args.view], (x1, y1), (x2, y2))
        path = os.path.join(args.out_dir, "measure.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        if result["valid"] and "distance" in result:
            print(f"measure: {result['distance']:.3f} m  -> {path}")
        else:
            print(f"measure: invalid click (masked/out of bounds) -> {path}")

    if args.sky_masks:
        sky_dir = os.path.join(args.out_dir, "sky")
        os.makedirs(sky_dir, exist_ok=True)
        for i, view in processed.items():
            mask = dc.segment_sky(view["image"])
            Image.fromarray(mask).save(
                os.path.join(sky_dir, f"skymask_{i:03d}.png"))
        print(f"wrote {len(processed)} sky masks (heuristic)")


def launch_ui(pipeline, args):
    import gradio as gr

    from mapanything_tpu.data.image import load_images
    from mapanything_tpu.utils import demo_core as dc

    def run(files, conf_percentile, as_mesh):
        views = load_images([f.name for f in files],
                            resolution_set=args.resolution)
        predictions, _ = dc.run_model(pipeline, views)
        out = os.path.join(args.out_dir, "scene.glb")
        dc.predictions_to_glb_scene(
            out, predictions, as_mesh=as_mesh,
            conf_percentile=conf_percentile or None)
        return out

    demo = gr.Interface(
        fn=run,
        inputs=[gr.File(file_count="multiple"),
                gr.Slider(0, 100, value=0, label="conf percentile"),
                gr.Checkbox(value=True, label="as mesh")],
        outputs=gr.Model3D(),
        title="MapAnything TPU",
    )
    demo.launch()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_folder", required=True)
    ap.add_argument("--out_dir", default="demo_out")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--resolution", type=int, default=518)
    ap.add_argument("--views", type=int, default=None)
    ap.add_argument("--pointcloud", action="store_true",
                    help="export a point cloud instead of meshes")
    ap.add_argument("--conf_percentile", type=float, default=None)
    ap.add_argument("--filter_black_bg", action="store_true")
    ap.add_argument("--filter_white_bg", action="store_true")
    ap.add_argument("--no_mask_edges", action="store_true")
    ap.add_argument("--measure", default=None,
                    help="x1,y1,x2,y2 pixel pair to measure")
    ap.add_argument("--view", type=int, default=0,
                    help="view index for --measure")
    ap.add_argument("--sky_masks", action="store_true")
    ap.add_argument("--ui", action="store_true",
                    help="launch the gradio UI (requires gradio)")
    args = ap.parse_args()

    from mapanything_tpu.data.image import load_images
    from mapanything_tpu.utils import demo_core as dc

    views = load_images(args.image_folder, resolution_set=args.resolution)
    if args.views:
        views = views[: args.views]
    print(f"loaded {len(views)} views, shape {views[0]['img'].shape}")

    pipeline = build_pipeline(args, views)

    if args.ui:
        try:
            launch_ui(pipeline, args)
            return
        except ImportError:
            print("gradio not installed; falling back to headless export")
    predictions, processed = dc.run_model(
        pipeline, views,
        mask_edges=not args.no_mask_edges,
        filter_black_bg=args.filter_black_bg,
        filter_white_bg=args.filter_white_bg,
    )
    export_outputs(args, predictions, processed)


if __name__ == "__main__":
    main()
