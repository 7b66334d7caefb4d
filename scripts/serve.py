"""Serve MapAnything inference over HTTP with request batching.

The TPU-native replacement for the reference's gradio demo surface
(reference gradio_app.py): a device-owner thread batches concurrent
scenes into one compiled forward per shape bucket (mapanything_tpu/
serve.py). Clients POST numpy-npz scenes to /v1/infer.

Example:
    python scripts/serve.py --port 8000 --checkpoint ckpt_dir \
        --resolution-set 518 --max-batch 4

    # client
    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, images=imgs)  # (V, H, W, 3) in [0,1]
    req = urllib.request.Request(
        "http://127.0.0.1:8000/v1/infer?apply_confidence_mask=1",
        data=buf.getvalue(), method="POST")
    out = dict(np.load(io.BytesIO(urllib.request.urlopen(req).read())))
    out["pts3d"]  # (V, H, W, 3)
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--checkpoint", default=None,
                   help="HF snapshot dir / torch ckpt / orbax dir; random "
                        "weights if omitted (smoke mode)")
    p.add_argument("--resolution-set", type=int, default=518,
                   choices=(518, 512))
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--warmup-views", type=int, default=2,
                   help="compile the common signature before serving "
                        "(0 disables)")
    p.add_argument("--fp32", action="store_true",
                   help="serve in float32 (default: bfloat16)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models import (
        MapAnything,
        MapAnythingConfig,
        images_only_config,
        jit_init,
    )
    from mapanything_tpu.serve import BatchingEngine, InferenceServer
    from mapanything_tpu.utils.inference import InferencePipeline

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    if args.checkpoint:
        # from_pretrained builds a (model, params) pair that agrees on the
        # LayerScale layout — constructing the model separately with
        # fold_layerscale=True over an unfolded checkpoint would silently
        # drop every trained ls1/ls2 gamma
        from mapanything_tpu.models.pretrained import from_pretrained

        model, params = from_pretrained(args.checkpoint, dtype=dtype)
        print(f"loaded checkpoint {args.checkpoint}")
    else:
        model = MapAnything(cfg=MapAnythingConfig(dtype=dtype))
        h, w = 518, 518
        views = {"img": jnp.zeros((1, 2, h, w, 3), jnp.float32)}
        params = jit_init(model, jax.random.PRNGKey(0), views,
                          images_only_config())
        print("WARNING: random weights (no --checkpoint) — smoke mode")

    engine = BatchingEngine(
        InferencePipeline(model, params),
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    ).start()
    server = InferenceServer(
        engine, host=args.host, port=args.port,
        resolution_set=args.resolution_set,
    ).start(warmup_views=args.warmup_views)
    print(f"serving on http://{server.host}:{server.port} "
          f"(POST /v1/infer, GET /healthz, GET /v1/stats)")
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        engine.stop()


if __name__ == "__main__":
    main()
