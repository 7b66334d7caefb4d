"""Convert a PyTorch MapAnything/DINOv2 checkpoint to framework params.

Rebuild of the reference scripts/convert_hf_to_benchmark_checkpoint.py:57-100
plus the torch->JAX leg the reference doesn't need: reads a .pth/.pt/
safetensors state_dict, maps it with utils/weights.py, and writes an orbax
params checkpoint loadable by --checkpoint flags across the framework.

Usage:
    python scripts/convert_torch_checkpoint.py --input model.safetensors \
        --output params_ckpt [--report]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="pt") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--kind", default="auto",
                    choices=["auto", "mapanything", "dinov2"])
    ap.add_argument("--report", action="store_true",
                    help="print the key-group inventory and unconverted keys")
    args = ap.parse_args()

    from mapanything_tpu.train.checkpoints import save_params
    from mapanything_tpu.utils.weights import (
        convert_dinov2,
        convert_mapanything_checkpoint,
        inspect_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    print(f"loaded {len(sd)} tensors from {args.input}")
    if args.report:
        for group, count in inspect_state_dict(sd, depth=2).items():
            print(f"  {group}: {count}")

    kind = args.kind
    if kind == "auto":
        kind = "dinov2" if "blocks.0.attn.qkv.weight" in sd else "mapanything"

    if kind == "dinov2":
        params, used = convert_dinov2(sd)
        print(f"converted DINOv2 encoder ({used}/{len(sd)} tensors)")
        tree = {"params": params}
    else:
        tree = convert_mapanything_checkpoint(sd)
        unconverted = tree.pop("_unconverted", [])
        aliases = tree.pop("_aliases", [])
        if aliases:
            print(f"skipped {len(aliases)} known duplicate keys "
                  "(dense_head.* Sequential aliases / mask_token)")
        if unconverted:
            print(f"WARNING: {len(unconverted)} unmapped keys, e.g. "
                  f"{unconverted[:5]} — extend utils/weights.py mapping "
                  "rules against this checkpoint")
        from mapanything_tpu.utils.weights import infer_model_config

        inferred = infer_model_config(sd)
        if inferred:
            print(f"inferred architecture from shapes: {inferred}")
        tree = {"params": tree}

    save_params(args.output, tree)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
