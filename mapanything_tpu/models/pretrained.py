"""from_pretrained-style loading (the reference's HF-hub entry point).

The reference exposes `MapAnything.from_pretrained("facebook/map-anything")`
(README quickstart; model.py:590-620 _load_pretrained_weights). This
environment has no network egress, so the equivalent consumes a LOCAL
source and returns (model, params):

  * an HF snapshot directory (model.safetensors [+ config.json]) — the
    state_dict is converted on the fly with utils/weights.py, the
    architecture inferred from tensor shapes (infer_model_config);
  * a *.safetensors / *.pt / *.pth file — same conversion;
  * an orbax params directory previously written by
    scripts/convert_torch_checkpoint.py — loaded directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from .mapanything import MapAnything, MapAnythingConfig


def _load_state_dict(path: str) -> Dict[str, Any]:
    if path.endswith(".safetensors"):
        # pure-python parser (utils/weights.read_safetensors): the HF
        # checkpoint path needs neither torch nor the safetensors pip
        from ..utils.weights import read_safetensors

        return read_safetensors(path)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            return ckpt[key]
    return ckpt


def from_pretrained(
    path: str,
    dtype: Any = jnp.bfloat16,
    config_overrides: Optional[Dict[str, Any]] = None,
    strict: bool = True,
) -> Tuple[MapAnything, Dict[str, Any]]:
    """Load a pretrained MapAnything from a local checkpoint.

    Args:
        path: HF snapshot dir, a torch checkpoint file, or an orbax params
            dir written by scripts/convert_torch_checkpoint.py.
        dtype: compute dtype for the returned model (bf16 serving default).
        config_overrides: extra MapAnythingConfig fields.
        strict: raise if any checkpoint tensor has no conversion rule.

    Returns:
        (model, params) — params is the {"params": ...} tree `model.apply`
        expects.
    """
    overrides = dict(config_overrides or {})

    sharded_sd = None
    if os.path.isdir(path):
        st = os.path.join(path, "model.safetensors")
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.isfile(st):
            path = st
        elif os.path.isfile(index):
            # sharded HF snapshot: the index maps key -> shard file
            import json

            from ..utils.weights import read_safetensors

            with open(index) as f:
                weight_map = json.load(f)["weight_map"]
            sharded_sd = {}
            for shard in sorted(set(weight_map.values())):
                sharded_sd.update(
                    read_safetensors(os.path.join(path, shard)))
        else:
            # orbax params dir
            from ..train.checkpoints import load_params

            cfg = MapAnythingConfig(dtype=dtype, **overrides)
            params = load_params(path)
            if cfg.scan_layers:
                # orbax checkpoints store the per-layer layout; fold to the
                # stacked nn.scan layout (utils/weights.stack_scan_params)
                from ..utils.weights import stack_scan_params

                params = {"params": stack_scan_params(params["params"])}
            return MapAnything(cfg=cfg), params

    from ..utils.weights import (
        convert_mapanything_checkpoint,
        infer_model_config,
    )

    sd = sharded_sd if sharded_sd is not None else _load_state_dict(path)
    inferred = infer_model_config(sd)
    import dataclasses

    cfg_fields = {f.name for f in dataclasses.fields(MapAnythingConfig)}
    for k, v in inferred.items():
        if k in cfg_fields:  # infer also reports non-config facts (enc_dim)
            overrides.setdefault(k, v)
    cfg = MapAnythingConfig(dtype=dtype, **overrides)

    tree = convert_mapanything_checkpoint(
        sd, trunk_indices=tuple(cfg.trunk_indices)
    )
    unconverted = tree.pop("_unconverted", [])
    tree.pop("_aliases", None)
    if unconverted and strict:
        raise ValueError(
            f"{len(unconverted)} checkpoint tensors have no conversion "
            f"rule, e.g. {unconverted[:5]} (pass strict=False to ignore)"
        )
    if cfg.scan_layers:
        # conversion rules emit the per-layer layout; fold to the stacked
        # nn.scan layout (utils/weights.stack_scan_params)
        from ..utils.weights import stack_scan_params

        tree = stack_scan_params(tree)
    return MapAnything(cfg=cfg), {"params": tree}
