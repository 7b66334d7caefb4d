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
        x = x.detach().cpu()
        if str(x.dtype) == "torch.bfloat16":  # numpy has no bf16
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# safetensors (pure python/numpy — no torch, no safetensors pip dependency)
# ---------------------------------------------------------------------------

# safetensors dtype tag -> (numpy dtype to view the raw bytes as, upcast)
_SAFETENSORS_DTYPES = {
    "F64": (np.float64, None),
    "F32": (np.float32, None),
    "F16": (np.float16, None),
    # bf16 has no numpy dtype: view as uint16 and widen to fp32 by shifting
    # into the top half of a uint32 (bf16 is fp32's upper 16 bits)
    "BF16": (np.uint16, "bf16"),
    "I64": (np.int64, None),
    "I32": (np.int32, None),
    "I16": (np.int16, None),
    "I8": (np.int8, None),
    "U8": (np.uint8, None),
    "BOOL": (np.bool_, None),
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Parse a .safetensors file into {name: numpy array}.

    Pure-python implementation of the format (8-byte LE header length, JSON
    header of {name: {dtype, shape, data_offsets}}, raw little-endian
    tensor data) so the HF checkpoint load path (reference model.py:87
    PyTorchModelHubMixin — safetensors on the hub) has no torch or
    safetensors-pip dependency. bf16 tensors are widened to fp32 (the
    param trees hold fp32 masters).
    """
    import json

    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len).decode("utf-8"))
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        tag = meta["dtype"]
        if tag not in _SAFETENSORS_DTYPES:
            raise ValueError(f"{path}: unsupported safetensors dtype {tag!r}")
        np_dtype, special = _SAFETENSORS_DTYPES[tag]
        lo, hi = meta["data_offsets"]
        arr = np.frombuffer(data[lo:hi], dtype=np_dtype)
        if special == "bf16":
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(path: str, tensors: Mapping[str, Any]) -> None:
    """Write {name: array} as a .safetensors file (test fixtures / export).

    fp32/fp16/int arrays map directly; jax/ml_dtypes bfloat16 arrays are
    written as BF16.
    """
    import json

    tag_of = {np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
              np.dtype(np.float16): "F16", np.dtype(np.int64): "I64",
              np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
              np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
              np.dtype(np.bool_): "BOOL"}
    header: Dict[str, Any] = {}
    blobs = []
    offset = 0
    for name, x in tensors.items():
        x = _t(x)
        if "bfloat16" in str(x.dtype):
            tag = "BF16"
            raw = np.ascontiguousarray(x).view(np.uint16).tobytes()
        else:
            if x.dtype not in tag_of:
                raise ValueError(f"unsupported dtype {x.dtype} for {name}")
            tag = tag_of[x.dtype]
            raw = np.ascontiguousarray(x).tobytes()
        header[name] = {"dtype": tag, "shape": list(x.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    hdr = json.dumps(header).encode("utf-8")
    hdr += b" " * (-len(hdr) % 8)  # spec: align data to 8 bytes
    with open(path, "wb") as f:
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        for raw in blobs:
            f.write(raw)


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
    sd: Mapping[str, Any], prefix: str = "", fold_layerscale: bool = False
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
            if fold_layerscale:
                # gamma scales the residual branch output -> multiply the
                # producing layer's kernel+bias (DinoViT fold_layerscale)
                g1 = _t(take(b + "ls1.gamma"))
                g2 = _t(take(b + "ls2.gamma"))
                block["attn"]["proj"]["kernel"] = (
                    block["attn"]["proj"]["kernel"] * g1[None, :]
                )
                block["attn"]["proj"]["bias"] = (
                    block["attn"]["proj"]["bias"] * g1
                )
                block["mlp"]["fc2"]["kernel"] = (
                    block["mlp"]["fc2"]["kernel"] * g2[None, :]
                )
                block["mlp"]["fc2"]["bias"] = (
                    block["mlp"]["fc2"]["bias"] * g2
                )
            else:
                block["ls1"] = {"gamma": _t(take(b + "ls1.gamma"))}
                block["ls2"] = {"gamma": _t(take(b + "ls2.gamma"))}
        params[f"blocks_{i}"] = block
    return params, used


def convert_croco(
    sd: Mapping[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int]:
    """Convert a CroCo/DUSt3R-style torch encoder state_dict to CroCoViT
    params.

    Expected key layout under `prefix` (CroCo/DUSt3R encoder; used by the
    reference's croco_512 encoder config and ModularDUSt3R lineage):
      patch_embed.proj.{weight,bias}     Conv patch embed
      enc_blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
      enc_norm.{weight,bias}             final LayerNorm
    An `enc_pos_embed` buffer, if present, is skipped (our CroCoViT computes
    the same 2D sin-cos table on the fly) but counted as consumed.

    Returns (params inner tree for CroCoViT, consumed-tensor count).
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    used = 0

    def take(k):
        nonlocal used
        used += 1
        return g(k)

    params: Dict[str, Any] = {
        "patch_embed": conv(
            take("patch_embed.proj.weight"), take("patch_embed.proj.bias")
        ),
        "norm": layer_norm(take("enc_norm.weight"), take("enc_norm.bias")),
    }
    if prefix + "enc_pos_embed" in sd:
        take("enc_pos_embed")  # fixed sin-cos table, recomputed on the fly

    n_blocks = 0
    while f"{prefix}enc_blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        b = f"enc_blocks.{i}."
        params[f"blocks_{i}"] = {
            "norm1": layer_norm(take(b + "norm1.weight"),
                                take(b + "norm1.bias")),
            "attn": {
                "qkv": linear(take(b + "attn.qkv.weight"),
                              take(b + "attn.qkv.bias")),
                "proj": linear(take(b + "attn.proj.weight"),
                               take(b + "attn.proj.bias")),
            },
            "norm2": layer_norm(take(b + "norm2.weight"),
                                take(b + "norm2.bias")),
            "mlp": {
                "fc1": linear(take(b + "mlp.fc1.weight"),
                              take(b + "mlp.fc1.bias")),
                "fc2": linear(take(b + "mlp.fc2.weight"),
                              take(b + "mlp.fc2.bias")),
            },
        }
    return params, used


def convert_radio(
    sd: Mapping[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int]:
    """Convert a torch-hub RADIO (AM-RADIO RADIOModel) state_dict to RadioViT
    params.

    Expected key layout under `prefix`:
      input_conditioner.norm_mean / norm_std        (1,3,1,1) buffers
      model.patch_generator.embedder.{weight,bias}  Linear (dim, p*p*3)
      model.patch_generator.pos_embed               (1, N, dim)
      model.patch_generator.cls_token.token         (1, k, dim); token 0 is
          the cls token, tokens 1..k-1 become register_tokens
      model.blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
      model.norm.{weight,bias}

    Returns (params inner tree for RadioViT, consumed-tensor count).
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    used = 0

    def take(k):
        nonlocal used
        used += 1
        return g(k)

    params: Dict[str, Any] = {
        "norm_mean": _t(take("input_conditioner.norm_mean")).reshape(3),
        "norm_std": _t(take("input_conditioner.norm_std")).reshape(3),
        "pos_embed": _t(take("model.patch_generator.pos_embed")).reshape(
            -1, _t(g("model.patch_generator.pos_embed")).shape[-1]
        ),
        "norm": layer_norm(take("model.norm.weight"), take("model.norm.bias")),
    }

    # embedder: Linear over (p1 p2 c)-flattened patches. The flatten order
    # (p1, p2, c) matches flax Conv HWIO, so the kernel is a pure reshape.
    ew = _t(take("model.patch_generator.embedder.weight"))  # (dim, p*p*3)
    dim = ew.shape[0]
    p = int(round((ew.shape[1] // 3) ** 0.5))
    kernel = ew.T.reshape(p, p, 3, dim)
    patch_embed: Dict[str, np.ndarray] = {"kernel": kernel}
    if prefix + "model.patch_generator.embedder.bias" in sd:
        patch_embed["bias"] = _t(take("model.patch_generator.embedder.bias"))
    params["patch_embed"] = patch_embed

    tok = _t(take("model.patch_generator.cls_token.token"))
    tok = tok.reshape(1, -1, dim)
    params["cls_token"] = tok[:, :1]
    if tok.shape[1] > 1:
        params["register_tokens"] = tok[:, 1:]

    n_blocks = 0
    while f"{prefix}model.blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        b = f"model.blocks.{i}."
        params[f"blocks_{i}"] = {
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


# ---------------------------------------------------------------------------
# Full-model conversion (reference model.py:590-620 _load_pretrained_weights /
# scripts/convert_hf_to_benchmark_checkpoint.py:82-100).
#
# Top-level key prefixes are pinned by the reference MapAnything attribute
# names (model.py:157-196,280-388): encoder, ray_dirs_encoder, depth_encoder,
# depth_scale_encoder, cam_rot_encoder, cam_trans_encoder,
# cam_trans_scale_encoder, fusion_norm_layer, scale_token, info_sharing,
# dpt_feature_head, dpt_regressor_head, pose_head, scale_head — plus
# dense_head.{0,1} DUPLICATES of the two DPT submodules (model.py:378 wraps
# the same module objects in an nn.Sequential, so torch registers them twice).
#
# Submodule-internal names are not all pinned offline (UniCeption is a
# separate pip package); the rules below accept the naming families of the
# in-repo concrete specs — torch-hub DINOv2 for the encoder (exact),
# vendored VGGT for the DPT pyramid and timm-style blocks for the trunk
# (external/vggt/heads/dpt_head.py:60-150, models/aggregator.py:85-117) —
# and common variants (nn.Sequential indices vs named Linears). Anything
# unmatched is reported, never dropped silently.
# ---------------------------------------------------------------------------


class _SubDict:
    """View over sd restricted to one prefix, tracking consumed keys."""

    def __init__(self, sd: Mapping[str, Any], prefix: str):
        self.prefix = prefix
        self.d = {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }
        self.used: set = set()

    def __contains__(self, k):
        return k in self.d

    def keys(self):
        return self.d.keys()

    def take(self, k):
        self.used.add(k)
        return self.d[k]

    def first(self, *names):
        """Return the first present bare key (or None)."""
        for n in names:
            if n in self.d:
                return n
        return None

    def first_mod(self, *names, probe: str = ".weight"):
        """Return the first name that is a module base (has `<name>.weight`)."""
        for n in names:
            if n + probe in self.d:
                return n
        return None

    def leftovers(self):
        return [self.prefix + k for k in self.d if k not in self.used]


def _linear_from(sub: _SubDict, base: str) -> Dict[str, np.ndarray]:
    w = sub.take(base + ".weight")
    b = sub.take(base + ".bias") if base + ".bias" in sub else None
    return linear(w, b)


def _conv_from(sub: _SubDict, base: str) -> Dict[str, np.ndarray]:
    w = sub.take(base + ".weight")
    b = sub.take(base + ".bias") if base + ".bias" in sub else None
    return conv(w, b)


def _convt_from(sub: _SubDict, base: str) -> Dict[str, np.ndarray]:
    w = sub.take(base + ".weight")
    b = sub.take(base + ".bias") if base + ".bias" in sub else None
    return conv_transpose(w, b)


def _ln_from(sub: _SubDict, base: str) -> Dict[str, np.ndarray]:
    return layer_norm(sub.take(base + ".weight"), sub.take(base + ".bias"))


def convert_dense_rep_encoder(sub: _SubDict) -> Dict[str, Any]:
    """UniCeption dense_rep_encoder (conv patchify) -> DenseRepEncoder."""
    base = sub.first_mod("proj", "patch_embed.proj", "conv")
    if base is None:
        return {}
    return {"proj": _conv_from(sub, base)}


def convert_global_rep_encoder(sub: _SubDict) -> Dict[str, Any]:
    """UniCeption global_rep_encoder (MLP) -> GlobalRepEncoder."""
    out: Dict[str, Any] = {}
    f1 = sub.first_mod("fc1", "mlp.0", "mlp.fc1", "0")
    f2 = sub.first_mod("fc2", "mlp.2", "mlp.fc2", "2")
    if f1 is not None:
        out["fc1"] = _linear_from(sub, f1)
    if f2 is not None:
        out["fc2"] = _linear_from(sub, f2)
    return out


def _convert_block(sub: _SubDict, base: str) -> Dict[str, Any]:
    """timm/DINOv2-style transformer block -> nn/layers.py Block params."""
    blk: Dict[str, Any] = {
        "norm1": _ln_from(sub, base + ".norm1"),
        "attn": {
            "qkv": _linear_from(sub, base + ".attn.qkv"),
            "proj": _linear_from(sub, base + ".attn.proj"),
        },
        "norm2": _ln_from(sub, base + ".norm2"),
        "mlp": {
            "fc1": _linear_from(sub, base + ".mlp.fc1"),
            "fc2": _linear_from(sub, base + ".mlp.fc2"),
        },
    }
    if base + ".ls1.gamma" in sub:
        blk["ls1"] = {"gamma": _t(sub.take(base + ".ls1.gamma"))}
        blk["ls2"] = {"gamma": _t(sub.take(base + ".ls2.gamma"))}
    return blk


def convert_trunk(
    sub: _SubDict, indices: Tuple[int, ...] = (11, 17)
) -> Dict[str, Any]:
    """UniCeption MultiView*AttentionTransformer[IFR] -> trunk params.

    Accepts two block layouts:
      * flat interleaved `blocks.{i}` (i covers all `depth` layers,
        frame/global alternating) -> layers_{i};
      * paired `frame_blocks.{j}` + `global_blocks.{j}` (vendored VGGT
        aggregator layout, aa_order frame-first) -> layers_{2j}/layers_{2j+1}.
    """
    out: Dict[str, Any] = {}

    if "proj.weight" in sub:
        out["proj"] = _linear_from(sub, "proj")

    n_flat = 0
    while f"blocks.{n_flat}.norm1.weight" in sub:
        n_flat += 1
    if n_flat:
        # Flat layout: depth counts single layers; tap i is our layer i.
        for i in range(n_flat):
            out[f"layers_{i}"] = _convert_block(sub, f"blocks.{i}")
        tap_layers = list(indices)
    else:
        # Paired layout (VGGT counting): depth counts frame+global pairs; a
        # tap at pair i is the output of that pair's global layer, i.e. our
        # layer 2i+1 (SURVEY.md §2.6 depth-counting ambiguity, resolved from
        # the checkpoint's own key structure).
        n_pairs = 0
        while f"frame_blocks.{n_pairs}.norm1.weight" in sub:
            n_pairs += 1
        for j in range(n_pairs):
            out[f"layers_{2 * j}"] = _convert_block(sub, f"frame_blocks.{j}")
            out[f"layers_{2 * j + 1}"] = _convert_block(sub, f"global_blocks.{j}")
        tap_layers = [2 * i + 1 for i in indices]

    # Reference-view embeddings (distinguish_ref_and_non_ref_views) — either
    # one stacked (2, dim) parameter or two separate (dim,) parameters.
    stacked = sub.first("ref_nonref_embed", "view_embed")
    if stacked is not None:
        out["ref_nonref_embed"] = _t(sub.take(stacked)).reshape(2, -1)
    elif "ref_view_embed" in sub and "non_ref_view_embed" in sub:
        out["ref_nonref_embed"] = np.stack(
            [
                _t(sub.take("ref_view_embed")).reshape(-1),
                _t(sub.take("non_ref_view_embed")).reshape(-1),
            ]
        )

    pe = sub.first("view_pe.weight", "view_pe", "view_pos_embed.weight")
    if pe is not None:
        out["view_pe"] = _t(sub.take(pe))

    # IFR intermediate norms: a ModuleList indexed by tap order; our params
    # are named by the tapped layer index.
    for k, layer_idx in enumerate(tap_layers):
        base = None
        for cand in (f"norm_intermediate.{k}", f"intermediate_norms.{k}",
                     f"adaptors.{k}.final_norm"):
            if cand + ".weight" in sub:
                base = cand
                break
        if base is not None:
            out[f"norm_intermediate_{layer_idx}"] = _ln_from(sub, base)

    if "norm.weight" in sub:
        out["norm"] = _ln_from(sub, "norm")
    return out


def convert_dpt_feature(sub: _SubDict) -> Dict[str, Any]:
    """DPT feature pyramid (vendored VGGT scratch naming,
    external/vggt/heads/dpt_head.py:68-118) -> DPTFeature params."""
    out: Dict[str, Any] = {}
    if "norm.weight" in sub:  # optional input LayerNorm (VGGT dpt_head.py:65)
        out["input_norm"] = _ln_from(sub, "norm")
    for i in range(4):
        base = sub.first_mod(f"projects.{i}", f"project_{i}", f"act_postprocess.{i}.0")
        if base is not None:
            out[f"project_{i}"] = _conv_from(sub, base)
    # resize layers: 0/1 are ConvTranspose, 2 is identity, 3 is strided conv
    for i, cvt in ((0, True), (1, True), (3, False)):
        base = sub.first_mod(f"resize_layers.{i}", f"resize_{i}")
        if base is not None:
            out[f"resize_{i}"] = _convt_from(sub, base) if cvt else _conv_from(sub, base)
    for i in range(4):
        base = sub.first_mod(f"scratch.layer{i + 1}_rn", f"layer_rn_{i}",
                             f"scratch.layer_rn.{i}")
        if base is not None:
            out[f"layer_rn_{i}"] = _conv_from(sub, base)
    for k in range(1, 5):
        base = sub.first_mod(f"scratch.refinenet{k}", f"refinenet{k}",
                             probe=".resConfUnit2.conv1.weight")
        if base is None:
            continue
        ref: Dict[str, Any] = {}
        for unit_t, unit_o in (("resConfUnit1", "res_conv_unit1"),
                               ("resConfUnit2", "res_conv_unit2")):
            if f"{base}.{unit_t}.conv1.weight" in sub:
                ref[unit_o] = {
                    "conv1": _conv_from(sub, f"{base}.{unit_t}.conv1"),
                    "conv2": _conv_from(sub, f"{base}.{unit_t}.conv2"),
                }
        if f"{base}.out_conv.weight" in sub:
            ref["out_conv"] = _conv_from(sub, f"{base}.out_conv")
        out[f"refinenet{k}"] = ref
    return out


def convert_dpt_regressor(sub: _SubDict) -> Dict[str, Any]:
    """DPT regression tail (VGGT output_conv1/output_conv2 naming,
    dpt_head.py:128-151) -> DPTRegressionProcessor params."""
    out: Dict[str, Any] = {}
    c1 = sub.first_mod("output_conv1", "conv1", "head.0")
    c2 = sub.first_mod("output_conv2.0", "conv2", "head.2")
    co = sub.first_mod("output_conv2.2", "conv_out", "head.4")
    if c1 is not None:
        out["conv1"] = _conv_from(sub, c1)
    if c2 is not None:
        out["conv2"] = _conv_from(sub, c2)
    if co is not None:
        out["conv_out"] = _conv_from(sub, co)
    return out


def convert_pose_head(sub: _SubDict) -> Dict[str, Any]:
    """UniCeption PoseHead (proj conv + resconv blocks + MLP) -> PoseHead."""
    out: Dict[str, Any] = {}
    base = sub.first_mod("proj", "input_proj")
    if base is not None:
        out["proj"] = _conv_from(sub, base)
    i = 0
    while True:
        base = sub.first_mod(f"res_conv_blocks.{i}", f"res_conv.{i}",
                             f"resconv_blocks.{i}", f"res_conv_{i}",
                             probe=".conv1.weight")
        if base is None:
            break
        out[f"res_conv_{i}"] = {
            "conv1": _conv_from(sub, f"{base}.conv1"),
            "conv2": _conv_from(sub, f"{base}.conv2"),
        }
        i += 1
    f1 = sub.first_mod("fc1", "mlp.0")
    fo = sub.first_mod("fc_out", "fc2", "mlp.2")
    if f1 is not None:
        out["fc1"] = _linear_from(sub, f1)
    if fo is not None:
        out["fc_out"] = _linear_from(sub, fo)
    return out


def convert_mlp_head(sub: _SubDict) -> Dict[str, Any]:
    """UniCeption MLPHead (scale head) -> MLPHead params."""
    out: Dict[str, Any] = {}
    f1 = sub.first_mod("fc1", "mlp.0")
    f2 = sub.first_mod("fc2", "mlp.2")
    if f1 is not None:
        out["fc1"] = _linear_from(sub, f1)
    if f2 is not None:
        out["fc2"] = _linear_from(sub, f2)
    return out


# Our flax param-tree paths (models/mapanything.py module names).
_DENSE_REP_ENCODERS = ("ray_dirs_encoder", "depth_encoder")
_GLOBAL_REP_ENCODERS = (
    "depth_scale_encoder",
    "cam_rot_encoder",
    "cam_trans_encoder",
    "cam_trans_scale_encoder",
)


def convert_mapanything_checkpoint(
    sd: Mapping[str, Any], trunk_indices: Tuple[int, ...] = (11, 17)
) -> Dict[str, Any]:
    """Full MapAnything checkpoint -> MapAnything flax params (inner tree).

    Consumes every tensor of a reference-shaped state_dict; returns the
    params with two bookkeeping entries popped by callers:
      '_unconverted': keys no rule matched (must be [] for a supported ckpt);
      '_aliases': keys skipped as known duplicates (dense_head.{0,1}.*
          re-registrations of dpt_feature_head/dpt_regressor_head, and the
          frozen DINOv2 mask_token our encoder never uses).
    """
    # Strip DDP/namespace wrappers.
    for wrapper in ("module.", "model."):
        if all(k.startswith(wrapper) for k in sd):
            sd = {k[len(wrapper):]: v for k, v in sd.items()}

    out: Dict[str, Any] = {}
    consumed: set = set()
    aliases = []

    def run(prefix: str, fn, *args, **kw):
        sub = _SubDict(sd, prefix)
        if not sub.d:
            return None
        res = fn(sub, *args, **kw)
        consumed.update(prefix + k for k in sub.used)
        return res

    # --- encoder: route by family signature keys --------------------------
    # RADIO checkpoints carry an input_conditioner + patch_generator; CroCo
    # encoders use enc_blocks/enc_norm; DINOv2 has cls_token + patch_embed.
    # Each family's signature is disjoint, so the first match wins.
    def _find_prefix(pattern: str):
        for k in sd:
            m = re.match(pattern, k)
            if m is not None:
                return m.group(1)
        return None

    radio_prefix = _find_prefix(
        r"^(encoder\..*?|)input_conditioner\.norm_mean$")
    croco_prefix = _find_prefix(
        r"^(encoder\..*?|)enc_blocks\.0\.norm1\.weight$")
    dino_prefix = None
    if radio_prefix is None and croco_prefix is None:
        dino_prefix = _find_prefix(r"^(encoder\..*?|)patch_embed\.proj\.weight$")

    enc_prefix = radio_prefix if radio_prefix is not None else (
        croco_prefix if croco_prefix is not None else dino_prefix)
    if enc_prefix is not None:
        if radio_prefix is not None:
            enc_params, _ = convert_radio(sd, enc_prefix)
        elif croco_prefix is not None:
            enc_params, _ = convert_croco(sd, enc_prefix)
        else:
            enc_params, _ = convert_dinov2(sd, enc_prefix)
        out["encoder"] = enc_params
        for k in sd:
            if k.startswith(enc_prefix):
                if k.endswith("mask_token"):
                    aliases.append(k)  # frozen, unused at inference
                else:
                    consumed.add(k)

    # --- prior encoders + fusion ------------------------------------------
    for name in _DENSE_REP_ENCODERS:
        res = run(f"{name}.", convert_dense_rep_encoder)
        if res:
            out[name] = res
    for name in _GLOBAL_REP_ENCODERS:
        res = run(f"{name}.", convert_global_rep_encoder)
        if res:
            out[name] = res
    if "fusion_norm_layer.weight" in sd:
        out["fusion_norm"] = layer_norm(
            sd["fusion_norm_layer.weight"], sd["fusion_norm_layer.bias"]
        )
        consumed.update(("fusion_norm_layer.weight", "fusion_norm_layer.bias"))
    if "scale_token" in sd:
        out["scale_token"] = _t(sd["scale_token"]).reshape(-1)
        consumed.add("scale_token")

    # --- trunk ------------------------------------------------------------
    res = run("info_sharing.", convert_trunk, indices=trunk_indices)
    if res:
        out["info_sharing"] = res

    # --- heads --------------------------------------------------------------
    dense_head: Dict[str, Any] = {}
    res = run("dpt_feature_head.", convert_dpt_feature)
    if res:
        dense_head["dpt_feature"] = res
    res = run("dpt_regressor_head.", convert_dpt_regressor)
    if res:
        dense_head["dpt_regressor"] = res
    if dense_head:
        out["dense_head"] = dense_head
    res = run("pose_head.", convert_pose_head)
    if res:
        out["pose_head"] = res
    res = run("scale_head.", convert_mlp_head)
    if res:
        out["scale_head"] = res

    # dense_head.{0,1}.* are re-registrations of the same tensors
    # (model.py:378 nn.Sequential aliasing) — consume as known duplicates.
    for k in sd:
        if k.startswith("dense_head.") and k not in consumed:
            aliases.append(k)

    unconverted = [k for k in sd if k not in consumed and k not in aliases]
    if unconverted:
        out["_unconverted"] = unconverted
    if aliases:
        out["_aliases"] = aliases
    return out


def infer_model_config(
    sd: Mapping[str, Any], indices: Tuple[int, ...] = (11, 17)
) -> Dict[str, Any]:
    """Derive architecture dimensions from a checkpoint's tensor shapes.

    Resolves the layout unknowns that cannot be pinned offline (trunk depth
    counting, DPT hidden widths) directly from the data — the checkpoint is
    the source of truth, not an assumption.
    """
    cfg: Dict[str, Any] = {}
    for wrapper in ("module.", "model."):
        if all(k.startswith(wrapper) for k in sd):
            sd = {k[len(wrapper):]: v for k, v in sd.items()}

    def shape(k):
        v = sd[k]
        return tuple(v.shape) if hasattr(v, "shape") else np.asarray(v).shape

    if "scale_token" in sd:
        cfg["enc_dim"] = int(np.prod(shape("scale_token")))

    n_flat = 0
    while f"info_sharing.blocks.{n_flat}.norm1.weight" in sd:
        n_flat += 1
    n_pairs = 0
    while f"info_sharing.frame_blocks.{n_pairs}.norm1.weight" in sd:
        n_pairs += 1
    if n_flat:
        cfg["trunk_depth"] = n_flat
        cfg["trunk_dim"] = shape("info_sharing.blocks.0.norm1.weight")[0]
        cfg["trunk_indices"] = tuple(indices)
    elif n_pairs:
        cfg["trunk_depth"] = 2 * n_pairs
        cfg["trunk_dim"] = shape("info_sharing.frame_blocks.0.norm1.weight")[0]
        cfg["trunk_indices"] = tuple(2 * i + 1 for i in indices)

    for key, name in (
        ("dpt_feature_head.scratch.layer1_rn.weight", "dpt_feature_dim"),
    ):
        if key in sd:
            cfg[name] = shape(key)[0]
    if all(f"dpt_feature_head.projects.{i}.weight" in sd for i in range(4)):
        cfg["dpt_out_channels"] = tuple(
            shape(f"dpt_feature_head.projects.{i}.weight")[0] for i in range(4)
        )
    c1 = next((k for k in ("dpt_regressor_head.output_conv1.weight",
                           "dpt_regressor_head.conv1.weight") if k in sd), None)
    c2 = next((k for k in ("dpt_regressor_head.output_conv2.0.weight",
                           "dpt_regressor_head.conv2.weight") if k in sd), None)
    co = next((k for k in ("dpt_regressor_head.output_conv2.2.weight",
                           "dpt_regressor_head.conv_out.weight") if k in sd), None)
    if c1 and c2:
        cfg["dpt_hidden_dims"] = (shape(c1)[0], shape(c2)[0])
    if co:
        cfg["dense_output_dim"] = shape(co)[0]
    if "pose_head.fc_out.weight" in sd:
        cfg["pose_out_dim"] = shape("pose_head.fc_out.weight")[0]
    n_res = 0
    while any(f"pose_head.{fam}.{n_res}.conv1.weight" in sd
              for fam in ("res_conv_blocks", "res_conv", "resconv_blocks")):
        n_res += 1
    if n_res:
        cfg["pose_num_resconv"] = n_res
    return cfg


# ---------------------------------------------------------------------------
# scan-layout conversion (MapAnythingConfig.scan_layers)
# ---------------------------------------------------------------------------
_BLOCKS_RE = re.compile(r"^blocks_(\d+)$")
_LAYERS_RE = re.compile(r"^layers_(\d+)$")


def _stack_trees(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp_or_np_stack(xs), *trees)


def jnp_or_np_stack(xs):
    if all(isinstance(x, np.ndarray) for x in xs):
        return np.stack(xs)
    import jax.numpy as jnp

    return jnp.stack(xs)


def stack_scan_params(params):
    """Per-layer param layout -> the nn.scan layout (scan_layers=True).

    Rewrites, anywhere in the tree:
      * ``blocks_{0..D-1}``  -> ``blocks/block/<leaf>`` stacked on axis 0
        (encoder block stacks, nn/layers.BlockScanBody);
      * ``layers_{0..2M-1}`` -> ``pairs/{frame,global}/<leaf>`` with the
        even (frame) and odd (global) layers each stacked on axis 0
        (alternating trunk, nn/trunk._PairScanBody).

    Leaves may be numpy or jax arrays; subtrees without a complete run of
    per-layer keys are left untouched. The inverse is
    `unstack_scan_params` (exact round-trip).
    """
    if not isinstance(params, Mapping):
        return params
    keys = list(params.keys())
    blocks = sorted(
        (int(m.group(1)), k) for k, m in
        ((k, _BLOCKS_RE.match(k)) for k in keys) if m
    )
    layers = sorted(
        (int(m.group(1)), k) for k, m in
        ((k, _LAYERS_RE.match(k)) for k in keys) if m
    )
    out = {}
    if blocks and [i for i, _ in blocks] == list(range(len(blocks))):
        out["blocks"] = {"block": _stack_trees(
            [stack_scan_params(params[k]) for _, k in blocks])}
        consumed = {k for _, k in blocks}
    elif layers and len(layers) % 2 == 0 and (
            [i for i, _ in layers] == list(range(len(layers)))):
        out["pairs"] = {
            "frame": _stack_trees(
                [stack_scan_params(params[k]) for i, k in layers
                 if i % 2 == 0]),
            "global": _stack_trees(
                [stack_scan_params(params[k]) for i, k in layers
                 if i % 2 == 1]),
        }
        consumed = {k for _, k in layers}
    else:
        consumed = set()
    for k in keys:
        if k not in consumed:
            out[k] = stack_scan_params(params[k])
    return out


def unstack_scan_params(params):
    """Inverse of `stack_scan_params`: scan layout -> per-layer layout."""
    if not isinstance(params, Mapping):
        return params
    out = {}
    for k in params.keys():
        v = params[k]
        if k == "blocks" and isinstance(v, Mapping) and set(v) == {"block"}:
            import jax

            leaves = jax.tree_util.tree_leaves(v["block"])
            depth = int(leaves[0].shape[0])
            for i in range(depth):
                out[f"blocks_{i}"] = jax.tree_util.tree_map(
                    lambda x, i=i: x[i], v["block"])
        elif (k == "pairs" and isinstance(v, Mapping)
              and set(v) == {"frame", "global"}):
            import jax

            leaves = jax.tree_util.tree_leaves(v["frame"])
            m = int(leaves[0].shape[0])
            for s in range(m):
                out[f"layers_{2 * s}"] = jax.tree_util.tree_map(
                    lambda x, s=s: x[s], v["frame"])
                out[f"layers_{2 * s + 1}"] = jax.tree_util.tree_map(
                    lambda x, s=s: x[s], v["global"])
        else:
            out[k] = unstack_scan_params(v)
    return out
