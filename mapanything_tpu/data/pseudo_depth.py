"""Pseudo-depth generation stage: run a monocular/MVS adapter over a WAI
scene and write the `pred_depth/<model>` + `pred_mask/<model>` modalities.

Rebuild of the reference's offline labeling stage
(data_processing/wai_processing/scripts/run_moge.py — MoGe over every
frame, storing depth EXRs + sky/ambiguity masks and registering the
modalities in scene_meta; run_mvsanywhere.py is the MVS analogue that also
stores a confidence map). The generation half pairs with the
depth-consistency *filtering* half already in `data/covisibility.py`
(compute_depth_consistency_confidence); `run_depth_consistency_stage`
below wires that filter to a generated modality, producing the
`depth_confidence/<model>` maps the dl3dv-style quirk pipeline thresholds
at load time (wai_datasets.py confidence_modality).

The model plugs in through the benchmark adapter contract
(`models/adapters.py`): anything with `.apply(params, views) ->
{pts3d_cam, non_ambiguous_mask, ...}` works — MoGeAdapter wraps the exact
torch MoGe the reference stage runs; the flagship MapAnything model can
self-label through the same seam.

Modalities are written under the FLAT keys this repo's reader consumes
("pred_depth/moge2" with the same string as frame key), the layout
`wai_datasets.py`'s quirk table reads; the reference nests the same
content as {pred_depth: {moge2: ...}} (run_moge.py:130-157).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from .wai import load_frame, load_scene_meta, store_data

__all__ = ["run_pseudo_depth_stage", "run_depth_consistency_stage"]


def _normalize_images(imgs01: np.ndarray, data_norm_type: str) -> np.ndarray:
    from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

    mean, std = IMAGE_NORMALIZATION_DICT[data_norm_type]
    return (imgs01 - mean.astype(np.float32)) / std.astype(np.float32)


def run_pseudo_depth_stage(
    scene_root: str,
    adapter: Any,
    params: Any = None,
    model_name: str = "moge2",
    batch_frames: int = 4,
    data_norm_type: str = "dinov2",
    image_modality: str = "image",
) -> Path:
    """Label every frame of a WAI scene with predicted depth + valid mask.

    Args:
        scene_root: converted (and, for distorted sources, undistorted)
            WAI scene directory.
        adapter: benchmark-contract model (`models/adapters.py`), e.g.
            ``MoGeAdapter(torch_moge_model)`` — the model the reference's
            run_moge.py stage drives.
        params: adapter params tree ({} for torch-backed adapters).
        model_name: modality suffix — "moge2" reproduces the reference's
            cfg.model_name and is what `wai_datasets.py` quirk specs read.
        batch_frames: frames per adapter call (run_moge.py batch_size).

    Writes pred_depth/<model>/<frame>.exr (z-depth) and
    pred_mask/<model>/<frame>.png, registers both frame modalities, and
    returns the scene root. When the adapter emits its OWN per-pixel
    confidence (a "conf" output — MVS models score their matching cost,
    run_mvsanywhere.py's model does; MapAnything self-labeling emits its
    confidence head), it is stored as depth_confidence/<model> directly
    from the generator — the same modality name the consistency FILTER
    (`run_depth_consistency_stage`) produces, so the quirk pipeline
    thresholds either source identically.
    """
    scene_root = Path(scene_root)
    meta = load_scene_meta(scene_root / "scene_meta.json")
    frames = meta["frames"]
    depth_key = f"pred_depth/{model_name}"
    mask_key = f"pred_mask/{model_name}"
    conf_key = f"depth_confidence/{model_name}"
    wrote_conf = False

    if params is None:
        params = {}
    for start in range(0, len(frames), max(int(batch_frames), 1)):
        chunk = frames[start:start + max(int(batch_frames), 1)]
        imgs = []
        for fr in chunk:
            data = load_frame(scene_root, fr["frame_name"],
                              modalities=[image_modality], scene_meta=meta)
            imgs.append(np.asarray(data[image_modality], np.float32) / 255.0)
        views = {
            # (B=1, V=len(chunk), H, W, 3) framework-normalized, the
            # adapter contract's input layout
            "img": _normalize_images(np.stack(imgs)[None], data_norm_type)
        }
        preds = adapter.apply(params, views)
        z = np.asarray(preds["pts3d_cam"], np.float32)[0, ..., 2]
        m = np.asarray(preds["non_ambiguous_mask"])[0].astype(bool)
        z = np.where(np.isfinite(z) & (z > 0), z, 0.0)
        conf = None
        if "conf" in preds:  # model-emitted confidence (MVS-style)
            conf = np.asarray(preds["conf"], np.float32)[0]
            conf = np.where(np.isfinite(conf), conf, 0.0)
        for i, fr in enumerate(chunk):
            name = fr["frame_name"]
            rel_depth = f"pred_depth/{model_name}/{name}.exr"
            rel_mask = f"pred_mask/{model_name}/{name}.png"
            store_data(scene_root / rel_depth, z[i], "depth")
            store_data(scene_root / rel_mask, m[i], "binary")
            fr[depth_key] = rel_depth
            fr[mask_key] = rel_mask
            if conf is not None:
                rel_conf = f"depth_confidence/{model_name}/{name}.exr"
                store_data(scene_root / rel_conf, conf[i], "depth")
                fr[conf_key] = rel_conf
                wrote_conf = True

    meta["frame_modalities"][depth_key] = {"frame_key": depth_key,
                                           "format": "depth"}
    meta["frame_modalities"][mask_key] = {"frame_key": mask_key,
                                          "format": "binary"}
    if wrote_conf:
        meta["frame_modalities"][conf_key] = {"frame_key": conf_key,
                                              "format": "depth"}
    meta.pop("frame_names", None)  # derived; regenerated by the reader
    store_data(scene_root / "scene_meta.json", meta, "readable")
    return scene_root


def run_depth_consistency_stage(
    scene_root: str,
    depth_modality: str,
    model_name: Optional[str] = None,
    target_size: int = 360,
    **consistency_kwargs,
) -> Path:
    """Score a (pseudo-)depth modality's multi-view consistency per pixel.

    The filtering half of the pseudo-depth pipeline (reference
    depth_consistency_confidence.py): unproject every frame's depth,
    reproject into the others, and store inlier-fraction confidence maps
    as `depth_confidence/<model>` — the modality the dl3dv-style quirk
    pipeline thresholds at train time (wai_datasets.py
    confidence_modality / confidence_threshold).

    Args:
        depth_modality: which depth to score, e.g. "pred_depth/moge2".
        model_name: output suffix; defaults to depth_modality's tail.
    """
    from .covisibility import compute_depth_consistency_confidence

    scene_root = Path(scene_root)
    meta = load_scene_meta(scene_root / "scene_meta.json")
    frames = meta["frames"]
    model_name = model_name or depth_modality.rsplit("/", 1)[-1]
    conf_key = f"depth_confidence/{model_name}"

    depths, Ks, poses = [], [], []
    for fr in frames:
        data = load_frame(scene_root, fr["frame_name"],
                          modalities=[depth_modality], scene_meta=meta)
        depths.append(np.asarray(data[depth_modality], np.float32))
        Ks.append(data["intrinsics"])
        poses.append(data["extrinsics"])
    conf = compute_depth_consistency_confidence(
        np.stack(depths), np.stack(Ks), np.stack(poses),
        target_size=target_size, **consistency_kwargs)

    for i, fr in enumerate(frames):
        rel = f"depth_confidence/{model_name}/{fr['frame_name']}.exr"
        store_data(scene_root / rel, conf[i], "depth")
        fr[conf_key] = rel
    meta["frame_modalities"][conf_key] = {"frame_key": conf_key,
                                          "format": "depth"}
    meta.pop("frame_names", None)
    store_data(scene_root / "scene_meta.json", meta, "readable")
    return scene_root
