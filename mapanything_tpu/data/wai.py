"""WAI-format scene IO (rebuild of mapanything/utils/wai/core.py + io.py).

WAI ("World-As-Input") is the on-disk scene format all 14 training datasets
share: per-scene directory with
    scene_meta.json        — frames list (frame_name, transform_matrix,
                             optional per-frame fx/fy/cx/cy/h/w),
                             frame_names (name -> index), frame_modalities
                             (modality -> {frame_key, format}), shared
                             intrinsics, camera_model, scale_type
    covisibility/v0/*.npy  — NxN pairwise covisibility matrix (mmap'd)
    <modality dirs>        — images (jpg/png), depth (EXR / 16-bit png / npy)

This reader is numpy/PIL/cv2 host-side code by design (SURVEY.md §2.7: IO
stays host-side); tensors are handed to JAX after batching.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np
import PIL.Image

_DEPTH_SCALE_PNG16 = 1000.0  # mm-encoded 16-bit png depth


def load_scene_meta(path: Union[str, Path]) -> Dict[str, Any]:
    """Load scene_meta.json (reference wai/core.py:32 'scene_meta' format)."""
    with open(path) as f:
        meta = json.load(f)
    if "frame_names" not in meta:
        meta["frame_names"] = {
            fr["frame_name"]: i for i, fr in enumerate(meta["frames"])
        }
    return meta


def load_covisibility_mmap(scene_root: Union[str, Path],
                           version: str = "v0") -> np.ndarray:
    """Memory-map the scene's pairwise covisibility matrix
    (reference pattern: datasets/wai/scannetpp.py:88-101)."""
    covis_dir = Path(scene_root) / "covisibility" / version
    npy = next(f for f in os.listdir(covis_dir) if f.endswith(".npy"))
    return np.load(covis_dir / npy, mmap_mode="r")


def _load_depth(path: Path) -> np.ndarray:
    suffix = path.suffix.lower()
    if suffix == ".npy":
        return np.load(path).astype(np.float32)
    if suffix == ".exr":
        import cv2

        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        d = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if d is None:
            raise IOError(f"failed to read EXR {path}")
        if d.ndim == 3:
            d = d[..., 0]
        return d.astype(np.float32)
    if suffix == ".png":
        d = np.asarray(PIL.Image.open(path))
        if d.dtype == np.uint16:
            return d.astype(np.float32) / _DEPTH_SCALE_PNG16
        return d.astype(np.float32)
    raise ValueError(f"unsupported depth format: {path}")


def get_intrinsics(meta: Dict[str, Any], frame: Dict[str, Any]) -> np.ndarray:
    """Pinhole K from per-frame or scene-shared fx/fy/cx/cy."""
    def get(k):
        return frame.get(k, meta.get(k))

    K = np.eye(3, dtype=np.float32)
    K[0, 0] = float(get("fx"))
    K[1, 1] = float(get("fy"))
    K[0, 2] = float(get("cx"))
    K[1, 2] = float(get("cy"))
    return K


def load_frame(
    scene_root: Union[str, Path],
    frame_key: Union[int, str],
    modalities: Optional[List[str]] = None,
    scene_meta: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Load one frame: extrinsics (opencv cam2world), pinhole intrinsics, and
    the requested modalities (reference wai/core.py:357, fmt='np')."""
    scene_root = Path(scene_root)
    if scene_meta is None:
        scene_meta = load_scene_meta(scene_root / "scene_meta.json")

    if isinstance(frame_key, str):
        idx = scene_meta["frame_names"][frame_key]
    else:
        idx = int(frame_key)
    frame = scene_meta["frames"][idx]

    out: Dict[str, Any] = {
        "frame_name": frame["frame_name"],
        "frame_idx": idx,
        "w": frame.get("w", scene_meta.get("w")),
        "h": frame.get("h", scene_meta.get("h")),
    }
    if "transform_matrix" in frame:
        out["extrinsics"] = np.asarray(frame["transform_matrix"], np.float32)
    camera_model = frame.get("camera_model", scene_meta.get("camera_model", "PINHOLE"))
    out["camera_model"] = camera_model
    if camera_model == "PINHOLE":
        out["intrinsics"] = get_intrinsics(scene_meta, frame)

    frame_modalities = scene_meta.get("frame_modalities", {})
    for modality in modalities or []:
        fm = frame_modalities.get(modality)
        if fm is None:
            raise KeyError(
                f"modality {modality!r} not in scene (has: {sorted(frame_modalities)})"
            )
        frame_key_field = fm["frame_key"] if isinstance(fm, dict) else fm
        rel_path = frame[frame_key_field]
        path = scene_root / rel_path
        if "depth" in modality:
            out[modality] = _load_depth(path)
        elif modality in ("image", "rendered_image"):
            out[modality] = np.asarray(
                PIL.Image.open(path).convert("RGB"), dtype=np.uint8
            )
        elif "mask" in modality:
            out[modality] = np.asarray(PIL.Image.open(path)).astype(bool)
        else:
            # generic: npy or image
            if str(path).endswith(".npy"):
                out[modality] = np.load(path)
            else:
                out[modality] = np.asarray(PIL.Image.open(path))
    return out
