"""Visualization exports: GLB point clouds (pure numpy, no trimesh).

Rebuild of the reference's predictions_to_glb (utils/viz.py:181, which uses
trimesh — unavailable here). Writes a valid glTF 2.0 binary (.glb) with a
POSITION + COLOR_0 point primitive readable by any glTF viewer.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, List, Optional

import numpy as np


def write_glb_pointcloud(path: str, points: np.ndarray, colors: np.ndarray
                         ) -> None:
    """points (N, 3) float32, colors (N, 3) float [0,1] or uint8."""
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    if colors.dtype != np.uint8:
        colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    colors = np.ascontiguousarray(colors).reshape(-1, 3)
    # pad colors to vec4 ubyte normalized? vec3 ubyte requires 4-byte stride
    # alignment; use vec4 with alpha 255 for safety
    rgba = np.concatenate(
        [colors, np.full((len(colors), 1), 255, np.uint8)], axis=1
    )

    pos_bytes = points.tobytes()
    col_bytes = rgba.tobytes()
    bin_chunk = pos_bytes + col_bytes
    pad = (-len(bin_chunk)) % 4
    bin_chunk += b"\x00" * pad

    gltf = {
        "asset": {"version": "2.0", "generator": "mapanything_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "COLOR_0": 1},
                "mode": 0,  # POINTS
            }]
        }],
        "accessors": [
            {
                "bufferView": 0, "componentType": 5126, "count": len(points),
                "type": "VEC3",
                "min": points.min(0).tolist(), "max": points.max(0).tolist(),
            },
            {
                "bufferView": 1, "componentType": 5121, "count": len(rgba),
                "type": "VEC4", "normalized": True,
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {"buffer": 0, "byteOffset": len(pos_bytes),
             "byteLength": len(col_bytes)},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * ((-len(json_bytes)) % 4)

    with open(path, "wb") as f:
        total = 12 + 8 + len(json_bytes) + 8 + len(bin_chunk)
        f.write(struct.pack("<4sII", b"glTF", 2, total))
        f.write(struct.pack("<I4s", len(json_bytes), b"JSON"))
        f.write(json_bytes)
        f.write(struct.pack("<I4s", len(bin_chunk), b"BIN\x00"))
        f.write(bin_chunk)


def predictions_to_glb(
    path: str,
    preds: List[Dict],
    max_points: Optional[int] = 2_000_000,
    seed: int = 0,
) -> int:
    """Export per-view prediction dicts (the infer() output contract) as a
    colored GLB point cloud; returns the number of points written."""
    all_pts, all_cols = [], []
    for p in preds:
        pts = np.asarray(p["pts3d"]).reshape(-1, 3)
        cols = np.asarray(p["img_no_norm"]).reshape(-1, 3)
        if "mask" in p:
            m = np.asarray(p["mask"]).reshape(-1).astype(bool)
            pts, cols = pts[m], cols[m]
        all_pts.append(pts)
        all_cols.append(cols)
    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3), np.float32)
    cols = np.concatenate(all_cols) if all_cols else np.zeros((0, 3))
    if max_points and len(pts) > max_points:
        idx = np.random.default_rng(seed).choice(
            len(pts), max_points, replace=False
        )
        pts, cols = pts[idx], cols[idx]
    write_glb_pointcloud(path, pts, cols)
    return len(pts)
