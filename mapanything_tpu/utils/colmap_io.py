"""COLMAP sparse-reconstruction binary writers (pure numpy).

The reference exports COLMAP reconstructions through pycolmap (C++,
demo_colmap.py:534 via third_party/np_to_pycolmap.py); that package is not
available here, and the binary format is simple, so this module writes
cameras.bin / images.bin / points3D.bin directly — the exact format COLMAP
and downstream tools (gsplat, nerfstudio) read.

Format reference: COLMAP src/colmap/scene/reconstruction_io.cc.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional

import numpy as np

# COLMAP camera model ids
CAMERA_MODELS = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1}


def write_cameras_bin(path: str, cameras: List[Dict]) -> None:
    """cameras: [{camera_id, model ('PINHOLE'), width, height,
    params [fx, fy, cx, cy]}]."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras:
            f.write(
                struct.pack(
                    "<iiQQ",
                    cam["camera_id"],
                    CAMERA_MODELS[cam.get("model", "PINHOLE")],
                    cam["width"],
                    cam["height"],
                )
            )
            for p in cam["params"]:
                f.write(struct.pack("<d", float(p)))


def write_images_bin(path: str, images: List[Dict]) -> None:
    """images: [{image_id, qvec (wxyz, world2cam), tvec, camera_id, name,
    xys (N,2), point3d_ids (N,)}]. xys may be empty."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images:
            f.write(struct.pack("<i", im["image_id"]))
            for v in im["qvec"]:
                f.write(struct.pack("<d", float(v)))
            for v in im["tvec"]:
                f.write(struct.pack("<d", float(v)))
            f.write(struct.pack("<i", im["camera_id"]))
            f.write(im["name"].encode() + b"\x00")
            xys = np.asarray(im.get("xys", np.zeros((0, 2))))
            ids = np.asarray(im.get("point3d_ids", np.full(len(xys), -1)))
            f.write(struct.pack("<Q", len(xys)))
            for (x, y), pid in zip(xys, ids):
                f.write(struct.pack("<ddq", float(x), float(y), int(pid)))


def write_points3d_bin(path: str, points: np.ndarray, colors: np.ndarray,
                       errors: Optional[np.ndarray] = None) -> None:
    """points: (N, 3) float; colors: (N, 3) uint8/float in [0,1]."""
    points = np.asarray(points, np.float64)
    if colors.dtype != np.uint8:
        colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    if errors is None:
        errors = np.ones(len(points))
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for i, (p, c, e) in enumerate(zip(points, colors, errors)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<ddd", *p))
            f.write(struct.pack("<BBB", *c))
            f.write(struct.pack("<d", float(e)))
            f.write(struct.pack("<Q", 0))  # empty track


def export_colmap_reconstruction(
    out_dir: str,
    intrinsics: np.ndarray,  # (V, 3, 3)
    cam2world: np.ndarray,  # (V, 4, 4)
    image_sizes: List,  # [(w, h)] per view
    image_names: List[str],
    points: np.ndarray,  # (N, 3)
    colors: np.ndarray,  # (N, 3)
) -> str:
    """Write a full sparse/0-style COLMAP reconstruction; returns the dir.

    COLMAP stores world2cam with wxyz quaternions — converted here from our
    cam2world xyzw convention."""
    from ..data.base_dataset import rotation_matrix_to_quaternion_np

    os.makedirs(out_dir, exist_ok=True)
    cameras, images = [], []
    for i in range(len(intrinsics)):
        K = np.asarray(intrinsics[i])
        w, h = image_sizes[i]
        cameras.append(
            dict(camera_id=i + 1, model="PINHOLE", width=int(w), height=int(h),
                 params=[K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        )
        pose = np.asarray(cam2world[i])
        rot_w2c = pose[:3, :3].T
        t_w2c = -rot_w2c @ pose[:3, 3]
        q_xyzw = rotation_matrix_to_quaternion_np(rot_w2c)
        qvec = [q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]]  # wxyz
        images.append(
            dict(image_id=i + 1, qvec=qvec, tvec=t_w2c, camera_id=i + 1,
                 name=image_names[i])
        )
    write_cameras_bin(os.path.join(out_dir, "cameras.bin"), cameras)
    write_images_bin(os.path.join(out_dir, "images.bin"), images)
    write_points3d_bin(os.path.join(out_dir, "points3D.bin"), points, colors)
    return out_dir


# -- readers (for round-trip validation) ------------------------------------


# COLMAP camera model id -> parameter count (src/colmap/sensor/models.h)
COLMAP_CAMERA_MODEL_PARAMS = {
    0: 3,   # SIMPLE_PINHOLE
    1: 4,   # PINHOLE
    2: 4,   # SIMPLE_RADIAL
    3: 5,   # RADIAL
    4: 8,   # OPENCV
    5: 8,   # OPENCV_FISHEYE
    6: 12,  # FULL_OPENCV
    7: 5,   # FOV
    8: 4,   # SIMPLE_RADIAL_FISHEYE
    9: 5,   # RADIAL_FISHEYE
    10: 12,  # THIN_PRISM_FISHEYE
}


def read_cameras_bin(path: str) -> List[Dict]:
    out = []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cid, model, w, h = struct.unpack("<iiQQ", f.read(24))
            n_params = COLMAP_CAMERA_MODEL_PARAMS[model]
            params = struct.unpack(f"<{n_params}d", f.read(8 * n_params))
            out.append(dict(camera_id=cid, model_id=model, width=w, height=h,
                            params=list(params)))
    return out


def read_images_bin(path: str) -> List[Dict]:
    out = []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            (iid,) = struct.unpack("<i", f.read(4))
            qvec = struct.unpack("<4d", f.read(32))
            tvec = struct.unpack("<3d", f.read(24))
            (cid,) = struct.unpack("<i", f.read(4))
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = struct.unpack("<Q", f.read(8))
            f.read(24 * n_pts)
            out.append(dict(image_id=iid, qvec=list(qvec), tvec=list(tvec),
                            camera_id=cid, name=name.decode()))
    return out


def read_points3d_bin(path: str):
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        pts = np.zeros((n, 3))
        cols = np.zeros((n, 3), np.uint8)
        for i in range(n):
            f.read(8)  # id
            pts[i] = struct.unpack("<3d", f.read(24))
            cols[i] = struct.unpack("<3B", f.read(3))
            f.read(8)  # error
            (track_len,) = struct.unpack("<Q", f.read(8))
            f.read(12 * track_len)
    return pts, cols
