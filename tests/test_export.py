"""COLMAP binary + GLB export round-trip tests."""

import numpy as np
import pytest

from mapanything_tpu.utils.colmap_io import (
    export_colmap_reconstruction,
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
)
from mapanything_tpu.utils.viz import write_glb_pointcloud


class TestColmapIO:
    def test_roundtrip(self, tmp_path, rng):
        v, n = 3, 100
        K = np.tile(np.array([[100.0, 0, 32], [0, 110, 24], [0, 0, 1]]), (v, 1, 1))
        poses = np.tile(np.eye(4), (v, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(v, 3))
        pts = rng.normal(size=(n, 3))
        cols = rng.uniform(size=(n, 3))
        out = export_colmap_reconstruction(
            str(tmp_path / "sparse"), K, poses, [(64, 48)] * v,
            [f"im{i}.png" for i in range(v)], pts, cols,
        )
        cams = read_cameras_bin(f"{out}/cameras.bin")
        assert len(cams) == v
        assert cams[0]["params"] == [100.0, 110.0, 32.0, 24.0]
        assert cams[0]["width"] == 64 and cams[0]["height"] == 48
        ims = read_images_bin(f"{out}/images.bin")
        assert [im["name"] for im in ims] == ["im0.png", "im1.png", "im2.png"]
        # world2cam translation roundtrip: t_w2c = -R^T t  (R = I here)
        np.testing.assert_allclose(ims[1]["tvec"], -poses[1, :3, 3], atol=1e-6)
        rpts, rcols = read_points3d_bin(f"{out}/points3D.bin")
        np.testing.assert_allclose(rpts, pts, atol=1e-9)
        np.testing.assert_array_equal(
            rcols, (np.clip(cols, 0, 1) * 255).astype(np.uint8)
        )


class TestGLB:
    def test_valid_glb_structure(self, tmp_path, rng):
        import json
        import struct

        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.uniform(size=(50, 3))
        path = str(tmp_path / "pc.glb")
        write_glb_pointcloud(path, pts, cols)
        with open(path, "rb") as f:
            magic, version, total = struct.unpack("<4sII", f.read(12))
            assert magic == b"glTF" and version == 2
            jlen, jtype = struct.unpack("<I4s", f.read(8))
            assert jtype == b"JSON"
            gltf = json.loads(f.read(jlen))
            blen, btype = struct.unpack("<I4s", f.read(8))
            assert btype == b"BIN\x00"
            payload = f.read(blen)
        assert gltf["meshes"][0]["primitives"][0]["mode"] == 0
        assert gltf["accessors"][0]["count"] == 50
        # positions round-trip from the binary chunk
        back = np.frombuffer(payload[: 50 * 12], np.float32).reshape(50, 3)
        np.testing.assert_allclose(back, pts)


class TestGLBScene:
    def test_scene_with_frustums(self, tmp_path, rng):
        import json
        import struct

        from mapanything_tpu.utils.viz import write_glb_scene

        pts = rng.normal(size=(200, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (200, 3))
        poses = np.stack([np.eye(4)] * 3)
        poses[1][:3, 3] = [1, 0, 0]
        poses[2][:3, 3] = [0, 1, 0]
        K = np.stack([np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]])] * 3)
        path = str(tmp_path / "scene.glb")
        write_glb_scene(path, pts, cols, poses, K, (64, 48))

        data = open(path, "rb").read()
        magic, _ver, total = struct.unpack_from("<4sII", data, 0)
        assert magic == b"glTF" and total == len(data)
        jlen, _t = struct.unpack_from("<I4s", data, 12)
        g = json.loads(data[20 : 20 + jlen])
        # two meshes: points (mode 0) + frustum lines (mode 1)
        modes = [m["primitives"][0]["mode"] for m in g["meshes"]]
        assert modes == [0, 1]
        # 3 cameras x 8 segments x 2 endpoints
        assert g["accessors"][2]["count"] == 3 * 8 * 2

    def test_scene_without_cameras_falls_back(self, tmp_path, rng):
        from mapanything_tpu.utils.viz import write_glb_scene

        pts = rng.normal(size=(10, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (10, 3))
        path = str(tmp_path / "pc2.glb")
        write_glb_scene(path, pts, cols)
        assert open(path, "rb").read(4) == b"glTF"
