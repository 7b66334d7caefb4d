"""11 training-corpus conversion recipes (data/converters_corpus.py):
synthetic raw-source fixtures -> WAI scenes (round-4 VERDICT item 3).

Every fixture reproduces the source's on-disk layout exactly as the
reference conversion script documents it (each recipe's docstring cites
the script); oracles are independent recomputations — poses checked
against hand-built w2c matrices, depths against the published unit/
disparity formulas, projections against scalar transcriptions.
"""

import gzip
import json
import math
import os
import struct

import numpy as np
import PIL.Image
import pytest

from mapanything_tpu.data.converters_corpus import (
    CORPUS_CONVERTERS,
    SPRING_BASELINE_M,
    _axis_angle_to_rot,
    _quat_xyzw_to_rot,
    convert_ase_scene,
    convert_blendedmvs_scene,
    convert_dl3dv_scene,
    convert_dynamicreplica_scene,
    convert_megadepth_scene,
    convert_mpsd_scene,
    convert_mvs_synth_scene,
    convert_paralleldomain4d_scene,
    convert_sailvos3d_scene,
    convert_spring_scene,
    convert_unrealstereo4k_scene,
    fisheye624_img_from_cam,
    load_float16_png_depth,
    load_pfm,
)
from mapanything_tpu.data.wai import load_data, load_scene_meta, store_data

W, H = 16, 12


def _img(rng, w=W, h=H):
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def _save_png(path, arr):
    path.parent.mkdir(parents=True, exist_ok=True)
    PIL.Image.fromarray(arr).save(path)


def _meta(root, name="scene_meta.json"):
    return load_scene_meta(root / name)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

class TestHelpers:
    def test_quat_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(0)
        for _ in range(5):
            q = rng.normal(size=4)
            np.testing.assert_allclose(
                _quat_xyzw_to_rot(q),
                Rotation.from_quat(q / np.linalg.norm(q)).as_matrix(),
                atol=1e-12)

    def test_rodrigues_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(1)
        for _ in range(5):
            r = rng.normal(size=3)
            np.testing.assert_allclose(
                _axis_angle_to_rot(r),
                Rotation.from_rotvec(r).as_matrix(), atol=1e-12)
        np.testing.assert_allclose(_axis_angle_to_rot([0, 0, 0]),
                                   np.eye(3), atol=1e-15)


# ---------------------------------------------------------------------------
# BlendedMVS
# ---------------------------------------------------------------------------

def _write_pfm(path, arr):
    path.parent.mkdir(parents=True, exist_ok=True)
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.ascontiguousarray(arr[::-1]).astype("<f").tobytes())


def _write_blendedmvs(root, scene, n=2):
    rng = np.random.default_rng(3)
    src = root / scene
    w2cs = []
    for i in range(n):
        name = f"{i:08d}"
        _save_png(src / "blended_images" / f"{name}.jpg", _img(rng))
        depth = np.full((H, W), 2.0 + i, np.float32)
        _write_pfm(src / "rendered_depth_maps" / f"{name}.pfm", depth)
        q = rng.normal(size=4)
        w2c = np.eye(4)
        w2c[:3, :3] = _quat_xyzw_to_rot(q)
        w2c[:3, 3] = rng.normal(size=3)
        w2cs.append(w2c)
        K = np.array([[20.0, 0, W / 2], [0, 21.0, H / 2], [0, 0, 1]])
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.17g}" for v in row) for row in w2c]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.17g}" for v in row) for row in K]
        (src / "cams").mkdir(parents=True, exist_ok=True)
        (src / "cams" / f"{name}_cam.txt").write_text("\n".join(lines))
    # a pair file that must be ignored (blendedmvs.py:113)
    (src / "cams" / "pair.txt").write_text("ignored")
    return w2cs


class TestBlendedMVS:
    def test_pfm_roundtrip(self, tmp_path):
        arr = np.arange(H * W, dtype=np.float32).reshape(H, W)
        _write_pfm(tmp_path / "x.pfm", arr)
        np.testing.assert_array_equal(load_pfm(tmp_path / "x.pfm"), arr)

    def test_convert(self, tmp_path):
        w2cs = _write_blendedmvs(tmp_path / "raw", "5a2a95f0")
        dst = convert_blendedmvs_scene(tmp_path / "raw", tmp_path / "wai",
                                       "5a2a95f0")
        meta = _meta(dst)
        assert meta["scale_type"] == "colmap"  # SfM scale, not metric
        assert len(meta["frames"]) == 2
        for i, frame in enumerate(meta["frames"]):
            got = np.asarray(frame["transform_matrix"])
            np.testing.assert_allclose(got, np.linalg.inv(w2cs[i]),
                                       atol=1e-9)
            depth = load_data(dst / frame["depth"], "depth")
            np.testing.assert_allclose(depth, 2.0 + i, atol=1e-6)
            assert frame["fl_x"] == 20.0 and frame["fl_y"] == 21.0
            assert (dst / frame["image"]).exists()


# ---------------------------------------------------------------------------
# DL3DV
# ---------------------------------------------------------------------------

def _write_dl3dv(root, split="1K", sid="abc123", portrait=False):
    src = root / split / sid
    (src / "images").mkdir(parents=True, exist_ok=True)
    (src / "colmap").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(4)
    frames = []
    c2ws = []
    for i in range(2):
        name = f"frame_{i:05d}"
        _save_png(src / "images" / f"{name}.png", _img(rng))
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_xyzw_to_rot(rng.normal(size=4))
        c2w[:3, 3] = rng.normal(size=3)
        c2ws.append(c2w)
        frames.append({"file_path": f"images/{name}.png",
                       "transform_matrix": c2w.tolist(),
                       "colmap_im_id": i + 1})
    meta = {
        "h": W if portrait else H, "w": H if portrait else W,
        "fl_x": 18.0, "fl_y": 19.0, "cx": W / 2, "cy": H / 2,
        "k1": 0.01, "k2": -0.001, "p1": 0.0, "p2": 0.0,
        "camera_model": "OPENCV",
        "applied_transform": np.eye(4)[:3].tolist(),
        "frames": frames,
    }
    with open(src / "transforms.json", "w") as f:
        json.dump(meta, f)
    return c2ws


class TestDL3DV:
    def test_convert(self, tmp_path):
        c2ws = _write_dl3dv(tmp_path / "raw")
        dst = convert_dl3dv_scene(tmp_path / "raw", tmp_path / "wai",
                                  "1K_abc123")
        meta = _meta(dst, "scene_meta_distorted.json")
        assert meta["shared_intrinsics"] and meta["camera_model"] == "OPENCV"
        assert meta["k1"] == 0.01
        assert "colmap" in meta["scene_modalities"]
        assert (dst / "colmap").exists()
        for i, frame in enumerate(meta["frames"]):
            got = np.asarray(frame["transform_matrix"])
            want = c2ws[i].copy()
            want[:3, 1] *= -1  # gl2cv: negate camera y/z axes
            want[:3, 2] *= -1
            np.testing.assert_allclose(got, want, atol=1e-9)
            assert frame["colmap_im_id"] == i + 1
            assert (dst / frame["image_distorted"]).exists()

    def test_portrait_refused(self, tmp_path):
        _write_dl3dv(tmp_path / "raw", sid="port", portrait=True)
        with pytest.raises(ValueError, match="portrait"):
            convert_dl3dv_scene(tmp_path / "raw", tmp_path / "wai",
                                "1K_port")


# ---------------------------------------------------------------------------
# DynamicReplica
# ---------------------------------------------------------------------------

def _write_f16_png(path, depth):
    path.parent.mkdir(parents=True, exist_ok=True)
    coded = depth.astype(np.float16).view(np.uint16)
    PIL.Image.fromarray(coded, mode="I;16").save(path)


def _write_dynamicreplica(root, scene="90ac3c-3_obj_source"):
    rng = np.random.default_rng(5)
    annots = []
    for side in ("left", "right"):
        for i in range(2):
            img_name = f"{scene}_{side}-{i:04d}.png"
            _save_png(root / f"{scene}_{side}" / "images" / img_name,
                      _img(rng))
            depth_rel = f"{scene}_{side}/depths/{scene}_{side}_{i:04d}.png"
            _write_f16_png(root / depth_rel,
                           np.full((H, W), 1.5 + i, np.float32))
            annots.append({
                "sequence_name": scene.replace("_source", ""),
                "camera_name": side,
                "frame_number": i,
                "image": {"path": f"{scene}_{side}/images/{img_name}",
                          "size": [H, W]},
                "depth": {"path": depth_rel},
                "viewpoint": {
                    "focal_length": [2.0, 2.2],
                    "principal_point": [0.1, -0.05],
                    "R": np.eye(3).tolist(),
                    "T": [0.5 * i, 0.0, 1.0],
                },
            })
    (root / f"{scene}_left" / "images" / "done.ok").write_text("")
    with gzip.open(root / "frame_annotations_train.jgz", "wt",
                   encoding="utf-8") as f:
        json.dump(annots, f)


class TestDynamicReplica:
    def test_f16_png_roundtrip(self, tmp_path):
        d = np.linspace(0.5, 8.0, H * W).reshape(H, W).astype(np.float32)
        _write_f16_png(tmp_path / "d.png", d)
        got = load_float16_png_depth(tmp_path / "d.png")
        np.testing.assert_allclose(got, d.astype(np.float16), rtol=1e-3)

    def test_convert(self, tmp_path):
        _write_dynamicreplica(tmp_path / "raw")
        dst = convert_dynamicreplica_scene(
            tmp_path / "raw", tmp_path / "wai", "90ac3c-3_obj_source")
        meta = _meta(dst)
        assert len(meta["frames"]) == 4  # 2 stereo pairs
        frame = meta["frames"][0]
        # NDC intrinsics: rescale = min(W,H)/2, c = half - c_ndc*rescale
        rescale = min(W, H) / 2.0
        assert frame["fl_x"] == pytest.approx(2.0 * rescale)
        assert frame["fl_y"] == pytest.approx(2.2 * rescale)
        assert frame["cx"] == pytest.approx(W / 2 - 0.1 * rescale)
        assert frame["cy"] == pytest.approx(H / 2 + 0.05 * rescale)
        # pytorch3d R=I, T=[0,0,1] -> c2w = [diag(-1,-1,1) | -R t']
        got = np.asarray(frame["transform_matrix"])
        np.testing.assert_allclose(np.diag(got[:3, :3]), [-1, -1, 1],
                                   atol=1e-12)
        np.testing.assert_allclose(got[:3, 3], [0, 0, -1], atol=1e-12)
        depth = load_data(dst / frame["depth"], "depth")
        np.testing.assert_allclose(depth, 1.5, atol=1e-3)


# ---------------------------------------------------------------------------
# MegaDepth
# ---------------------------------------------------------------------------

def _write_megadepth(root, scene="0000", sub="0"):
    import h5py

    rng = np.random.default_rng(6)
    sparse = root / scene / "sparse" / "manhattan" / sub
    sparse.mkdir(parents=True, exist_ok=True)
    focal = 20.0
    sparse.joinpath("cameras.txt").write_text(
        "# h1\n# h2\n# h3\n"
        f"1 SIMPLE_RADIAL {W} {H} {focal} {W / 2} {H / 2} 0.0\n")
    img_ids = ["a.jpg", "b.jpg"]
    lines = ["# h1", "# h2", "# h3", "# h4"]
    w2cs = {}
    for i, img_id in enumerate(img_ids):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        w2c = np.eye(4)
        # COLMAP order qw qx qy qz
        w2c[:3, :3] = _quat_xyzw_to_rot([q[1], q[2], q[3], q[0]])
        w2c[:3, 3] = t
        w2cs[img_id] = w2c
        lines.append(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 {img_id}")
        lines.append("1.0 2.0 -1")  # POINTS2D row
    sparse.joinpath("images.txt").write_text("\n".join(lines))
    dense = root / scene / f"dense{sub}"
    for img_id in img_ids:
        _save_png(dense / "imgs" / img_id.replace(".jpg", ".png"), _img(rng))
        os.rename(dense / "imgs" / img_id.replace(".jpg", ".png"),
                  dense / "imgs" / img_id)
        (dense / "depths").mkdir(parents=True, exist_ok=True)
        with h5py.File(dense / "depths" / (img_id[:-4] + ".h5"), "w") as f:
            f.create_dataset("depth", data=np.full((H, W), 3.0, np.float32))
    np.savez(root / "megadepth_pairs.npz",
             scenes=np.array([f"{scene} {sub}"], object),
             images=np.array(img_ids, object),
             pairs=np.array([[0, 0, 1, 0.5]]))
    return w2cs


class TestMegaDepth:
    def test_convert(self, tmp_path):
        w2cs = _write_megadepth(tmp_path / "raw")
        dst = convert_megadepth_scene(tmp_path / "raw", tmp_path / "wai",
                                      "0000_0")
        meta = _meta(dst)
        assert meta["scale_type"] == "colmap"
        assert len(meta["frames"]) == 2
        for frame in meta["frames"]:
            img_id = frame["frame_name"] + ".jpg"
            got = np.asarray(frame["transform_matrix"])
            np.testing.assert_allclose(got, np.linalg.inv(w2cs[img_id]),
                                       atol=1e-9)
            # zero distortion, same size: rectified K ~ original (cv2's
            # inscribed-rectangle fit insets by pixel centers, which at a
            # 16-px fixture inflates the focal ~10%; centered principal)
            assert frame["fl_x"] == pytest.approx(20.0, rel=0.15)
            assert frame["cx"] == pytest.approx((W - 1) / 2, abs=1.0)
            depth = load_data(dst / frame["depth"], "depth")
            np.testing.assert_allclose(depth, 3.0, atol=1e-6)

    def test_missing_pairs_file_raises(self, tmp_path):
        _write_megadepth(tmp_path / "raw")
        os.remove(tmp_path / "raw" / "megadepth_pairs.npz")
        with pytest.raises(FileNotFoundError, match="pairs"):
            convert_megadepth_scene(tmp_path / "raw", tmp_path / "wai2",
                                    "0000_0")


# ---------------------------------------------------------------------------
# MPSD
# ---------------------------------------------------------------------------

def _write_mpsd(root, scene_folder="2019-03-17T16_16_24",
                recon="geoeven_4", n=2):
    rng = np.random.default_rng(7)
    recon_dir = root / "reconstruction_data" / recon / scene_folder
    recon_dir.mkdir(parents=True, exist_ok=True)
    names = [f"img{i}" for i in range(n)]
    recon_dir.joinpath("image_list.txt").write_text(
        "\n".join(f"some/prefix/{n}" for n in names))
    shots = {}
    rvecs = {}
    for name in names:
        rvec = rng.normal(size=3) * 0.3
        rvecs[name] = rvec
        shots[name] = {"rotation": rvec.tolist(),
                       "translation": rng.normal(size=3).tolist()}
    with open(recon_dir / "reconstruction.json", "w") as f:
        json.dump([{"shots": shots}], f)
    (root / "train").mkdir(exist_ok=True)
    meta = {}
    for name in names:
        meta[name] = {"focal": 0.9}
        # image at 2x the depth resolution: must be resized down
        _save_png(root / "train" / f"{name}.jpg", _img(rng, 2 * W, 2 * H))
        depth_cm = np.full((H, W), 250, np.uint16)  # 2.5 m
        PIL.Image.fromarray(depth_cm, mode="I;16").save(
            root / "train" / f"{name}.png")
    with open(root / "train.json", "w") as f:
        json.dump(meta, f)
    with open(root / "val.json", "w") as f:
        json.dump({}, f)
    return shots


class TestMPSD:
    def test_convert(self, tmp_path):
        shots = _write_mpsd(tmp_path / "raw")
        dst = convert_mpsd_scene(tmp_path / "raw", tmp_path / "wai",
                                 "geoeven_4_2019-03-17T16_16_24")
        meta = _meta(dst)
        assert len(meta["frames"]) == 2
        for frame in meta["frames"]:
            shot = shots[frame["frame_name"]]
            w2c = np.eye(4)
            w2c[:3, :3] = _axis_angle_to_rot(shot["rotation"])
            w2c[:3, 3] = shot["translation"]
            np.testing.assert_allclose(
                np.asarray(frame["transform_matrix"]),
                np.linalg.inv(w2c), atol=1e-9)
            assert frame["fl_x"] == pytest.approx(0.9 * max(W, H))
            assert frame["cx"] == pytest.approx(W / 2)
            depth = load_data(dst / frame["depth"], "depth")
            np.testing.assert_allclose(depth, 2.5, atol=1e-6)  # cm -> m
            img = load_data(dst / frame["image"], "image")
            assert img.shape == (H, W, 3)  # resized to depth res

    def test_fewer_than_two_frames_skips(self, tmp_path):
        _write_mpsd(tmp_path / "raw", n=1)
        dst = convert_mpsd_scene(tmp_path / "raw", tmp_path / "wai",
                                 "geoeven_4_2019-03-17T16_16_24")
        meta = _meta(dst)
        assert meta["frames"] == []
        assert "skipped_reason" in meta
        assert not (dst / "images").exists()


# ---------------------------------------------------------------------------
# MVS-Synth
# ---------------------------------------------------------------------------

def _write_mvs_synth(root, scene="0000"):
    rng = np.random.default_rng(8)
    src = root / scene
    w2cs = []
    for i in range(2):
        name = f"{i:04d}"
        _save_png(src / "images" / f"{name}.png", _img(rng))
        depth = np.full((H, W), 30.0, np.float32)
        depth[0, 0] = np.inf  # sky
        (src / "depths").mkdir(parents=True, exist_ok=True)
        store_data(src / "depths" / f"{name}.exr", depth, "depth")
        w2c = np.eye(4)
        w2c[:3, :3] = _quat_xyzw_to_rot(rng.normal(size=4))
        w2c[:3, 3] = rng.normal(size=3)
        w2cs.append(w2c)
        (src / "poses").mkdir(parents=True, exist_ok=True)
        with open(src / "poses" / f"{name}.json", "w") as f:
            json.dump({"extrinsic": w2c.tolist(), "f_x": 21.0, "f_y": 22.0,
                       "c_x": W / 2, "c_y": H / 2}, f)
    return w2cs


class TestMVSSynth:
    def test_convert(self, tmp_path):
        w2cs = _write_mvs_synth(tmp_path / "raw")
        dst = convert_mvs_synth_scene(tmp_path / "raw", tmp_path / "wai",
                                      "0000")
        meta = _meta(dst)
        flip_y = np.diag([1.0, -1.0, 1.0, 1.0])
        for i, frame in enumerate(meta["frames"]):
            want = flip_y @ np.linalg.inv(w2cs[i])
            want[:3, 3] /= 10.0  # metric recalibration
            np.testing.assert_allclose(
                np.asarray(frame["transform_matrix"]), want, atol=1e-9)
            depth = load_data(dst / frame["depth"], "depth")
            assert depth[0, 0] == 0.0  # inf sky -> 0
            np.testing.assert_allclose(depth[1:], 3.0, atol=1e-6)  # /10


# ---------------------------------------------------------------------------
# ParallelDomain-4D
# ---------------------------------------------------------------------------

def _write_pd4d(root, scene="scene_000000"):
    rng = np.random.default_rng(9)
    src = root / scene
    (src / "calibration").mkdir(parents=True, exist_ok=True)
    with open(src / "calibration" / "calib.json", "w") as f:
        json.dump({"names": ["camera0"],
                   "intrinsics": [{"fx": 24.0, "fy": 25.0,
                                   "cx": W / 2, "cy": H / 2}]}, f)
    data = []
    poses = []
    for i in range(2):
        name = f"{i:018d}"
        _save_png(src / "rgb" / "camera0" / f"{name}.png", _img(rng))
        depth = np.full((H, W), 40.0, np.float32)
        depth[0, 0] = 600.0  # beyond the 500 m validity bound
        (src / "depth" / "camera0").mkdir(parents=True, exist_ok=True)
        np.savez(src / "depth" / "camera0" / f"{name}.npz", data=depth)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        poses.append((q, t))
        data.append({"datum": {"image": {
            "filename": f"rgb/camera0/{name}.png",
            "annotations": {"6": f"depth/camera0/{name}.npz"},
            "pose": {"translation": {"x": t[0], "y": t[1], "z": t[2]},
                     "rotation": {"qx": q[0], "qy": q[1], "qz": q[2],
                                  "qw": q[3]}},
        }}})
    with open(src / "scene_abcdef.json", "w") as f:
        json.dump({"data": data}, f)
    return poses


class TestParallelDomain4D:
    def test_convert(self, tmp_path):
        poses = _write_pd4d(tmp_path / "raw")
        dst = convert_paralleldomain4d_scene(
            tmp_path / "raw", tmp_path / "wai", "scene_000000")
        meta = _meta(dst)
        lfu_to_rdf = np.array([[0, 0, 1, 0], [1, 0, 0, 0],
                               [0, 1, 0, 0], [0, 0, 0, 1]], np.float64)
        for i, frame in enumerate(meta["frames"]):
            q, t = poses[i]
            pose_lfu = np.eye(4)
            pose_lfu[:3, :3] = _quat_xyzw_to_rot(q)
            pose_lfu[:3, 3] = t
            np.testing.assert_allclose(
                np.asarray(frame["transform_matrix"]),
                lfu_to_rdf @ pose_lfu, atol=1e-9)
            depth = load_data(dst / frame["depth"], "depth")
            assert depth[0, 0] == 0.0  # >500 masked
            np.testing.assert_allclose(depth[1:], 40.0, atol=1e-6)
            assert frame["fl_x"] == 24.0


# ---------------------------------------------------------------------------
# SAIL-VOS 3D
# ---------------------------------------------------------------------------

def _write_sailvos(root, scene="ah_3a_ext"):
    import yaml

    rng = np.random.default_rng(10)
    src = root / scene
    gl_c2ws = []
    for i in range(2):
        name = f"{i:018d}"
        img = PIL.Image.fromarray(_img(rng))
        (src / "images").mkdir(parents=True, exist_ok=True)
        img.save(src / "images" / f"{name}.bmp")
        # raw NDC depth with P_inv = I: depth_cam = -(raw/6 - 4e-5)
        raw = np.full((H, W), 6.0 * (-2.0 + 4e-5), np.float32)
        raw[0, 0] = 24e-5  # sky marker
        (src / "depth").mkdir(parents=True, exist_ok=True)
        np.save(src / "depth" / f"{name}.npy", raw)
        (src / "rage_matrices").mkdir(parents=True, exist_ok=True)
        np.savez(src / "rage_matrices" / f"{name}.npz", P_inv=np.eye(4))
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_xyzw_to_rot(rng.normal(size=4))
        c2w[:3, 3] = rng.normal(size=3)
        gl_c2ws.append(c2w)
        K_ndc = [[26.0, 0.0, -W / 2.0], [0.0, 27.0, -H / 2.0],
                 [0.0, 0.0, 1.0]]
        (src / "camera").mkdir(parents=True, exist_ok=True)
        with open(src / "camera" / f"{name}.yaml", "w") as f:
            yaml.safe_dump(
                {"K": K_ndc,
                 "Rt": np.linalg.inv(c2w)[:3].tolist()}, f)
    return gl_c2ws


class TestSailvos3D:
    def test_convert(self, tmp_path):
        gl_c2ws = _write_sailvos(tmp_path / "raw")
        dst = convert_sailvos3d_scene(tmp_path / "raw", tmp_path / "wai",
                                      "ah_3a_ext")
        meta = _meta(dst)
        for i, frame in enumerate(meta["frames"]):
            want = gl_c2ws[i].copy()
            want[:3, 1] *= -1  # gl2cv
            want[:3, 2] *= -1
            np.testing.assert_allclose(
                np.asarray(frame["transform_matrix"]), want, atol=1e-6)
            # NDC principal shift: cx = K_ndc_cx + w/2 = 0 + ... here -w/2+w/2
            assert frame["cx"] == pytest.approx(0.0, abs=1e-9)
            assert frame["fl_x"] == 26.0
            depth = load_data(dst / frame["depth"], "depth")
            assert depth[0, 0] == 0.0  # sky
            np.testing.assert_allclose(depth[1:], 2.0, rtol=1e-4)
            assert (dst / frame["image"]).suffix == ".png"  # bmp -> png


# ---------------------------------------------------------------------------
# Spring
# ---------------------------------------------------------------------------

def _write_spring(root, scene="0001", split="train", n=2):
    import h5py

    rng = np.random.default_rng(11)
    src = root / split / scene
    (src / "cam_data").mkdir(parents=True, exist_ok=True)
    fx, fy = 30.0, 31.0
    np.savetxt(src / "cam_data" / "intrinsics.txt",
               np.tile([fx, fy, W / 2, H / 2], (n, 1)))
    w2cs = []
    if split == "train":
        rows = []
        for _ in range(n):
            w2c = np.eye(4)
            w2c[:3, :3] = _quat_xyzw_to_rot(rng.normal(size=4))
            w2c[:3, 3] = rng.normal(size=3)
            w2cs.append(w2c)
            rows.append(w2c.reshape(-1))
        np.savetxt(src / "cam_data" / "extrinsics.txt", np.stack(rows))
    for i in range(n):
        num = f"{i + 1:04d}"
        for side in ("left", "right"):
            _save_png(src / f"frame_{side}" / f"frame_{side}_{num}.png",
                      _img(rng))
            if split == "train":
                disp = np.full((2 * H, 2 * W), 4.0, np.float32)
                (src / f"disp1_{side}").mkdir(parents=True, exist_ok=True)
                with h5py.File(
                        src / f"disp1_{side}" / f"disp1_{side}_{num}.dsp5",
                        "w") as f:
                    f.create_dataset("disparity", data=disp)
                sky = np.zeros((2 * H, 2 * W), np.uint8)
                sky[0, 0] = 255
                _save_png(src / "maps" / f"skymap_{side}"
                          / f"skymap_{side}_{num}.png", sky)
    return w2cs, fx


class TestSpring:
    def test_convert_train(self, tmp_path):
        w2cs, fx = _write_spring(tmp_path / "raw")
        dst = convert_spring_scene(tmp_path / "raw", tmp_path / "wai",
                                   "0001")
        meta = _meta(dst)
        assert len(meta["frames"]) == 4  # 2 frames x stereo
        left, right = meta["frames"][0], meta["frames"][1]
        np.testing.assert_allclose(
            np.asarray(left["transform_matrix"]),
            np.linalg.inv(w2cs[0]), atol=1e-9)
        w2c_r = w2cs[0].copy()
        w2c_r[0, 3] -= SPRING_BASELINE_M
        np.testing.assert_allclose(
            np.asarray(right["transform_matrix"]),
            np.linalg.inv(w2c_r), atol=1e-9)
        depth = load_data(dst / left["depth"], "depth")
        assert depth.shape == (H, W)  # disparity stored at 2x, subsampled
        np.testing.assert_allclose(depth, fx * SPRING_BASELINE_M / 4.0,
                                   rtol=1e-6)
        assert "skymask" in left
        assert "skymask" in meta["frame_modalities"]

    def test_convert_test_split(self, tmp_path):
        _write_spring(tmp_path / "raw", scene="0003", split="test")
        dst = convert_spring_scene(tmp_path / "raw", tmp_path / "wai",
                                   "0003")
        meta = _meta(dst)
        assert len(meta["frames"]) == 4
        for frame in meta["frames"]:
            assert "transform_matrix" not in frame  # no test extrinsics
            assert "depth" not in frame
        assert "depth" not in meta["frame_modalities"]


# ---------------------------------------------------------------------------
# UnrealStereo4K
# ---------------------------------------------------------------------------

def _write_us4k(root, scene="00000"):
    rng = np.random.default_rng(12)
    src = root / scene
    K = np.array([[32.0, 0, W / 2], [0, 33.0, H / 2], [0, 0, 1.0]])
    w2c0 = np.eye(4)
    w2c0[:3, :3] = _quat_xyzw_to_rot(rng.normal(size=4))
    w2c0[:3, 3] = rng.normal(size=3)
    # camera 1: same orientation, offset 0.2 along the cam x axis
    w2c1 = w2c0.copy()
    w2c1[0, 3] -= 0.2
    name = "00000"
    for idx, w2c in ((0, w2c0), (1, w2c1)):
        _save_png(src / f"Image{idx}" / f"{name}.png", _img(rng))
        (src / f"Extrinsics{idx}").mkdir(parents=True, exist_ok=True)
        (src / f"Extrinsics{idx}" / f"{name}.txt").write_text(
            " ".join(f"{v:.17g}" for v in K.reshape(-1)) + "\n"
            + " ".join(f"{v:.17g}" for v in w2c[:3].reshape(-1)))
        disp = np.full((H, W), 2.0, np.float32)
        disp[0, 0] = 1e-9  # -> huge depth: must be zeroed
        (src / f"Disp{idx}").mkdir(parents=True, exist_ok=True)
        np.save(src / f"Disp{idx}" / f"{name}.npy", disp)
    return w2c0, w2c1, K


class TestUnrealStereo4K:
    def test_convert(self, tmp_path):
        w2c0, w2c1, K = _write_us4k(tmp_path / "raw")
        dst = convert_unrealstereo4k_scene(tmp_path / "raw",
                                           tmp_path / "wai", "00000")
        meta = _meta(dst)
        assert len(meta["frames"]) == 2
        flip_y = np.diag([1.0, -1.0, 1.0, 1.0])
        baseline = np.linalg.norm((w2c0 @ np.linalg.inv(w2c1))[:3, 3])
        assert baseline == pytest.approx(0.2)
        for frame, w2c in zip(meta["frames"], (w2c0, w2c1)):
            np.testing.assert_allclose(
                np.asarray(frame["transform_matrix"]),
                flip_y @ np.linalg.inv(w2c), atol=1e-9)
            depth = load_data(dst / frame["depth"], "depth")
            assert depth[0, 0] == 0.0  # > 10000 bound
            np.testing.assert_allclose(
                depth[1:], baseline * K[0, 0] / 2.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# ASE
# ---------------------------------------------------------------------------

def _fisheye624_scalar(u, v, params):
    """Independent scalar transcription of the Fisheye624 projection."""
    f, cx, cy = params[:3]
    ks = params[3:9]
    p0, p1 = params[9:11]
    s0, s1, s2, s3 = params[11:15]
    r = math.sqrt(u * u + v * v)
    theta = math.atan(r)
    th2 = theta * theta
    theta_d = theta * (1 + sum(k * th2 ** (i + 1)
                               for i, k in enumerate(ks)))
    if r > 1e-12:
        u, v = theta_d * u / r, theta_d * v / r
    r2 = u * u + v * v
    du = 2 * p0 * u * v + p1 * (r2 + 2 * u * u) + s0 * r2 + s1 * r2 * r2
    dv = p0 * (r2 + 2 * v * v) + 2 * p1 * u * v + s2 * r2 + s3 * r2 * r2
    return f * (u + du) + cx, f * (v + dv) + cy


ASE_W = ASE_H = 16


def _write_ase(root, scene="session_0", f=10.0):
    rng = np.random.default_rng(13)
    src = root / scene
    render = src / "render" / "images" / "2"  # camera-rgb render dir
    render.mkdir(parents=True, exist_ok=True)
    for i in range(2):
        _save_png(render / f"rgb{i:07d}.png", _img(rng, ASE_W, ASE_H))
        rng_mm = np.full((ASE_H, ASE_W), 2000, np.uint16)  # 2 m range
        # invalid band deep enough that the pinhole grid (whose atan warp
        # samples away from the source border) still hits it
        rng_mm[:4, :] = 0
        PIL.Image.fromarray(rng_mm, mode="I;16").save(
            render / f"depth{i:07d}.png")
    # trajectory: identity rotation, translation marches in x
    lines = ["graph_uid,tracking_timestamp_us,utc_ns,tx,ty,tz,qx,qy,qz,qw"]
    for i in range(2):
        lines.append(f"g,{i},0,{0.1 * i},0,0,0,0,0,1")
    (src / "gt_trajectory_mps.csv").write_text("\n".join(lines))
    calib = {"CameraCalibrations": [{
        "Label": "camera-rgb",
        "T_Device_Camera": {"Translation": [0.0, 0.0, 0.0],
                            "UnitQuaternion": [1.0, [0.0, 0.0, 0.0]]},
        "Projection": {"Name": "FisheyeRadTanThinPrism",
                       "Params": [f, (ASE_W - 1) / 2, (ASE_H - 1) / 2]
                       + [0.0] * 12},
        "ImageSizes": [ASE_W, ASE_H],
    }]}
    calib_path = root / "calib.json"
    with open(calib_path, "w") as fjson:
        json.dump(calib, fjson)
    return calib_path


class TestASE:
    def test_fisheye624_matches_scalar(self):
        params = np.array([100.0, 32.0, 24.0,
                           0.02, -0.01, 3e-3, -1e-3, 5e-4, -2e-4,
                           1e-3, -2e-3, 2e-4, -1e-4, 3e-4, -2e-4])
        rng = np.random.default_rng(0)
        xy = rng.uniform(-0.7, 0.7, size=(40, 2))
        got = fisheye624_img_from_cam(xy, params)
        want = np.array([_fisheye624_scalar(u, v, list(params))
                         for u, v in xy])
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_convert(self, tmp_path, monkeypatch):
        import mapanything_tpu.data.converters_corpus as cc

        calib_path = _write_ase(tmp_path / "raw")
        # fixture renders are 16px, not the hardwired 704 rgb size
        monkeypatch.setattr(cc, "ASE_RGB_IMAGE_SIZE", ASE_W)
        dst = convert_ase_scene(tmp_path / "raw", tmp_path / "wai",
                                "session_0", calib_path)
        meta = _meta(dst)
        assert meta["shared_intrinsics"]  # single sensor
        assert len(meta["frames"]) == 2
        # portrait rotation swaps the axes (square here, but intrinsics
        # must follow rotate_pinhole_90degcw)
        assert meta["w"] == ASE_H and meta["h"] == ASE_W
        assert meta["cx"] == pytest.approx(
            ASE_H - 1 - (ASE_H - 1) / 2)  # H-1-cy
        frame = meta["frames"][0]
        # identity quat + rot90: pose = traj @ rot90-adjusted identity
        got = np.asarray(frame["transform_matrix"])
        rot90 = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float64)
        np.testing.assert_allclose(got[:3, :3], rot90, atol=1e-12)
        np.testing.assert_allclose(got[:3, 3], [0, 0, 0], atol=1e-12)
        got1 = np.asarray(meta["frames"][1]["transform_matrix"])
        np.testing.assert_allclose(got1[:3, 3], [0.1, 0, 0], atol=1e-12)
        # range 2000 mm -> 2 m at the center ray (ray_norm == 1)
        depth = load_data(dst / frame["depth"], "depth")
        # portrait rotation moved the center; the max is the near-center
        # pixel's 2 m range over its ray norm (principal point is between
        # pixels: nearest grid point sits 0.5 px off on both axes)
        want = 2.0 / math.sqrt(1.0 + 2 * (0.5 / 10.0) ** 2)
        assert depth.max() == pytest.approx(want, rel=1e-3)
        assert (depth == 0).any()
        mask = load_data(dst / frame["mask_path"], "binary")
        assert not mask.all()


# ---------------------------------------------------------------------------
# registry / CLI surface
# ---------------------------------------------------------------------------

def test_registry_covers_all_eleven():
    assert sorted(CORPUS_CONVERTERS) == [
        "ase", "blendedmvs", "dl3dv", "dynamicreplica", "megadepth",
        "mpsd", "mvs_synth", "paralleldomain4d", "sailvos3d", "spring",
        "unrealstereo4k"]


def test_cli_accepts_all_fourteen(tmp_path):
    """scripts/convert_dataset.py drives every recipe (the 3 benchmark
    converters + the 11 corpus ones), with per-source scene discovery."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "convert_dataset",
        pathlib.Path(__file__).parent.parent / "scripts"
        / "convert_dataset.py")
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    # full choice surface
    _write_blendedmvs(tmp_path / "raw_bm", "5a2a95f0")
    cli.main(["blendedmvs", str(tmp_path / "raw_bm"),
              str(tmp_path / "wai_bm")])
    assert (tmp_path / "wai_bm" / "5a2a95f0" / "scene_meta.json").exists()

    # nested discovery: dl3dv 1K buckets
    _write_dl3dv(tmp_path / "raw_dl")
    assert cli._discover_scenes("dl3dv", str(tmp_path / "raw_dl")) == [
        "1K_abc123"]
    cli.main(["dl3dv", str(tmp_path / "raw_dl"), str(tmp_path / "wai_dl")])
    assert (tmp_path / "wai_dl" / "1K_abc123"
            / "scene_meta_distorted.json").exists()

    # discovery shapes for the other nested layouts
    _write_megadepth(tmp_path / "raw_md")
    assert cli._discover_scenes("megadepth",
                                str(tmp_path / "raw_md")) == ["0000_0"]
    _write_spring(tmp_path / "raw_sp")
    assert cli._discover_scenes("spring",
                                str(tmp_path / "raw_sp")) == ["0001"]
    _write_dynamicreplica(tmp_path / "raw_dr")
    assert cli._discover_scenes(
        "dynamicreplica", str(tmp_path / "raw_dr")) == [
            "90ac3c-3_obj_source"]
    _write_mpsd(tmp_path / "raw_mp")
    assert cli._discover_scenes("mpsd", str(tmp_path / "raw_mp")) == [
        "geoeven_4_2019-03-17T16_16_24"]
