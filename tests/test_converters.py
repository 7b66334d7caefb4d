"""Per-source conversion recipes (data/converters.py) + pseudo-depth stage
(data/pseudo_depth.py): synthetic raw-source fixtures convert to WAI scenes
that `wai_datasets.py` loads end-to-end (round-3 VERDICT items 3 + 5).

Oracles are independent: poses/intrinsics checked by reprojecting known 3D
points, the THIN_PRISM_FISHEYE model against a scalar transcription of the
COLMAP camera-model equations, undistorted depth against analytically
constant scenes, rendered depth against a plane's known z.
"""

import json
import math
import os

import numpy as np
import PIL.Image
import pytest

from mapanything_tpu.data.converters import (
    ETH3D_PORTRAIT_IMAGES,
    _gl2cv,
    _pose_from_quat_t,
    _rot90cw_camera,
    _rot90cw_pose,
    convert_eth3d_scene,
    convert_scannetppv2_scene,
    convert_tav2_wb_scene,
    read_ply,
    render_scene_depth_stage,
    thin_prism_fisheye_img_from_cam,
    undistort_eth3d_depth,
    undistort_scene,
)
from mapanything_tpu.data.wai import load_frame, load_scene_meta, store_data


# ---------------------------------------------------------------------------
# THIN_PRISM_FISHEYE camera model
# ---------------------------------------------------------------------------

def _thin_prism_scalar(u, v, params):
    """Independent scalar transcription of COLMAP's ThinPrismFisheye
    ImgFromCam (camera model docs): equidistant warp then polynomial
    distortion — the oracle for the vectorized implementation."""
    fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, sx1, sy1 = params
    r = math.sqrt(u * u + v * v)
    if r > 1e-12:
        theta = math.atan(r)
        u, v = theta * u / r, theta * v / r
    u2, v2, uv, r2 = u * u, v * v, u * v, u * u + v * v
    radial = k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3 + k4 * r2 ** 4
    du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2) + sx1 * r2
    dv = v * radial + p1 * (r2 + 2 * v2) + 2 * p2 * uv + sy1 * r2
    return fx * (u + du) + cx, fy * (v + dv) + cy


class TestThinPrismFisheye:
    PARAMS = np.array([100.0, 110.0, 32.0, 24.0,
                       0.03, -0.01, 1e-3, -2e-3, 5e-4, -1e-4, 2e-4, -3e-4])

    def test_matches_scalar_oracle(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-0.8, 0.8, size=(50, 2))
        got = thin_prism_fisheye_img_from_cam(xy, self.PARAMS)
        want = np.array([_thin_prism_scalar(u, v, list(self.PARAMS))
                         for u, v in xy])
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_on_axis_maps_to_principal_point(self):
        got = thin_prism_fisheye_img_from_cam(
            np.zeros((1, 2)), self.PARAMS)[0]
        np.testing.assert_allclose(got, [32.0, 24.0], atol=1e-12)

    def test_zero_distortion_small_angle_is_pinhole(self):
        params = np.array([100.0, 100.0, 32.0, 24.0] + [0.0] * 8)
        xy = np.array([[1e-3, -2e-3]])
        got = thin_prism_fisheye_img_from_cam(xy, params)[0]
        # atan(r)/r -> 1 as r -> 0: pinhole limit
        np.testing.assert_allclose(
            got, [32.0 + 0.1, 24.0 - 0.2], atol=1e-6)


# ---------------------------------------------------------------------------
# ETH3D
# ---------------------------------------------------------------------------

W, H = 32, 24


def _write_eth3d_scene(root, scene="courtyard", names=("DSC_0001.JPG",
                                                       "DSC_0002.JPG"),
                       depth_value=7.5):
    """Tiny raw ETH3D layout: PINHOLE undistorted calibration, a
    THIN_PRISM_FISHEYE distorted calibration (mild coefficients), constant
    raw depths (so the undistortion resample has an analytic result) and
    random images."""
    src = root / scene
    rng = np.random.default_rng(7)
    for d in ("dslr_calibration_undistorted", "dslr_calibration_jpg",
              "ground_truth_depth/dslr_images",
              "images/dslr_images_undistorted"):
        (src / d).mkdir(parents=True, exist_ok=True)

    (src / "dslr_calibration_undistorted" / "cameras.txt").write_text(
        "# Camera list\n# fmt\n# n\n"
        f"1 PINHOLE {W} {H} 20.0 21.0 {W / 2} {H / 2}\n")
    (src / "dslr_calibration_jpg" / "cameras.txt").write_text(
        "# Camera list\n# fmt\n# n\n"
        f"1 THIN_PRISM_FISHEYE {W} {H} 26.0 27.0 {W / 2} {H / 2} "
        "0.01 -0.002 0.0001 -0.0002 0.0 0.0 0.0 0.0\n")

    quats = []
    lines = ["# Image list", "# fmt", "#", "#"]
    for i, name in enumerate(names):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        quats.append((q, t))
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 "
            f"dslr_images/{name}")
        lines.append("0.0 0.0 -1")  # POINTS2D row
    images_txt = "\n".join(lines) + "\n"
    (src / "dslr_calibration_undistorted" / "images.txt").write_text(
        images_txt)
    (src / "dslr_calibration_jpg" / "images.txt").write_text(images_txt)

    for name in names:
        np.full((H, W), depth_value, np.float32).tofile(
            src / "ground_truth_depth" / "dslr_images" / name)
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(
            src / "images" / "dslr_images_undistorted" / name, format="JPEG")
    return quats


class TestETH3DConversion:
    def test_scene_converts_and_loads(self, tmp_path):
        quats = _write_eth3d_scene(tmp_path / "raw")
        dst = convert_eth3d_scene(tmp_path / "raw", tmp_path / "wai",
                                  "courtyard", raw_depth_hw=(H, W),
                                  link=False)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert meta["camera_model"] == "PINHOLE"
        assert meta["scale_type"] == "metric"
        assert len(meta["frames"]) == 2

        data = load_frame(dst, "DSC_0001", modalities=["image", "depth"])
        assert data["image"].shape == (H, W, 3)
        # constant raw depth: every undistorted sample is the constant
        np.testing.assert_allclose(data["depth"], 7.5, atol=1e-3)
        # pose: inv of the w2c built from the quaternion row
        q, t = quats[0]
        want_c2w = np.linalg.inv(_pose_from_quat_t(q, t))
        np.testing.assert_allclose(data["extrinsics"], want_c2w, atol=1e-5)
        K = data["intrinsics"]
        np.testing.assert_allclose(
            [K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
            [20.0, 21.0, W / 2, H / 2], atol=1e-6)

    def test_portrait_rotation_reprojects_consistently(self):
        """After the 90deg-CW content rotation, the adjusted (K, pose)
        must project any world point to the rotated pixel location:
        (u', v') = (H - v, u) — the geometric contract behind
        eth3d.py adjust_camera_params/pose_for_rotation."""
        rng = np.random.default_rng(3)
        fx, fy, cx, cy = 50.0, 55.0, 17.0, 11.0
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        c2w = np.linalg.inv(_pose_from_quat_t(q, [0.2, -0.1, 0.4]))

        fx2, fy2, cx2, cy2 = _rot90cw_camera([fx, fy, cx, cy], W, H)
        c2w2 = _rot90cw_pose(c2w)

        w2c, w2c2 = np.linalg.inv(c2w), np.linalg.inv(c2w2)
        for _ in range(10):
            X = np.append(rng.normal(size=3), 1.0)
            xc = (w2c @ X)[:3]
            if xc[2] < 0.1:
                continue
            u = fx * xc[0] / xc[2] + cx
            v = fy * xc[1] / xc[2] + cy
            xc2 = (w2c2 @ X)[:3]
            u2 = fx2 * xc2[0] / xc2[2] + cx2
            v2 = fy2 * xc2[1] / xc2[2] + cy2
            np.testing.assert_allclose([u2, v2], [H - v, u], atol=1e-9)

    def test_portrait_quirk_table_carried(self):
        # protocol constants (eth3d.py:212-250)
        assert len(ETH3D_PORTRAIT_IMAGES["relief"]) == 13
        assert "DSC_0711.JPG" in ETH3D_PORTRAIT_IMAGES["delivery_area"]

    def test_depth_undistortion_samples_distorted_grid(self):
        """Raw depth = column index; the undistorted sample at each pinhole
        pixel must equal the THIN_PRISM projection's (clipped) column."""
        fish = np.array([26.0, 27.0, W / 2, H / 2,
                         0.01, -0.002, 1e-4, -2e-4, 0, 0, 0, 0])
        raw = np.tile(np.arange(W, dtype=np.float32), (H, 1))
        out = undistort_eth3d_depth(raw, [20.0, 21.0, W / 2, H / 2],
                                    (H, W), fish, (H, W))
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        xy = np.stack([(gx.ravel() - W / 2) / 20.0,
                       (gy.ravel() - H / 2) / 21.0], -1)
        cols = np.clip(
            thin_prism_fisheye_img_from_cam(xy, fish)[:, 0], 0, W - 1
        ).astype(np.int64).reshape(H, W)
        np.testing.assert_array_equal(out, cols.astype(np.float32))


# ---------------------------------------------------------------------------
# ScanNetPP v2
# ---------------------------------------------------------------------------

def _write_scannetpp_scene(root, scene="0e900bcc5c", n_frames=3,
                           n_test=1, with_mesh=True):
    """Raw ScanNetPP-v2 DSLR layout: nerfstudio transforms.json in OpenGL
    convention with OPENCV_FISHEYE shared intrinsics, distorted images +
    anon masks, a COLMAP text dir, and a plane mesh at z=2 (world) for the
    rendering stage."""
    src = root / scene
    dslr = src / "dslr"
    rng = np.random.default_rng(5)
    (dslr / "resized_images").mkdir(parents=True)
    (dslr / "resized_anon_masks").mkdir(parents=True)
    (dslr / "nerfstudio").mkdir(parents=True)
    (dslr / "colmap").mkdir(parents=True)

    w, h = 64, 48
    frames, test_frames = [], []
    for i in range(n_frames + n_test):
        name = f"frame_{i:06d}.jpg"
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(dslr / "resized_images" / name)
        mask = np.zeros((h, w), np.uint8)
        mask[:, :4] = 255
        PIL.Image.fromarray(mask).save(
            dslr / "resized_anon_masks" / f"frame_{i:06d}.png")
        # opencv c2w: camera at origin looking +z with small x offsets
        c2w_cv = np.eye(4)
        c2w_cv[0, 3] = 0.05 * i
        # store as OpenGL (undo the gl2cv flip: flip y/z columns back)
        c2w_gl = c2w_cv.copy()
        c2w_gl[:3, 1] *= -1
        c2w_gl[:3, 2] *= -1
        rec = {"file_path": name,
               "transform_matrix": c2w_gl.tolist(),
               "mask_path": f"frame_{i:06d}.png"}
        if i < n_frames:
            frames.append(rec)
        else:
            rec["is_bad"] = False
            test_frames.append(rec)

    meta = {
        "camera_model": "OPENCV_FISHEYE",
        "fl_x": 40.0, "fl_y": 40.0, "cx": w / 2, "cy": h / 2,
        "w": w, "h": h,
        "k1": 0.01, "k2": -0.002, "k3": 1e-4, "k4": -1e-5,
        "frames": frames, "test_frames": test_frames,
    }
    with open(dslr / "nerfstudio" / "transforms.json", "w") as f:
        json.dump(meta, f)
    for name in ("cameras", "images", "points3D"):
        (dslr / "colmap" / f"{name}.txt").write_text("# empty\n")

    if with_mesh:
        (src / "scans").mkdir()
        # plane z=2 spanning x,y in [-4, 4]
        verts = [(-4, -4, 2), (4, -4, 2), (4, 4, 2), (-4, 4, 2)]
        lines = ["ply", "format ascii 1.0", "element vertex 4",
                 "property float x", "property float y", "property float z",
                 "element face 2", "property list uchar int vertex_indices",
                 "end_header"]
        lines += [f"{x} {y} {z}" for x, y, z in verts]
        lines += ["3 0 1 2", "3 0 2 3"]
        (src / "scans" / "mesh_aligned_0.05.ply").write_text(
            "\n".join(lines) + "\n")
    return src


class TestScanNetPPConversion:
    def test_convert_merges_test_frames(self, tmp_path):
        _write_scannetpp_scene(tmp_path / "raw")
        dst = convert_scannetppv2_scene(tmp_path / "raw", tmp_path / "wai",
                                        "0e900bcc5c", link=False)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert len(meta["frames"]) == 4  # frames + test_frames merged
        assert meta["camera_model"] == "OPENCV_FISHEYE"
        assert meta["shared_intrinsics"] is True
        assert meta["k1"] == 0.01
        # gl2cv flip: the fixture stored identity-rotation opencv poses
        fr = meta["frames"][0]
        np.testing.assert_allclose(
            np.array(fr["transform_matrix"])[:3, :3], np.eye(3), atol=1e-12)
        assert "colmap" in meta["scene_modalities"]
        assert "mesh" in meta["scene_modalities"]
        assert (dst / fr["image_distorted"]).exists()
        assert (dst / fr["anon_mask_distorted"]).exists()

    def test_benchmark_test_scene_drops_test_frames(self, tmp_path):
        _write_scannetpp_scene(tmp_path / "raw")
        dst = convert_scannetppv2_scene(
            tmp_path / "raw", tmp_path / "wai", "0e900bcc5c",
            test_scene_names=("0e900bcc5c",), link=False)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert len(meta["frames"]) == 3

    def test_gl2cv_is_column_flip(self):
        rng = np.random.default_rng(11)
        c2w = np.eye(4)
        c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        out = _gl2cv(c2w)
        np.testing.assert_allclose(out[:3, 1], -c2w[:3, 1])
        np.testing.assert_allclose(out[:3, 2], -c2w[:3, 2])
        np.testing.assert_allclose(out[:3, 0], c2w[:3, 0])

    def test_full_pipeline_to_dataset(self, tmp_path):
        """conversion -> undistortion -> mesh depth rendering ->
        covisibility -> WAIDataset('scannetpp') — the reference's stage
        chain end-to-end on a synthetic scene."""
        from mapanything_tpu.data.covisibility import (
            compute_pairwise_covisibility,
        )
        from mapanything_tpu.data.wai_datasets import WAIDataset

        _write_scannetpp_scene(tmp_path / "raw")
        dst = convert_scannetppv2_scene(tmp_path / "raw", tmp_path / "wai",
                                        "0e900bcc5c", link=False)
        undistort_scene(dst)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert meta["camera_model"] == "PINHOLE"
        assert "image" in meta["frame_modalities"]

        render_scene_depth_stage(dst)
        meta = load_scene_meta(dst / "scene_meta.json")
        data = load_frame(dst, 0, modalities=["rendered_depth"],
                          scene_meta=meta)
        d = data["rendered_depth"]
        # cameras look straight at the z=2 plane: hit pixels read ~2
        hit = d > 0
        assert hit.mean() > 0.5
        np.testing.assert_allclose(d[hit], 2.0, atol=1e-2)

        # covisibility stage + scene list -> the dataset loads views
        depths, Ks, poses = [], [], []
        for i in range(len(meta["frames"])):
            rec = load_frame(dst, i, modalities=["rendered_depth"],
                             scene_meta=meta)
            depths.append(rec["rendered_depth"])
            Ks.append(rec["intrinsics"])
            poses.append(rec["extrinsics"])
        covis = compute_pairwise_covisibility(
            np.stack(depths), np.stack(Ks), np.stack(poses))
        store_data(dst / "covisibility" / "v0" / "covis.npy", covis, "mmap")

        ds = WAIDataset(
            ROOT=str(tmp_path / "wai"), spec="scannetpp", num_views=2,
            covisibility_thres=0.1, resolution=(64, 48),
            data_norm_type="dinov2", seed=0,
        )
        views = ds[0]
        assert len(views) == 2
        assert views[0]["img"].shape[:2] == (48, 64)
        assert float(np.asarray(views[0]["depthmap"]).max()) > 0


# ---------------------------------------------------------------------------
# TartanAirV2-WB + pseudo-depth stage
# ---------------------------------------------------------------------------

def _write_tav2_scene(root, scene="Supermarket", n=3):
    src = root / scene
    rng = np.random.default_rng(9)
    for d in ("images", "depth", "camera_params", "poses"):
        (src / d).mkdir(parents=True)
    w, h = 40, 30
    K = np.array([[35.0, 0, w / 2], [0, 36.0, h / 2], [0, 0, 1]])
    for i in range(n):
        name = f"{i:08d}_0"
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(src / "images" / f"{name}.png")
        depth = rng.uniform(1.0, 5.0, size=(h, w)).astype(np.float32)
        store_data(src / "depth" / f"{name}.exr", depth, "depth")
        np.save(src / "camera_params" / f"{name}.npy", K)
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0.0, 0.0]
        np.save(src / "poses" / f"{name}.npy", pose)
    return K


class _FakeMonoAdapter:
    """Deterministic stand-in for MoGeAdapter with the same contract:
    depth = 1 + mean image intensity per pixel row, mask = not-leftmost-
    column (content-dependent so the stage's plumbing is observable)."""

    def apply(self, params, views, geom_cfg=None, memory_efficient=False):
        import jax.numpy as jnp

        img = np.asarray(views["img"], np.float32)  # (B,V,H,W,3) normalized
        b, v, h, w, _ = img.shape
        z = 1.0 + np.abs(img.mean(-1))
        pts = np.stack([np.zeros_like(z), np.zeros_like(z), z], axis=-1)
        mask = np.ones((b, v, h, w), bool)
        mask[..., :2] = False
        return {"pts3d_cam": jnp.asarray(pts),
                "non_ambiguous_mask": jnp.asarray(mask)}


class _FakeMVSAdapter(_FakeMonoAdapter):
    """MVS-style stand-in that ALSO emits its own per-pixel confidence
    (the run_mvsanywhere.py posture: the generating model scores its own
    matching cost) — confidence = 1/depth so the stored map is
    content-dependent and checkable."""

    def apply(self, params, views, geom_cfg=None, memory_efficient=False):
        import jax.numpy as jnp

        out = super().apply(params, views, geom_cfg, memory_efficient)
        z = np.asarray(out["pts3d_cam"])[..., 2]
        out["conf"] = jnp.asarray(1.0 / z)
        return out


class TestTAv2AndPseudoDepth:
    def test_generator_emitted_confidence(self, tmp_path):
        """When the generating adapter emits its own confidence (an MVS
        model, run_mvsanywhere.py), the stage stores it directly as
        depth_confidence/<model> — no consistency filter needed
        (round-4 VERDICT item 9)."""
        from mapanything_tpu.data.pseudo_depth import run_pseudo_depth_stage

        _write_tav2_scene(tmp_path / "raw")
        dst = convert_tav2_wb_scene(tmp_path / "raw", tmp_path / "wai",
                                    "Supermarket", link=False)
        run_pseudo_depth_stage(dst, _FakeMVSAdapter(), batch_frames=2,
                               model_name="mvsanywhere")
        meta = load_scene_meta(dst / "scene_meta.json")
        assert "depth_confidence/mvsanywhere" in meta["frame_modalities"]
        data = load_frame(
            dst, 0,
            modalities=["pred_depth/mvsanywhere",
                        "depth_confidence/mvsanywhere"],
            scene_meta=meta)
        z = data["pred_depth/mvsanywhere"]
        conf = data["depth_confidence/mvsanywhere"]
        np.testing.assert_allclose(conf, 1.0 / z, rtol=1e-5)

        # the mono adapter (no conf output) must NOT register the modality
        run_pseudo_depth_stage(dst, _FakeMonoAdapter(), batch_frames=2,
                               model_name="moge2")
        meta = load_scene_meta(dst / "scene_meta.json")
        assert "depth_confidence/moge2" not in meta["frame_modalities"]

    def test_convert_carries_npy_geometry(self, tmp_path):
        K = _write_tav2_scene(tmp_path / "raw")
        dst = convert_tav2_wb_scene(tmp_path / "raw", tmp_path / "wai",
                                    "Supermarket", link=False)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert len(meta["frames"]) == 3
        data = load_frame(dst, "00000001_0", modalities=["image", "depth"])
        np.testing.assert_allclose(data["intrinsics"], K, atol=1e-6)
        np.testing.assert_allclose(data["extrinsics"][0, 3], 0.1, atol=1e-6)
        assert data["depth"].shape == (30, 40)
        assert data["depth"].min() >= 1.0

    def test_pseudo_depth_stage_to_dataset(self, tmp_path):
        """generation (fake-MoGe) -> consistency confidence -> covis ->
        WAIDataset('tav2_wb') consuming the moge2 mask quirk e2e
        (reference run_moge.py + depth_consistency_confidence.py roles)."""
        from mapanything_tpu.data.covisibility import (
            compute_pairwise_covisibility,
        )
        from mapanything_tpu.data.pseudo_depth import (
            run_depth_consistency_stage,
            run_pseudo_depth_stage,
        )
        from mapanything_tpu.data.wai_datasets import WAIDataset

        _write_tav2_scene(tmp_path / "raw")
        dst = convert_tav2_wb_scene(tmp_path / "raw", tmp_path / "wai",
                                    "Supermarket", link=False)
        run_pseudo_depth_stage(dst, _FakeMonoAdapter(), batch_frames=2)
        meta = load_scene_meta(dst / "scene_meta.json")
        assert "pred_depth/moge2" in meta["frame_modalities"]
        assert "pred_mask/moge2" in meta["frame_modalities"]
        data = load_frame(dst, 0, modalities=["pred_depth/moge2",
                                              "pred_mask/moge2"],
                          scene_meta=meta)
        assert data["pred_depth/moge2"].min() >= 1.0  # 1 + |mean|
        m = data["pred_mask/moge2"]
        assert not m[:, :2].any() and m[:, 2:].all()

        run_depth_consistency_stage(dst, "pred_depth/moge2")
        meta = load_scene_meta(dst / "scene_meta.json")
        assert "depth_confidence/moge2" in meta["frame_modalities"]
        conf = load_frame(dst, 0, modalities=["depth_confidence/moge2"],
                          scene_meta=meta)["depth_confidence/moge2"]
        assert conf.shape[0] > 0 and float(conf.max()) <= 1.0

        # GT depth + covis -> the tav2_wb quirk pipeline consumes the
        # moge2 mask this stage wrote
        depths, Ks, poses = [], [], []
        for i in range(3):
            rec = load_frame(dst, i, modalities=["depth"], scene_meta=meta)
            depths.append(rec["depth"])
            Ks.append(rec["intrinsics"])
            poses.append(rec["extrinsics"])
        covis = compute_pairwise_covisibility(
            np.stack(depths), np.stack(Ks), np.stack(poses))
        store_data(dst / "covisibility" / "v0" / "covis.npy",
                   np.maximum(covis, 0.3), "mmap")
        ds = WAIDataset(
            ROOT=str(tmp_path / "wai"), spec="tav2_wb", num_views=2,
            covisibility_thres=0.25, resolution=(40, 30),
            data_norm_type="dinov2", seed=1,
        )
        views = ds[0]
        assert len(views) == 2
        nam = np.asarray(views[0]["non_ambiguous_mask"])
        assert not nam[:, :2].any()  # the fake mask survived the pipeline


# ---------------------------------------------------------------------------
# PLY reader
# ---------------------------------------------------------------------------

class TestPLYReader:
    def test_ascii_roundtrip(self, tmp_path):
        p = tmp_path / "t.ply"
        p.write_text("\n".join([
            "ply", "format ascii 1.0", "element vertex 3",
            "property float x", "property float y", "property float z",
            "element face 1",
            "property list uchar int vertex_indices", "end_header",
            "0 0 0", "1 0 0", "0 1 0", "3 0 1 2"]) + "\n")
        v, f = read_ply(p)
        np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_binary_little_endian_with_colors(self, tmp_path):
        import struct

        p = tmp_path / "b.ply"
        header = "\n".join([
            "ply", "format binary_little_endian 1.0", "element vertex 3",
            "property float x", "property float y", "property float z",
            "property uchar red", "property uchar green",
            "property uchar blue",
            "element face 2",
            "property list uchar int vertex_indices", "end_header"]) + "\n"
        body = b""
        for i, (x, y, z) in enumerate([(0, 0, 1), (1, 0, 1), (0, 1, 1)]):
            body += struct.pack("<fffBBB", x, y, z, i, i, i)
        body += struct.pack("<Biii", 3, 0, 1, 2)
        body += struct.pack("<Biii", 3, 2, 1, 0)
        p.write_bytes(header.encode() + body)
        v, f = read_ply(p)
        np.testing.assert_allclose(v[:, 2], 1.0)
        assert f.shape == (2, 3)

    def test_rejects_quads(self, tmp_path):
        p = tmp_path / "q.ply"
        p.write_text("\n".join([
            "ply", "format ascii 1.0", "element vertex 4",
            "property float x", "property float y", "property float z",
            "element face 1",
            "property list uchar int vertex_indices", "end_header",
            "0 0 0", "1 0 0", "1 1 0", "0 1 0", "4 0 1 2 3"]) + "\n")
        with pytest.raises(ValueError, match="non-triangle"):
            read_ply(p)
