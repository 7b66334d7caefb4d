"""COLMAP → WAI conversion (data/conversion.py).

Round-trips a synthetic scene with known geometry through the repo's own
COLMAP binary writers (utils/colmap_io.py) into the WAI layout and back
through the real dataset readers — the offline role of the reference's
COLMAP-backed conversion scripts (data_processing/wai_processing/scripts/
conversion/{eth3d,dl3dv,megadepth,scannetppv2}.py).
"""

import numpy as np
import PIL.Image
import pytest

from mapanything_tpu.data.conversion import (
    colmap_to_wai,
    sparse_depth_from_points,
)
from mapanything_tpu.data.wai import load_frame, load_scene_meta
from mapanything_tpu.utils.colmap_io import export_colmap_reconstruction


H, W = 40, 56
V = 3


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Synthetic V-view scene: GT geometry + a COLMAP export of it."""
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("colmap_scene")

    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    intrinsics = np.stack([K] * V)
    c2w = np.stack([np.eye(4)] * V)
    for i in range(V):
        th = 0.08 * i
        c2w[i, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]])
        c2w[i, :3, 3] = [0.3 * i, 0.05 * i, -0.1 * i]

    depths = rng.uniform(2.0, 5.0, size=(V, H, W)).astype(np.float32)
    images = [rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
              for _ in range(V)]

    # world points sampled from view 0's GT depth at pixel centers
    vv, uu = np.meshgrid(np.arange(0, H, 2), np.arange(0, W, 2),
                         indexing="ij")
    z = depths[0, vv, uu].ravel()
    x = (uu.ravel() - K[0, 2]) / K[0, 0] * z
    y = (vv.ravel() - K[1, 2]) / K[1, 1] * z
    pts_cam = np.stack([x, y, z], 1)
    pts_world = pts_cam @ c2w[0, :3, :3].T + c2w[0, :3, 3]
    colors = rng.uniform(0, 1, size=(len(pts_world), 3))

    img_dir = root / "images"
    img_dir.mkdir()
    names = [f"view_{i:03d}.png" for i in range(V)]
    for name, img in zip(names, images):
        PIL.Image.fromarray(img).save(img_dir / name)

    sparse = export_colmap_reconstruction(
        str(root / "sparse" / "0"), intrinsics, c2w,
        [(W, H)] * V, names, pts_world, colors)
    return dict(root=root, sparse=sparse, img_dir=img_dir, K=K, c2w=c2w,
                depths=depths, images=images, names=names,
                pts_world=pts_world)


def test_sparse_depth_zbuffer_matches_gt(scene):
    """Points sampled from view 0's depth z-buffer back to that depth."""
    d = sparse_depth_from_points(scene["pts_world"], scene["K"],
                                 scene["c2w"][0], H, W)
    hit = d > 0
    assert hit.sum() >= 0.9 * len(scene["pts_world"]) * 0.9
    np.testing.assert_allclose(d[hit], scene["depths"][0][hit], rtol=1e-4)


def test_colmap_to_wai_roundtrip(scene, tmp_path):
    out = colmap_to_wai(scene["sparse"], scene["img_dir"],
                        tmp_path / "wai_scene")
    meta = load_scene_meta(out / "scene_meta.json")
    assert len(meta["frames"]) == V
    for i in range(V):
        fr = load_frame(out, f"view_{i:03d}", ["image", "depth"],
                        scene_meta=meta)
        np.testing.assert_allclose(fr["intrinsics"], scene["K"], atol=1e-4)
        np.testing.assert_allclose(fr["extrinsics"], scene["c2w"][i],
                                   atol=1e-5)
        np.testing.assert_array_equal(fr["image"], scene["images"][i])
        hit = fr["depth"] > 0
        assert hit.any()
        # every rendered depth agrees with the GT scene geometry: unproject
        # and check the world point lies near a source point
        if i == 0:
            np.testing.assert_allclose(fr["depth"][hit],
                                       scene["depths"][0][hit], rtol=1e-4)


def test_external_depth_and_covisibility_feed_dataset(scene, tmp_path):
    """Dense-depth mode + covisibility loads through WAIDataset unchanged."""
    ext = {n: scene["depths"][i] for i, n in enumerate(scene["names"])}
    out = colmap_to_wai(scene["sparse"], scene["img_dir"],
                        tmp_path / "converted" / "scene_x",
                        depth_source="external", external_depths=ext,
                        covisibility=True)
    covis = np.load(out / "covisibility" / "v0" / "covis.npy")
    assert covis.shape == (V, V)
    assert np.all(covis >= 0) and np.all(covis <= 1)
    assert np.all(np.diag(covis) > 0.9)  # every view covises with itself

    from mapanything_tpu.data.wai_datasets import WAIDataset

    ds = WAIDataset(
        ROOT=str(tmp_path / "converted"),
        spec="eth3d",
        num_views=2,
        covisibility_thres=0.0,
        resolution=(56, 42),
        data_norm_type="dinov2",
        seed=3,
    )
    views = ds[0]
    assert len(views) == 2
    v = views[0]
    assert v["img"].shape == (42, 56, 3)
    assert np.isfinite(v["pts3d"]).all()
    assert v["valid_mask"].any()


def test_cli(scene, tmp_path, capsys):
    from mapanything_tpu.data.conversion import main

    main([str(scene["sparse"]), str(scene["img_dir"]),
          str(tmp_path / "cli_scene"), "--depth-format", "png"])
    assert "3 frames" in capsys.readouterr().out
    fr = load_frame(tmp_path / "cli_scene", 0, ["depth"])
    # png is 16-bit millimetres: quantized but close
    d = sparse_depth_from_points(scene["pts_world"], scene["K"],
                                 scene["c2w"][0], H, W)
    hit = d > 0
    np.testing.assert_allclose(fr["depth"][hit], d[hit], atol=2e-3)


def test_rig_subdir_names_stay_unique(scene, tmp_path):
    """cam0/0001.png and cam1/0001.png must not collide (multi-camera
    rig); frame keys keep the path."""
    img_dir = tmp_path / "rig_images"
    for cam in ("cam0", "cam1"):
        (img_dir / cam).mkdir(parents=True)
        for i, img in enumerate(scene["images"][:1]):
            PIL.Image.fromarray(img).save(img_dir / cam / "0001.png")
    K = scene["K"]
    from mapanything_tpu.utils.colmap_io import export_colmap_reconstruction

    sparse = export_colmap_reconstruction(
        str(tmp_path / "rig_sparse" / "0"),
        np.stack([K, K]), scene["c2w"][:2], [(W, H)] * 2,
        ["cam0/0001.png", "cam1/0001.png"],
        scene["pts_world"], np.zeros((len(scene["pts_world"]), 3)))
    out = colmap_to_wai(sparse, img_dir, tmp_path / "rig_wai")
    meta = load_scene_meta(out / "scene_meta.json")
    assert len(meta["frames"]) == 2
    assert set(meta["frame_names"]) == {"cam0_0001", "cam1_0001"}
    for key in meta["frame_names"]:
        fr = load_frame(out, key, ["image"], scene_meta=meta)
        assert fr["image"].shape == (H, W, 3)


def test_covisibility_arg_check_fires_before_writes(scene, tmp_path):
    out = tmp_path / "never_written"
    with pytest.raises(ValueError, match="covisibility needs dense depth"):
        colmap_to_wai(scene["sparse"], scene["img_dir"], out,
                      depth_source="points", covisibility=True)
    assert not out.exists()


def test_external_depth_shape_mismatch_rejected(scene, tmp_path):
    ext = {n: np.ones((H // 2, W // 2), np.float32)
           for n in scene["names"]}
    with pytest.raises(ValueError, match="resample it first"):
        colmap_to_wai(scene["sparse"], scene["img_dir"],
                      tmp_path / "bad_depth", depth_source="external",
                      external_depths=ext)


def test_distorted_camera_gets_friendly_error(scene, tmp_path):
    """A real `colmap mapper` output uses OPENCV-family models; the reader
    must parse them and the converter must point at the undistort stage."""
    import struct

    cams_path = tmp_path / "sparse0" / "cameras.bin"
    cams_path.parent.mkdir(parents=True)
    with open(cams_path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        # OPENCV (id 4): fx fy cx cy k1 k2 p1 p2
        f.write(struct.pack("<iiQQ", 1, 4, W, H))
        f.write(struct.pack("<8d", 50, 50, W / 2, H / 2, -0.2, 0.05,
                            0.001, -0.001))
    from mapanything_tpu.utils.colmap_io import read_cameras_bin

    cams = read_cameras_bin(str(cams_path))
    assert cams[0]["model_id"] == 4 and len(cams[0]["params"]) == 8

    import shutil
    from pathlib import Path

    sparse = Path(scene["sparse"])
    shutil.copy(sparse / "images.bin", cams_path.parent)
    shutil.copy(sparse / "points3D.bin", cams_path.parent)
    with pytest.raises(ValueError, match="undistort to PINHOLE first"):
        colmap_to_wai(cams_path.parent, scene["img_dir"],
                      tmp_path / "never")


def test_layout_consistent_with_write_scene(scene, tmp_path):
    """colmap_to_wai and wai.write_scene are two writers of the same
    on-disk format (colmap_to_wai streams per-frame instead of buffering
    the whole scene); this guards against the layouts drifting apart."""
    from mapanything_tpu.data.wai import write_scene

    conv = colmap_to_wai(scene["sparse"], scene["img_dir"],
                         tmp_path / "conv_wai")
    meta_c = load_scene_meta(conv / "scene_meta.json")

    frames = [{
        "frame_name": meta_c["frame_names"][0]
        if isinstance(meta_c["frame_names"], list)
        else next(iter(meta_c["frame_names"])),
        "image": np.zeros((H, W, 3), np.uint8),
        "depth": np.ones((H, W), np.float32),
        "transform_matrix": np.eye(4),
    }]
    ws = write_scene(tmp_path / "ws_wai", frames,
                     dict(fx=50.0, fy=50.0, cx=W / 2, cy=H / 2, w=W, h=H))
    meta_w = load_scene_meta(ws / "scene_meta.json")

    # identical structural contract: modality table entries, relative-path
    # layout, frame record keys needed by load_frame
    assert meta_c["frame_modalities"]["image"] == \
        meta_w["frame_modalities"]["image"]
    assert meta_c["frame_modalities"]["depth"] == \
        meta_w["frame_modalities"]["depth"]
    for meta, root in ((meta_c, conv), (meta_w, ws)):
        fr = meta["frames"][0]
        assert fr["image"].startswith("images/")
        assert fr["depth"].split(".")[0].startswith("depth/")
        name = (meta["frame_names"][0]
                if isinstance(meta["frame_names"], list)
                else next(iter(meta["frame_names"])))
        loaded = load_frame(root, name, ["image", "depth"], scene_meta=meta)
        assert loaded["image"].shape == (H, W, 3)
        assert loaded["depth"].shape == (H, W)
