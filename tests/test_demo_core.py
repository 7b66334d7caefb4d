"""Demo-app core: pixel-lattice meshing, GLB mesh export, colorizers,
measure math, sky segmentation (reference scripts/gradio_app.py +
utils/hf_utils/viz.py behaviors, UI-free)."""

import json
import struct

import numpy as np
import pytest

from mapanything_tpu.utils import demo_core as dc
from mapanything_tpu.utils import mesh as mesh_mod


def parse_glb(path):
    with open(path, "rb") as f:
        magic, version, total = struct.unpack("<4sII", f.read(12))
        assert magic == b"glTF" and version == 2
        jlen, jtype = struct.unpack("<I4s", f.read(8))
        assert jtype == b"JSON"
        gltf = json.loads(f.read(jlen))
        blen, btype = struct.unpack("<I4s", f.read(8))
        assert btype == b"BIN\x00"
        buf = f.read(blen)
        assert f.read() == b""
    return gltf, buf


class TestImageMesh:
    def test_full_grid_counts(self):
        h, w = 5, 7
        pts = np.random.default_rng(0).normal(size=(h, w, 3)).astype(
            np.float32)
        faces, verts = mesh_mod.image_mesh(pts)
        assert faces.shape == ((h - 1) * (w - 1), 4)
        assert verts.shape == (h * w, 3)
        np.testing.assert_array_equal(verts, pts.reshape(-1, 3))
        # quad 0 connects pixel (0,0),(1,0),(1,1),(0,1)
        np.testing.assert_array_equal(faces[0], [0, w, w + 1, 1])

    def test_tri_doubles_faces(self):
        pts = np.zeros((4, 4, 3), np.float32)
        faces, _ = mesh_mod.image_mesh(pts, tri=True)
        assert faces.shape == (2 * 3 * 3, 3)

    def test_mask_drops_quads_and_compacts(self):
        h, w = 4, 4
        pts = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
        cols = np.random.default_rng(1).uniform(size=(h, w, 3))
        mask = np.ones((h, w), bool)
        mask[0, 0] = False  # kills exactly quad (0,0)
        faces, verts, vcols = mesh_mod.image_mesh(
            pts, cols, mask=mask, tri=True)
        assert len(faces) == 2 * ((h - 1) * (w - 1) - 1)
        # vertex 0 is unreferenced after masking -> compacted away
        assert len(verts) == h * w - 1
        assert faces.max() == len(verts) - 1
        assert vcols.shape == (len(verts), 3)
        # surviving attrs still correspond (vertex 1 of the original grid
        # is the new vertex 0)
        np.testing.assert_array_equal(verts[0], pts.reshape(-1, 3)[1])

    def test_triangulate_shorter_diagonal(self):
        # quad where diagonal 1-3 is shorter: expect the [0,1,3|3,1,2] split
        vertices = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]])
        # stretch diagonal 0-2 by moving vertex 2 far away
        vertices[2] = [5, 5, 0]
        faces = np.array([[0, 1, 2, 3]])
        tris = mesh_mod.triangulate(faces, vertices=vertices)
        np.testing.assert_array_equal(tris, [[0, 1, 3], [3, 1, 2]])
        # and the opposite choice when 0-2 is shorter
        vertices[2] = [1, 1, 0]
        vertices[3] = [-4, 5, 0]
        tris = mesh_mod.triangulate(faces, vertices=vertices)
        np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])

    def test_diagonal_attr_splits_by_3d_distance(self):
        """image_mesh(diagonal_attr=0) must actually route the pointmap
        into triangulate — regression: tri=True used to fan-split every
        quad regardless, leaving the shorter-diagonal path dead."""
        pts = np.zeros((2, 2, 3), np.float32)
        pts[1, 1] = [5, 5, 0]  # stretches diagonal 0-3 (indices 0 and 3)
        faces, _ = mesh_mod.image_mesh(pts, tri=True, diagonal_attr=0)
        # quad order is [0, 2, 3, 1] (col-major grid): corners 0 and 3
        # are the quad's 0-2 diagonal; it is the LONG one here, so the
        # split must use the other diagonal (backslash False pattern)
        quad = mesh_mod.grid_quad_faces(2, 2)[0]
        d02 = np.linalg.norm(pts.reshape(-1, 3)[quad[0]]
                             - pts.reshape(-1, 3)[quad[2]])
        d13 = np.linalg.norm(pts.reshape(-1, 3)[quad[1]]
                             - pts.reshape(-1, 3)[quad[3]])
        expect = (quad[[0, 1, 2, 0, 2, 3]] if d02 < d13
                  else quad[[0, 1, 3, 3, 1, 2]]).reshape(2, 3)
        np.testing.assert_array_equal(faces, expect)
        # fan split (reference parity default) differs for this quad
        fan, _ = mesh_mod.image_mesh(pts, tri=True)
        assert not np.array_equal(fan, faces)
        with pytest.raises(ValueError, match="tri=True"):
            mesh_mod.image_mesh(pts, diagonal_attr=0)

    def test_triangulate_fan_pentagon(self):
        tris = mesh_mod.triangulate(np.array([[4, 5, 6, 7, 8]]))
        np.testing.assert_array_equal(
            tris, [[4, 5, 6], [4, 6, 7], [4, 7, 8]])

    def test_compact_vertices_roundtrip(self):
        faces = np.array([[2, 5, 7], [5, 7, 9]])
        attr = np.arange(10) * 10
        cfaces, cattr, kept = mesh_mod.compact_vertices(
            faces, attr, return_indices=True)
        np.testing.assert_array_equal(kept, [2, 5, 7, 9])
        np.testing.assert_array_equal(cattr, [20, 50, 70, 90])
        np.testing.assert_array_equal(cfaces, [[0, 1, 2], [1, 2, 3]])


class TestGlbMesh:
    def test_valid_glb_with_colors_and_markers(self, tmp_path):
        rng = np.random.default_rng(2)
        verts = rng.normal(size=(20, 3)).astype(np.float32)
        faces = rng.integers(0, 20, size=(30, 3)).astype(np.int32)
        cols = rng.uniform(size=(20, 3))
        mv, mf = mesh_mod.camera_marker_mesh(np.eye(4), scale=0.5)
        path = str(tmp_path / "m.glb")
        mesh_mod.write_glb_mesh(
            path, verts, faces, vertex_colors=cols,
            extra_meshes=[(mv, mf, (255, 0, 0))])
        gltf, buf = parse_glb(path)
        assert len(gltf["meshes"]) == 2
        prim = gltf["meshes"][0]["primitives"][0]
        assert prim["mode"] == 4
        pos_acc = gltf["accessors"][prim["attributes"]["POSITION"]]
        assert pos_acc["count"] == 20
        idx_acc = gltf["accessors"][prim["indices"]]
        assert idx_acc["count"] == 90
        # decode positions back out of the binary chunk
        view = gltf["bufferViews"][pos_acc["bufferView"]]
        raw = buf[view["byteOffset"]:view["byteOffset"] + view["byteLength"]]
        np.testing.assert_allclose(
            np.frombuffer(raw, np.float32).reshape(-1, 3), verts)

    def test_camera_marker_is_at_pose(self):
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        v, f = mesh_mod.camera_marker_mesh(pose, scale=0.1)
        np.testing.assert_allclose(v[0], [1, 2, 3], atol=1e-6)  # apex
        assert f.shape == (6, 3)

    def test_alignment_transform_centers_cam0(self):
        rng = np.random.default_rng(3)
        # random cam2world pose for camera 0
        from scipy.spatial.transform import Rotation

        e0 = np.eye(4)
        e0[:3, :3] = Rotation.random(random_state=4).as_matrix()
        e0[:3, 3] = rng.normal(size=3)
        t = mesh_mod.alignment_transform(np.stack([e0, np.eye(4)]))
        # camera-0 center maps to the origin
        c0 = mesh_mod.transform_points(t, e0[:3, 3][None])
        np.testing.assert_allclose(c0, 0, atol=1e-10)


def synthetic_predictions(s=2, h=8, w=10, seed=0):
    rng = np.random.default_rng(seed)
    world = rng.normal(size=(s, h, w, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 2.0, size=(s, h, w, 1)).astype(np.float32)
    imgs = rng.uniform(size=(s, h, w, 3)).astype(np.float32)
    extr = np.tile(np.eye(4, dtype=np.float32), (s, 1, 1))
    extr[1, :3, 3] = [0.5, 0, 0]
    intr = np.tile(np.eye(3, dtype=np.float32) * 20, (s, 1, 1))
    intr[:, 2, 2] = 1
    mask = np.ones((s, h, w), bool)
    mask[:, 0, 0] = False
    conf = rng.uniform(1, 5, size=(s, h, w)).astype(np.float32)
    return {
        "extrinsic": extr, "intrinsic": intr, "world_points": world,
        "depth": depth, "images": imgs, "final_mask": mask, "conf": conf,
    }


class TestDemoCore:
    def test_pack_predictions_from_infer_contract(self):
        h, w = 6, 8
        rng = np.random.default_rng(5)
        outputs = []
        for _ in range(3):
            outputs.append({
                "pts3d": rng.normal(size=(1, h, w, 3)),
                "depth_z": rng.uniform(0.1, 1, size=(1, h, w, 1)),
                "img_no_norm": rng.uniform(size=(1, h, w, 3)),
                "conf": rng.uniform(1, 2, size=(1, h, w, 1)),
                "mask": np.ones((1, h, w, 1), bool),
                "camera_poses": np.eye(4)[None],
                "intrinsics": np.eye(3)[None],
            })
        preds = dc.pack_predictions(outputs)
        assert preds["world_points"].shape == (3, h, w, 3)
        assert preds["extrinsic"].shape == (3, 4, 4)
        assert preds["conf"].shape == (3, h, w)
        assert preds["final_mask"].dtype == bool

    def test_process_for_visualization(self):
        preds = synthetic_predictions()
        data = dc.process_for_visualization(preds)
        assert set(data) == {0, 1}
        v = data[0]
        assert v["normal"].shape == v["points3d"].shape
        assert v["depth"].shape == v["mask"].shape
        assert not v["mask"][0, 0]

    def test_background_filters(self):
        img = np.ones((4, 4, 3), np.float32)
        img[0, 0] = 0.0  # black
        keep = dc.background_mask(img, filter_black=True, filter_white=True)
        assert not keep[0, 0]  # black filtered
        assert not keep[1, 1]  # pure white filtered
        keep2 = dc.background_mask(img)
        assert keep2.all()

    def test_colorize_depth_invalid_white(self):
        depth = np.linspace(0, 2, 16).reshape(4, 4)
        out = dc.colorize_depth(depth)
        assert out.shape == (4, 4, 3) and out.dtype == np.uint8
        np.testing.assert_array_equal(out[0, 0], [255, 255, 255])

    def test_colorize_normal_masked_grey(self):
        normal = np.zeros((3, 3, 3), np.float32)
        normal[..., 2] = 1.0
        mask = np.ones((3, 3), bool)
        mask[0, 0] = False
        out = dc.colorize_normal(normal, mask)
        np.testing.assert_array_equal(out[0, 0], [127, 127, 127])
        np.testing.assert_array_equal(out[1, 1], [127, 127, 255])

    def test_measure_distance(self):
        preds = synthetic_predictions()
        data = dc.process_for_visualization(preds)
        v = data[0]
        r = dc.measure(v, (2, 3), (5, 4))
        assert r["valid"] and len(r["points"]) == 2
        expect = np.linalg.norm(
            v["points3d"][3, 2] - v["points3d"][4, 5])
        assert r["distance"] == pytest.approx(expect, rel=1e-6)
        assert r["points"][0]["depth"] == pytest.approx(
            float(v["depth"][3, 2]))

    def test_measure_rejects_masked_and_oob(self):
        preds = synthetic_predictions()
        data = dc.process_for_visualization(preds)
        assert not dc.measure(data[0], (0, 0))["valid"]  # masked pixel
        assert not dc.measure(data[0], (99, 0))["valid"]  # out of bounds

    def test_glb_scene_mesh_mode(self, tmp_path):
        preds = synthetic_predictions()
        path = str(tmp_path / "scene.glb")
        n = dc.predictions_to_glb_scene(path, preds, as_mesh=True)
        assert n > 0
        gltf, _ = parse_glb(path)
        # 1 merged scene mesh + 2 camera markers
        assert len(gltf["meshes"]) == 3

    def test_glb_scene_pointcloud_mode(self, tmp_path):
        preds = synthetic_predictions()
        path = str(tmp_path / "pc.glb")
        n = dc.predictions_to_glb_scene(
            path, preds, as_mesh=False, conf_percentile=50.0)
        gltf, _ = parse_glb(path)
        assert n > 0
        # conf filter keeps ~half the unmasked points
        total = preds["final_mask"].sum()
        assert n < total

    def test_marker_scale_ignores_masked_zeros(self, tmp_path):
        """Regression: the camera-marker span took percentiles over ALL
        world points; postprocess zeroes masked pixels, so sky-heavy
        scenes (>45% masked) collapsed the span toward 0 and the markers
        rendered microscopically. The span must come from kept points."""
        preds = synthetic_predictions()
        # push the scene away from the origin and mask 60% of it to zeros
        preds["world_points"] = preds["world_points"] + 10.0
        rng = np.random.default_rng(9)
        masked = rng.uniform(size=preds["final_mask"].shape) < 0.6
        preds["final_mask"] = preds["final_mask"] & ~masked
        preds["world_points"][masked] = 0.0  # what postprocess emits

        path = str(tmp_path / "masked.glb")
        dc.predictions_to_glb_scene(path, preds, as_mesh=True)
        gltf, buf = parse_glb(path)
        # marker meshes are the last 2; recover their vertex spread from
        # the accessor min/max (glTF requires them for POSITION)
        spans = []
        for m in gltf["meshes"][-2:]:
            acc = gltf["accessors"][
                m["primitives"][0]["attributes"]["POSITION"]]
            spans.append(np.linalg.norm(
                np.array(acc["max"]) - np.array(acc["min"])))
        kept = preds["world_points"][preds["final_mask"]]
        scene_span = np.linalg.norm(np.percentile(kept, 95, 0)
                                    - np.percentile(kept, 5, 0))
        # markers are scale=0.03*span pyramids; with the bug the span was
        # dominated by the zero cluster (dist-to-origin ~17), 3-10x larger
        for s in spans:
            assert s > 0.005 * scene_span, (s, scene_span)
            assert s < 0.2 * scene_span, (s, scene_span)

    def test_glb_single_frame_filter(self, tmp_path):
        preds = synthetic_predictions()
        path = str(tmp_path / "f0.glb")
        dc.predictions_to_glb_scene(path, preds, frame=0, show_cam=False)
        gltf, _ = parse_glb(path)
        assert len(gltf["meshes"]) == 1


class TestSkySegmentation:
    def test_heuristic_splits_sky_from_ground(self):
        rng = np.random.default_rng(6)
        h, w = 60, 80
        img = np.zeros((h, w, 3), np.float32)
        # top half: bright smooth blue sky
        img[: h // 2] = [0.55, 0.7, 0.95]
        # bottom half: dark textured ground
        img[h // 2:] = rng.uniform(0.0, 0.4, size=(h - h // 2, w, 3))
        mask = dc.segment_sky(img)
        assert mask.dtype == np.uint8
        assert (mask[: h // 4] == 0).mean() > 0.9  # sky
        assert (mask[3 * h // 4:] == 255).mean() > 0.9  # non-sky

    def test_onnx_protocol_with_fake_session(self):
        """run_skyseg drives any object with the onnxruntime session
        surface — protocol check without the pip package."""

        class FakeTensor:
            def __init__(self, name):
                self.name = name

        class FakeSession:
            def get_inputs(self):
                return [FakeTensor("in")]

            def get_outputs(self):
                return [FakeTensor("out")]

            def run(self, outs, feed):
                x = feed["in"]
                assert x.shape == (1, 3, 320, 320) and x.dtype == np.float32
                # the model outputs low values for sky: top rows low
                out = np.ones((1, 1, 320, 320), np.float32)
                out[..., :160, :] = 0.0
                return [out]

        img = np.full((64, 48, 3), 0.5, np.float32)
        mask = dc.segment_sky(img, onnx_session=FakeSession())
        assert mask.shape == (64, 48)
        assert (mask[:20] == 0).all()  # low logits = sky = 0
        assert (mask[-20:] == 255).all()  # non-sky = 255
