"""Mesh depth rendering (the WAI run_rendering stage, ray-cast on
device) against analytic plane geometry."""

import numpy as np

from mapanything_tpu.data.rendering import (
    render_mesh_depth,
    render_scene_depths,
)

H, W = 24, 32
K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])


def big_quad(z, span=50.0):
    verts = np.array([
        [-span, -span, z], [span, -span, z],
        [span, span, z], [-span, span, z],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


class TestRayCast:
    def test_frontal_plane_constant_depth(self):
        verts, faces = big_quad(2.0)
        d = render_mesh_depth(verts, faces, K, np.eye(4), (H, W),
                              pixel_chunk=64, tri_chunk=8)
        assert d.shape == (H, W)
        np.testing.assert_allclose(d, 2.0, atol=1e-4)

    def test_tilted_plane_matches_analytic(self):
        # plane through (0,0,2) with normal n: z = t where
        # t = (n . p0) / (n . dir), dir = ((u-cx)/fx, (v-cy)/fy, 1)
        n = np.array([0.3, -0.2, 1.0])
        p0 = np.array([0.0, 0.0, 2.0])
        # build a big quad lying in that plane
        b1 = np.cross(n, [1.0, 0, 0])
        b1 /= np.linalg.norm(b1)
        b2 = np.cross(n, b1)
        b2 /= np.linalg.norm(b2)
        s = 50.0
        verts = np.stack([
            p0 - s * b1 - s * b2, p0 + s * b1 - s * b2,
            p0 + s * b1 + s * b2, p0 - s * b1 + s * b2,
        ]).astype(np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        d = render_mesh_depth(verts, faces, K, np.eye(4), (H, W))
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        dirs = np.stack([(xs - K[0, 2]) / K[0, 0],
                         (ys - K[1, 2]) / K[1, 1],
                         np.ones_like(xs, np.float64)], -1)
        expect = (n @ p0) / (dirs @ n)
        np.testing.assert_allclose(d, expect, rtol=1e-4)

    def test_occlusion_near_wins(self):
        v1, f1 = big_quad(3.0)
        v2, f2 = big_quad(1.5)
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        d = render_mesh_depth(verts, faces, K, np.eye(4), (H, W),
                              tri_chunk=2)
        np.testing.assert_allclose(d, 1.5, atol=1e-4)

    def test_partial_coverage_zero_outside(self):
        # one triangle covering roughly the left half
        verts = np.array([[-50, -50, 2], [0, -50, 2], [0, 50, 2],
                          [-50, 50, 2]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        d = render_mesh_depth(verts, faces, K, np.eye(4), (H, W))
        assert (d[:, : W // 2 - 2] > 0).all()
        assert (d[:, W // 2 + 2:] == 0).all()

    def test_behind_camera_no_hit(self):
        verts, faces = big_quad(-2.0)
        d = render_mesh_depth(verts, faces, K, np.eye(4), (H, W))
        assert (d == 0).all()

    def test_camera_pose_applies(self):
        verts, faces = big_quad(2.0)
        pose = np.eye(4)
        pose[2, 3] = -1.0  # camera backs up 1m -> plane at z=3
        d = render_scene_depths(verts, faces, np.stack([K, K]),
                                np.stack([np.eye(4), pose]), (H, W))
        np.testing.assert_allclose(d[0], 2.0, atol=1e-4)
        np.testing.assert_allclose(d[1], 3.0, atol=1e-4)
