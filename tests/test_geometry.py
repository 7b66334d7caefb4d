"""Golden-parity tests: mapanything_tpu.geometry vs the PyTorch reference.

Each test generates random inputs, runs both implementations, and compares to
tight fp32 tolerances (SURVEY.md §7.1: 1e-6-ish for pure math; slightly looser
where reduction order differs)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mapanything_tpu import geometry as G

ATOL = 1e-5
RTOL = 1e-5


def t(x):
    return torch.from_numpy(np.asarray(x))


def allclose(a, b, atol=ATOL, rtol=RTOL):
    a = np.asarray(a)
    b = np.asarray(b.detach().numpy() if torch.is_tensor(b) else b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def random_quats(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuats:
    def test_quaternion_to_rotation_matrix(self, ref_geometry, rng):
        q = random_quats(rng, (7,))
        ours = G.quaternion_to_rotation_matrix(jnp.asarray(q))
        ref = ref_geometry.quaternion_to_rotation_matrix(t(q))
        allclose(ours, ref)

    def test_rotation_matrix_to_quaternion_roundtrip(self, ref_geometry, rng):
        q = random_quats(rng, (16,))
        r = G.quaternion_to_rotation_matrix(jnp.asarray(q))
        ours = G.rotation_matrix_to_quaternion(r)
        ref = ref_geometry.rotation_matrix_to_quaternion(t(np.asarray(r)))
        allclose(ours, ref, atol=1e-4)
        # roundtrip up to sign standardization
        q_std = np.where(q[..., 3:4] < 0, -q, q)
        allclose(ours, q_std, atol=1e-4)

    def test_quaternion_inverse_multiply(self, ref_geometry, rng):
        q1 = random_quats(rng, (5,))
        q2 = random_quats(rng, (5,))
        allclose(G.quaternion_inverse(jnp.asarray(q1)), ref_geometry.quaternion_inverse(t(q1)))
        allclose(
            G.quaternion_multiply(jnp.asarray(q1), jnp.asarray(q2)),
            ref_geometry.quaternion_multiply(t(q1), t(q2)),
        )

    def test_transform_pose_2_to_1(self, ref_geometry, rng):
        q1, q2 = random_quats(rng, (6,)), random_quats(rng, (6,))
        t1 = rng.normal(size=(6, 3)).astype(np.float32)
        t2 = rng.normal(size=(6, 3)).astype(np.float32)
        ours_q, ours_t = G.transform_pose_using_quats_and_trans_2_to_1(
            jnp.asarray(q1), jnp.asarray(t1), jnp.asarray(q2), jnp.asarray(t2)
        )
        ref_q, ref_t = ref_geometry.transform_pose_using_quats_and_trans_2_to_1(
            t(q1), t(t1), t(q2), t(t2)
        )
        allclose(ours_q, ref_q)
        allclose(ours_t, ref_t, atol=1e-4)


class TestRays:
    def test_depthmap_to_camera_frame(self, ref_geometry, rng):
        depth = rng.uniform(0.1, 10, size=(2, 14, 21)).astype(np.float32)
        K = np.array([[[100.0, 0, 10], [0, 100, 7], [0, 0, 1]]] * 2, dtype=np.float32)
        ours, mask = G.depthmap_to_camera_frame(jnp.asarray(depth), jnp.asarray(K))
        ref, ref_mask = ref_geometry.depthmap_to_camera_frame(t(depth), t(K))
        allclose(ours, ref)
        assert np.array_equal(np.asarray(mask), ref_mask.numpy())

    def test_depthmap_to_world_frame(self, ref_geometry, rng):
        depth = rng.uniform(0.1, 10, size=(2, 10, 12)).astype(np.float32)
        K = np.array([[[80.0, 0, 6], [0, 90, 5], [0, 0, 1]]] * 2, dtype=np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        q = random_quats(rng, (2,))
        pose[:, :3, :3] = np.asarray(G.quaternion_to_rotation_matrix(jnp.asarray(q)))
        pose[:, :3, 3] = rng.normal(size=(2, 3))
        ours, _ = G.depthmap_to_world_frame(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(pose))
        ref, _ = ref_geometry.depthmap_to_world_frame(t(depth), t(K), t(pose))
        allclose(ours, ref, atol=1e-4)

    def test_get_rays_in_camera_frame(self, ref_geometry):
        K = np.array([[[100.0, 0, 32], [0, 110, 24], [0, 0, 1]]], dtype=np.float32)
        for unit in (True, False):
            _, ours = G.get_rays_in_camera_frame(jnp.asarray(K), 48, 64, unit)
            _, ref = ref_geometry.get_rays_in_camera_frame(t(K), 48, 64, unit)
            allclose(ours, ref)

    def test_transform_rays(self, ref_geometry, rng):
        origins = rng.normal(size=(2, 8, 9, 3)).astype(np.float32)
        dirs = rng.normal(size=(2, 8, 9, 3)).astype(np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        pose[:, :3, 3] = rng.normal(size=(2, 3))
        ours_o, ours_d = G.transform_rays(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(pose))
        ref_o, ref_d = ref_geometry.transform_rays(t(origins), t(dirs), t(pose))
        allclose(ours_o, ref_o)
        allclose(ours_d, ref_d)

    def test_convert_z_depth_to_depth_along_ray(self, ref_geometry, rng):
        depth = rng.uniform(0.1, 5, size=(3, 12, 10)).astype(np.float32)
        K = np.array([[[60.0, 0, 5], [0, 60, 6], [0, 0, 1]]] * 3, dtype=np.float32)
        ours = G.convert_z_depth_to_depth_along_ray(jnp.asarray(depth), jnp.asarray(K))
        ref = ref_geometry.convert_z_depth_to_depth_along_ray(t(depth), t(K))
        allclose(ours, ref)

    def test_recover_pinhole_intrinsics(self, ref_geometry):
        K = np.array(
            [
                [[200.0, 0, 64], [0, 180, 48], [0, 0, 1]],
                [[150.0, 0, 60], [0, 150, 50], [0, 0, 1]],
            ],
            dtype=np.float32,
        )
        _, dirs = G.get_rays_in_camera_frame(jnp.asarray(K), 96, 128, True)
        ours = G.recover_pinhole_intrinsics_from_ray_directions(dirs)
        ref = ref_geometry.recover_pinhole_intrinsics_from_ray_directions(
            t(np.asarray(dirs))
        )
        allclose(ours, ref, atol=1e-2, rtol=1e-4)
        allclose(ours, K, atol=0.05, rtol=1e-3)


class TestPointmaps:
    def test_factored_recombination(self, ref_geometry, rng):
        dirs = rng.normal(size=(4, 6, 7, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        depth = rng.uniform(0.1, 4, size=(4, 6, 7, 1)).astype(np.float32)
        trans = rng.normal(size=(4, 3)).astype(np.float32)
        quats = random_quats(rng, (4,))
        ours = G.convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap(
            jnp.asarray(dirs), jnp.asarray(depth), jnp.asarray(trans), jnp.asarray(quats)
        )
        ref = ref_geometry.convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap(
            t(dirs), t(depth), t(trans), t(quats)
        )
        allclose(ours, ref, atol=1e-4)

    def test_closed_form_pose_inverse(self, ref_geometry, rng):
        pose = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
        q = random_quats(rng, (5,))
        pose[:, :3, :3] = np.asarray(G.quaternion_to_rotation_matrix(jnp.asarray(q)))
        pose[:, :3, 3] = rng.normal(size=(5, 3))
        ours = G.closed_form_pose_inverse(jnp.asarray(pose))
        ref = ref_geometry.closed_form_pose_inverse(t(pose))
        allclose(ours, ref, atol=1e-5)

    def test_geotrf(self, ref_geometry, rng):
        trf = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        trf[:, :3, 3] = rng.normal(size=(3, 3))
        pts = rng.normal(size=(3, 5, 6, 3)).astype(np.float32)
        ours = G.geotrf(jnp.asarray(trf), jnp.asarray(pts))
        ref = ref_geometry.geotrf(t(trf), t(pts))
        allclose(ours, ref, atol=1e-5)
        # square (d,d) linear branch (regression: precision kwarg was
        # passed to _expand and this branch always raised TypeError)
        rot = trf[:, :3, :3]
        ours_sq = G.geotrf(jnp.asarray(rot), jnp.asarray(pts))
        ref_sq = ref_geometry.geotrf(t(rot), t(pts))
        allclose(ours_sq, ref_sq, atol=1e-5)


class TestNorm:
    def test_normalize_depth(self, ref_geometry, rng):
        depth = rng.uniform(0, 5, size=(3, 8, 9, 1)).astype(np.float32)
        depth[depth < 1] = 0
        ours, ours_f = G.normalize_depth_using_non_zero_pixels(
            jnp.asarray(depth), return_norm_factor=True
        )
        ref, ref_f = ref_geometry.normalize_depth_using_non_zero_pixels(
            t(depth), return_norm_factor=True
        )
        allclose(ours, ref, atol=1e-4)
        allclose(ours_f, ref_f, atol=1e-4)

    def test_normalize_pose_translations(self, ref_geometry, rng):
        trans = rng.normal(size=(4, 6, 3)).astype(np.float32)
        trans[0, 0] = 0
        ours, ours_f = G.normalize_pose_translations(jnp.asarray(trans), return_norm_factor=True)
        ref, ref_f = ref_geometry.normalize_pose_translations(t(trans), return_norm_factor=True)
        allclose(ours, ref, atol=1e-4)
        allclose(ours_f, ref_f, atol=1e-4)

    def test_normalize_multiple_pointclouds(self, ref_geometry, rng):
        pts = rng.normal(size=(2, 3, 8, 9, 3)).astype(np.float32)
        masks = rng.uniform(size=(2, 3, 8, 9)) > 0.3
        ours, ours_f = G.normalize_multiple_pointclouds(
            jnp.asarray(pts), jnp.asarray(masks), "avg_dis", ret_factor=True
        )
        pts_list = [t(pts[:, i]) for i in range(3)]
        mask_list = [t(masks[:, i]) for i in range(3)]
        ref = ref_geometry.normalize_multiple_pointclouds(
            pts_list, mask_list, "avg_dis", ret_factor=True
        )
        ref_pts, ref_f = ref[:-1], ref[-1]
        for i in range(3):
            allclose(np.asarray(ours)[:, i], ref_pts[i], atol=1e-4)
        allclose(np.asarray(ours_f)[:, 0], ref_f, atol=1e-4)

    def test_apply_log_to_norm(self, ref_geometry, rng):
        x = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
        # XLA vs torch log1p differ by ~1e-4 in fp32
        allclose(
            G.apply_log_to_norm(jnp.asarray(x)),
            ref_geometry.apply_log_to_norm(t(x)),
            atol=5e-4,
            rtol=1e-3,
        )


class TestEdges:
    def test_depth_edge(self, ref_geometry, rng):
        depth = rng.uniform(0.5, 5, size=(12, 15)).astype(np.float32)
        depth[4:8, 4:8] *= 3  # inject a discontinuity
        mask = rng.uniform(size=(12, 15)) > 0.2
        ours = G.depth_edge(jnp.asarray(depth), rtol=0.03, mask=jnp.asarray(mask))
        ref = ref_geometry.depth_edge(depth, rtol=0.03, mask=mask)
        # interior must match exactly; border handling may differ by padding mode
        assert np.array_equal(np.asarray(ours)[1:-1, 1:-1], ref[1:-1, 1:-1])

    def test_points_to_normals(self, ref_geometry, rng):
        depth = rng.uniform(1, 3, size=(16, 20)).astype(np.float32)
        K = np.array([[50.0, 0, 10], [0, 50, 8], [0, 0, 1]], dtype=np.float32)
        pts, _ = G.depthmap_to_camera_frame(jnp.asarray(depth), jnp.asarray(K))
        pts_np = np.asarray(pts)
        mask = np.ones((16, 20), dtype=bool)
        mask[3:5, 3:5] = False
        ours_n, ours_m = G.points_to_normals(pts, jnp.asarray(mask))
        ref_n, ref_m = ref_geometry.points_to_normals(pts_np, mask=mask)
        np.testing.assert_allclose(np.asarray(ours_n), ref_n, atol=1e-4)
        assert np.array_equal(np.asarray(ours_m), ref_m)

    def test_normals_edge(self, ref_geometry, rng):
        n = rng.normal(size=(10, 11, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        ours = G.normals_edge(jnp.asarray(n), tol=5.0)
        ref = ref_geometry.normals_edge(n, tol=5.0)
        inner = (slice(1, -1), slice(1, -1))
        assert np.array_equal(np.asarray(ours)[inner], ref[inner])

    def test_points_normal_edges_fused_matches_composition(self, rng):
        """The plane-wise fused path (used by the inference postprocess)
        must reproduce points_to_normals + normals_edge exactly."""
        depth = rng.uniform(1, 3, size=(2, 16, 20)).astype(np.float32)
        K = np.array([[50.0, 0, 10], [0, 50, 8], [0, 0, 1]], dtype=np.float32)
        pts, _ = G.depthmap_to_camera_frame(
            jnp.asarray(depth), jnp.broadcast_to(jnp.asarray(K), (2, 3, 3))
        )
        mask = jnp.asarray(rng.uniform(size=(2, 16, 20)) > 0.15)
        normals, nmask = G.points_to_normals(pts, mask)
        composed = G.normals_edge(normals, tol=5.0, mask=nmask,
                                  assume_normalized=True)
        fused = G.points_normal_edges(pts, tol=5.0, mask=mask)
        assert np.array_equal(np.asarray(fused), np.asarray(composed))


class TestJit:
    def test_core_functions_jit(self, rng):
        import jax

        q = jnp.asarray(random_quats(rng, (4,)))
        jax.jit(G.quaternion_to_rotation_matrix)(q)
        dirs = jnp.asarray(rng.normal(size=(2, 6, 7, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        depth = jnp.asarray(rng.uniform(0.5, 2, size=(2, 6, 7, 1)).astype(np.float32))
        trans = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        quats = jnp.asarray(random_quats(rng, (2,)))
        out = jax.jit(
            G.convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap
        )(dirs, depth, trans, quats)
        assert out.shape == (2, 6, 7, 3)
        jax.jit(lambda d: G.depth_edge(d, rtol=0.03))(depth[..., 0])


class TestWindowTail:
    """Long-tail window/pooling/transform parity (VERDICT r1 geometry gap)."""

    def test_sliding_window_2d(self, ref_geometry, rng):
        x = rng.normal(size=(2, 12, 16)).astype(np.float32)
        ours = G.sliding_window_2d(jnp.asarray(x), 3, 2)
        ref = ref_geometry.sliding_window_2d(x, 3, 2)
        allclose(ours, ref)

    def test_sliding_window_1d(self, ref_geometry, rng):
        x = rng.normal(size=(4, 21)).astype(np.float32)
        ours = G.sliding_window_1d(jnp.asarray(x), 5, 3, axis=-1)
        ref = ref_geometry.sliding_window_1d(x, 5, 3, axis=-1)
        allclose(ours, ref)

    def test_max_pool_1d(self, ref_geometry, rng):
        x = rng.normal(size=(3, 17)).astype(np.float32)
        ours = G.max_pool_1d(jnp.asarray(x), 3, 2, padding=1)
        ref = ref_geometry.max_pool_1d(x, 3, stride=2, padding=1)
        allclose(ours, ref)

    def test_depth_aliasing(self, ref_geometry, rng):
        d = rng.uniform(0.5, 5.0, size=(10, 14)).astype(np.float32)
        ours = G.depth_aliasing(jnp.asarray(d), atol=0.3, rtol=0.05)
        ref = ref_geometry.depth_aliasing(d, atol=0.3, rtol=0.05)
        assert np.array_equal(np.asarray(ours), ref)

    def test_transform_pts3d(self, ref_geometry, rng):
        pts = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
        q = random_quats(rng, (2,))
        pose = np.asarray(
            G.pose_quats_trans_to_matrix(
                jnp.asarray(q), jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
            )
        )
        ours = G.transform_pts3d(jnp.asarray(pts), jnp.asarray(pose))
        ref = ref_geometry.transform_pts3d(t(pts), t(pose))
        allclose(ours, ref, atol=1e-4)

    def test_relative_pose_transformation(self, ref_geometry, rng):
        qs = random_quats(rng, (2, 2))
        poses = np.asarray(
            G.pose_quats_trans_to_matrix(
                jnp.asarray(qs),
                jnp.asarray(rng.normal(size=(2, 2, 3)).astype(np.float32)),
            )
        )
        ours = G.relative_pose_transformation(
            jnp.asarray(poses[0]), jnp.asarray(poses[1])
        )
        ref = ref_geometry.relative_pose_transformation(t(poses[0]), t(poses[1]))
        allclose(ours, ref, atol=1e-4)

    def test_convert_raymap_z_depth_quats_to_pointmap(self, ref_geometry, rng):
        h, w = 5, 6
        origins = rng.normal(size=(h, w, 3)).astype(np.float32)
        dirs = rng.normal(size=(h, w, 3)).astype(np.float32)
        dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
        depth = rng.uniform(0.5, 3, size=(h, w, 1)).astype(np.float32)
        quats = random_quats(rng, (h, w))
        ours = G.convert_raymap_z_depth_quats_to_pointmap(
            jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(depth),
            jnp.asarray(quats),
        )
        ref = ref_geometry.convert_raymap_z_depth_quats_to_pointmap(
            t(origins), t(dirs), t(depth), t(quats)
        )
        allclose(ours, ref, atol=1e-4)

    def test_adjust_camera_params_for_rotation(self, ref_geometry):
        params = [500.0, 480.0, 320.0, 240.0]
        for k in range(4):
            ours = G.adjust_camera_params_for_rotation(params, (640, 480), k)
            ref = ref_geometry.adjust_camera_params_for_rotation(
                params, (640, 480), k
            )
            assert list(ours) == list(ref), k

    def test_adjust_pose_for_rotation(self, ref_geometry, rng):
        q = random_quats(rng, ())
        pose = np.asarray(
            G.pose_quats_trans_to_matrix(
                jnp.asarray(q), jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
            )
        ).astype(np.float64)
        for k in range(4):
            ours = G.adjust_pose_for_rotation(pose.copy(), k)
            ref = ref_geometry.adjust_pose_for_rotation(pose.copy(), k)
            allclose(ours, np.asarray(ref), atol=1e-6)

    def test_crop_to_aspect_ratio_wide(self, ref_geometry, rng):
        from PIL import Image

        img = (rng.uniform(0, 255, size=(100, 200, 3))).astype(np.uint8)
        depth = rng.uniform(0.1, 5, size=(100, 200)).astype(np.float32)
        params = [120.0, 121.0, 100.0, 50.0]
        oi, od, op = G.crop_to_aspect_ratio(img, depth, params, 1.5)
        ri, rd, rp = ref_geometry.crop_to_aspect_ratio(
            Image.fromarray(img), depth, params, 1.5
        )
        assert np.array_equal(oi, np.asarray(ri))
        assert np.array_equal(od, rd)
        assert list(op) == list(rp)

    def test_crop_to_aspect_ratio_tall(self, ref_geometry, rng):
        from PIL import Image

        img = (rng.uniform(0, 255, size=(200, 100, 3))).astype(np.uint8)
        depth = rng.uniform(0.1, 5, size=(200, 100)).astype(np.float32)
        params = [120.0, 121.0, 50.0, 100.0]
        oi, od, op = G.crop_to_aspect_ratio(img, depth, params, 1.5)
        ri, rd, rp = ref_geometry.crop_to_aspect_ratio(
            Image.fromarray(img), depth, params, 1.5
        )
        assert np.array_equal(oi, np.asarray(ri))
        assert np.array_equal(od, rd)
        assert list(op) == list(rp)


class TestSlerpAndInterp:
    def test_slerp_endpoint_and_midpoint(self, rng):
        from mapanything_tpu.geometry.quats import quaternion_slerp

        q1 = jnp.asarray([0.0, 0.0, 0.0, 1.0])  # identity
        th = np.pi / 2
        q2 = jnp.asarray([0.0, 0.0, np.sin(th / 2), np.cos(th / 2)])  # 90z
        np.testing.assert_allclose(np.asarray(quaternion_slerp(q1, q2, 0.0)),
                                   np.asarray(q1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(quaternion_slerp(q1, q2, 1.0)),
                                   np.asarray(q2), atol=1e-6)
        mid = quaternion_slerp(q1, q2, 0.5)  # 45 deg about z
        expect = np.array([0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
        np.testing.assert_allclose(np.asarray(mid), expect, atol=1e-6)
        # sign flip: slerp(q, -q2) matches slerp(q, q2) up to sign
        mid2 = quaternion_slerp(q1, -q2, 0.5)
        assert (np.allclose(np.asarray(mid2), expect, atol=1e-6)
                or np.allclose(np.asarray(mid2), -expect, atol=1e-6))

    def test_interpolate_extrinsics_rotation_angle(self, rng):
        from mapanything_tpu.data.wai import interpolate_extrinsics

        th = np.deg2rad(60.0)
        m1 = np.eye(4)
        m2 = np.eye(4)
        m2[:3, :3] = np.array([
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ])
        m2[:3, 3] = [2.0, 0.0, 4.0]
        mid = interpolate_extrinsics(m1, m2, 0.5)
        # rotation angle of the midpoint must be exactly 30 deg
        ang = np.rad2deg(np.arccos((np.trace(mid[:3, :3]) - 1) / 2))
        np.testing.assert_allclose(ang, 30.0, atol=1e-4)
        np.testing.assert_allclose(mid[:3, 3], [1.0, 0.0, 2.0], atol=1e-6)

    def test_get_frame_interpolated(self, tmp_path, rng):
        from mapanything_tpu.data.wai import get_extrinsics, get_frame

        meta = {
            "frames": [
                {"frame_name": "a", "fx": 100.0, "fy": 100.0,
                 "cx": 10.0, "cy": 20.0,
                 "transform_matrix": np.eye(4).tolist()},
                {"frame_name": "b", "fx": 200.0, "fy": 300.0,
                 "cx": 30.0, "cy": 40.0,
                 "transform_matrix": np.eye(4).tolist()},
            ],
            "frame_names": {"a": 0, "b": 1},
        }
        f = get_frame(meta, 0.5)
        assert f["_is_interpolated"]
        np.testing.assert_allclose(f["fx"], 150.0)
        np.testing.assert_allclose(f["cy"], 30.0)
        assert get_frame(meta, "b")["frame_name"] == "b"
        assert not get_frame(meta, 1)["_is_interpolated"]
        np.testing.assert_allclose(get_extrinsics(meta, 0.25), np.eye(4),
                                   atol=1e-6)
        # negative fractional keys must raise, not extrapolate
        # (regression: int(-0.5) == 0 slipped past the range check)
        with pytest.raises(IndexError):
            get_frame(meta, -0.5)
        with pytest.raises(IndexError):
            get_frame(meta, 1.5)
