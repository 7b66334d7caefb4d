"""Undistortion stage: own distortion math golden-tested against cv2
(reference data_processing/wai_processing/scripts/undistort.py uses cv2
directly; here cv2 is only the oracle)."""

import numpy as np
import pytest

from mapanything_tpu.data import undistort as ud

cv2 = pytest.importorskip("cv2")

W, H = 64, 48
K = np.array([[50.0, 0, 33.0], [0, 52.0, 22.0], [0, 0, 1]])
DIST_CV = np.array([-0.25, 0.06, 0.001, -0.002, 0.01])  # k1,k2,p1,p2,k3
DIST_FE = np.array([-0.05, 0.02, -0.01, 0.003])  # k1..k4


class TestMapsGolden:
    def test_opencv_maps_match_cv2(self):
        mx, my = ud.undistort_rectify_maps(K, DIST_CV, "OPENCV", (W, H))
        cx, cy = cv2.initUndistortRectifyMap(
            K, DIST_CV, None, K, (W, H), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, cx, atol=1e-3)
        np.testing.assert_allclose(my, cy, atol=1e-3)

    def test_fisheye_maps_match_cv2(self):
        mx, my = ud.undistort_rectify_maps(
            K, DIST_FE, "OPENCV_FISHEYE", (W, H))
        cx, cy = cv2.fisheye.initUndistortRectifyMap(
            K, DIST_FE, np.eye(3), K, (W, H), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, cx, atol=1e-3)
        np.testing.assert_allclose(my, cy, atol=1e-3)

    def test_new_K_maps_match_cv2(self):
        new_K = K.copy()
        new_K[0, 0] = 40.0
        new_K[:2, 2] = [W / 2, H / 2]
        mx, my = ud.undistort_rectify_maps(
            K, DIST_CV, "OPENCV", (W, H), new_K=new_K)
        cx, cy = cv2.initUndistortRectifyMap(
            K, DIST_CV, None, new_K, (W, H), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, cx, atol=1e-3)
        np.testing.assert_allclose(my, cy, atol=1e-3)


class TestInverse:
    @pytest.mark.parametrize("model,dist", [
        ("OPENCV", DIST_CV), ("OPENCV_FISHEYE", DIST_FE)])
    def test_undistort_roundtrip(self, model, dist):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-0.4, 0.4, size=(200, 2))
        xyd = (ud.distort_opencv(xy, dist) if model == "OPENCV"
               else ud.distort_fisheye(xy, dist))
        back = ud.undistort_points_normalized(xyd, dist, model)
        np.testing.assert_allclose(back, xy, atol=1e-6)

    def test_fisheye_strong_distortion_matches_cv2(self):
        # a real ~160-deg fisheye: theta up to ~1.45 rad; the Newton
        # denominator must be g' = 1 + 3k1 t^2 + ... (regression: the
        # poly+dpoly form diverged here)
        dist = np.array([-0.2, 0.1, -0.05, 0.01])
        theta = np.linspace(0.1, 1.45, 40)
        r = np.tan(theta)
        xy = np.stack([r * np.cos(0.7), r * np.sin(0.7)], -1)
        xyd = ud.distort_fisheye(xy, dist)
        rec = ud.undistort_points_normalized(xyd, dist, "OPENCV_FISHEYE")
        np.testing.assert_allclose(rec, xy, atol=1e-9)
        ref = cv2.fisheye.undistortPoints(
            xyd.reshape(-1, 1, 2).astype(np.float64), np.eye(3),
            dist.reshape(4, 1)).reshape(-1, 2)
        np.testing.assert_allclose(rec, ref, atol=1e-9)

    def test_matches_cv2_undistort_points(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform([5, 5], [W - 5, H - 5], size=(50, 2))
        xyd = (pts - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
        ours = ud.undistort_points_normalized(xyd, DIST_CV, "OPENCV")
        ref = cv2.undistortPoints(
            pts.reshape(-1, 1, 2).astype(np.float64), K, DIST_CV
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRemap:
    def setup_method(self):
        rng = np.random.default_rng(2)
        self.img = rng.uniform(0, 255, size=(H, W, 3)).astype(np.float32)
        self.mx, self.my = ud.undistort_rectify_maps(
            K, DIST_CV, "OPENCV", (W, H))

    def test_bool_mask_roundtrips(self):
        """Regression: np.iinfo(bool) raised in the bilinear clip path."""
        rng = np.random.default_rng(5)
        mask = rng.uniform(size=(H, W)) > 0.4
        for interp in ("linear", "nearest"):
            out = ud.remap(mask, self.mx, self.my, interp, "constant", 0)
            assert out.dtype == np.bool_ and out.shape == mask.shape
        # identity maps reproduce the mask exactly
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        np.testing.assert_array_equal(
            ud.remap(mask, u, v, "linear", "constant", 0), mask)

    def test_linear_constant_matches_cv2(self):
        ours = ud.remap(self.img, self.mx, self.my, "linear", "constant", 0)
        ref = cv2.remap(self.img, self.mx, self.my,
                        interpolation=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        np.testing.assert_allclose(ours, ref, atol=0.25)

    def test_linear_reflect101_matches_cv2(self):
        ours = ud.remap(self.img, self.mx, self.my, "linear", "reflect101")
        ref = cv2.remap(self.img, self.mx, self.my,
                        interpolation=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=0.25)

    def test_nearest_constant_matches_cv2(self):
        depth = np.arange(H * W, dtype=np.float32).reshape(H, W)
        ours = ud.remap(depth, self.mx, self.my, "nearest", "constant", -1)
        ref = cv2.remap(depth, self.mx, self.my,
                        interpolation=cv2.INTER_NEAREST,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=-1)
        # cv2 rounds .5 cases differently in rare spots; allow a tiny
        # fraction of single-pixel disagreements
        agree = np.isclose(ours, ref).mean()
        assert agree > 0.995


class TestNewIntrinsics:
    def test_balance0_output_backed_by_source(self):
        new_K = ud.estimate_new_intrinsics(
            K, DIST_FE, "OPENCV_FISHEYE", (W, H), balance=0.0)
        mx, my = ud.undistort_rectify_maps(
            K, DIST_FE, "OPENCV_FISHEYE", (W, H), new_K=new_K)
        inside = ((mx >= -0.5) & (mx <= W - 0.5)
                  & (my >= -0.5) & (my <= H - 0.5))
        assert inside.mean() > 0.97

    def test_balance1_keeps_all_source(self):
        k0 = ud.estimate_new_intrinsics(
            K, DIST_FE, "OPENCV_FISHEYE", (W, H), balance=0.0)
        k1 = ud.estimate_new_intrinsics(
            K, DIST_FE, "OPENCV_FISHEYE", (W, H), balance=1.0)
        assert k1[0, 0] <= k0[0, 0]  # wider view keeps more content

    def test_balance0_backed_without_centered_pp(self):
        """Regression: the non-centered branch used the min (looser)
        focal for the inscribed box and always centered on the
        circumscribed midpoint — under asymmetric (tangential) distortion
        output pixels mapped outside the source at balance=0."""
        dist = np.array([-0.25, 0.06, 0.004, -0.006, 0.0])  # p1/p2 != 0
        for model, d in (("OPENCV", dist), ("OPENCV_FISHEYE", DIST_FE)):
            new_K = ud.estimate_new_intrinsics(
                K, d, model, (W, H), balance=0.0,
                center_principal_point=False)
            mx, my = ud.undistort_rectify_maps(
                K, d, model, (W, H), new_K=new_K)
            inside = ((mx >= -0.5) & (mx <= W - 0.5)
                      & (my >= -0.5) & (my <= H - 0.5))
            assert inside.mean() > 0.999, (model, inside.mean())


class TestFrameRecipe:
    def test_undistort_frame_end_to_end(self):
        rng = np.random.default_rng(3)
        meta = {
            "w": W, "h": H, "fl_x": K[0, 0], "fl_y": K[1, 1],
            "cx": K[0, 2], "cy": K[1, 2],
            "camera_model": "OPENCV_FISHEYE",
            "k1": DIST_FE[0], "k2": DIST_FE[1],
            "k3": DIST_FE[2], "k4": DIST_FE[3],
        }
        mods = {
            "image": rng.uniform(0, 255, (H, W, 3)).astype(np.uint8),
            "depth": rng.uniform(0.5, 3, (H, W)).astype(np.float32),
            "mask": np.ones((H, W), bool),
        }
        out, new_meta = ud.undistort_frame(mods, meta)
        assert new_meta["camera_model"] == "PINHOLE"
        assert "k1" not in new_meta
        assert out["image"].shape == (H, W, 3)
        assert out["image"].dtype == np.uint8
        # depth resampled nearest: every valid output value exists in the
        # source (no interpolation blending)
        valid = out["depth"] > 0
        assert valid.any()
        assert np.isin(out["depth"][valid][:50],
                       mods["depth"].ravel()).all()
        # full-true mask stays mostly true where content is backed
        assert out["mask"].mean() > 0.9

    def test_pinhole_rejects(self):
        with pytest.raises(NotImplementedError):
            ud.undistort_frame(
                {}, {"w": W, "h": H, "fl_x": 1, "fl_y": 1, "cx": 0,
                     "cy": 0, "camera_model": "PANORAMA"})

    def test_repo_wai_key_interop(self):
        # accepts this repo's fx/fy spelling and emits BOTH spellings, so
        # the output meta round-trips through wai.get_intrinsics
        from mapanything_tpu.data.wai import get_intrinsics

        meta = {
            "w": W, "h": H, "fx": K[0, 0], "fy": K[1, 1],
            "cx": K[0, 2], "cy": K[1, 2],
            "camera_model": "OPENCV",
            "k1": DIST_CV[0], "k2": DIST_CV[1],
            "p1": DIST_CV[2], "p2": DIST_CV[3], "k3": DIST_CV[4],
        }
        img = np.zeros((H, W, 3), np.uint8)
        _, new_meta = ud.undistort_frame({"image": img}, meta)
        assert new_meta["fx"] == new_meta["fl_x"]
        K_rt = get_intrinsics(new_meta, {})
        assert K_rt[0, 0] == np.float32(new_meta["fx"])
        # and the reader accepts reference-WAI fl_x-only metas too
        fl_only = {k: v for k, v in new_meta.items()
                   if k not in ("fx", "fy")}
        np.testing.assert_array_equal(get_intrinsics(fl_only, {}), K_rt)
