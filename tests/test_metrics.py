"""Metrics golden-parity tests vs the PyTorch reference."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from mapanything_tpu.utils import metrics as M


@pytest.fixture(scope="module")
def ref_metrics():
    from mapanything.utils import metrics as ref

    return ref


def random_se3(rng, n):
    from mapanything_tpu.geometry import quaternion_to_rotation_matrix
    import jax.numpy as jnp

    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    se3 = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    se3[:, :3, :3] = np.asarray(quaternion_to_rotation_matrix(jnp.asarray(q)))
    se3[:, :3, 3] = rng.normal(size=(n, 3))
    return se3


class TestDenseMetrics:
    def test_thresh_inliers(self, ref_metrics, rng):
        gt = rng.uniform(0.5, 5, size=(20, 30, 1)).astype(np.float32)
        pred = gt * rng.uniform(0.95, 1.1, size=gt.shape).astype(np.float32)
        mask = rng.uniform(size=(20, 30)) > 0.2
        ours = M.thresh_inliers(gt, pred, 1.03, mask, 100.0)
        ref = ref_metrics.thresh_inliers(gt, pred, 1.03, mask, 100.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_m_rel_ae(self, ref_metrics, rng):
        gt = rng.uniform(0.5, 5, size=(20, 30, 3)).astype(np.float32)
        pred = gt + 0.1 * rng.standard_normal(gt.shape).astype(np.float32)
        mask = rng.uniform(size=(20, 30)) > 0.2
        ours = M.m_rel_ae(gt, pred, mask, 100.0)
        ref = ref_metrics.m_rel_ae(gt, pred, mask, 100.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_all_invalid_returns_nan(self):
        gt = np.zeros((4, 4, 1), np.float32)
        assert np.isnan(M.thresh_inliers(gt, gt + 1))
        assert np.isnan(M.m_rel_ae(gt, gt + 1))


class TestPoseMetrics:
    def test_evaluate_ate(self, ref_metrics, rng):
        import torch

        gt = random_se3(rng, 8)
        est = random_se3(rng, 8)
        ours = M.evaluate_ate(list(gt), list(est))
        ref = ref_metrics.evaluate_ate(
            [torch.from_numpy(p) for p in gt], [torch.from_numpy(p) for p in est]
        )
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)

    def test_relative_pose_error_and_auc(self, ref_metrics, rng):
        import torch

        gt = random_se3(rng, 6)
        pred = gt.copy()
        # perturb predictions slightly
        pred[:, :3, 3] += 0.05 * rng.standard_normal((6, 3))
        ours_r, ours_t = M.se3_to_relative_pose_error(pred, gt, 6)
        ref_r, ref_t = ref_metrics.se3_to_relative_pose_error(
            torch.from_numpy(pred).float(), torch.from_numpy(gt).float(), 6
        )
        np.testing.assert_allclose(ours_r, ref_r.numpy(), atol=0.1)
        np.testing.assert_allclose(ours_t, ref_t.numpy(), atol=0.5)

        ours_auc, _ = M.calculate_auc_np(ours_r, ours_t, 30)
        ref_auc, _ = ref_metrics.calculate_auc_np(ref_r.numpy(), ref_t.numpy(), 30)
        np.testing.assert_allclose(ours_auc, ref_auc, atol=1e-3)

    def test_identical_poses_zero_error(self, rng):
        gt = random_se3(rng, 5)
        r, t = M.se3_to_relative_pose_error(gt, gt, 5)
        # arccos near 1 amplifies fp noise; 0.05 deg is numerically zero here
        assert np.all(r < 0.05)
        auc, _ = M.calculate_auc_np(r, np.zeros_like(t), 30)
        assert auc > 0.96  # all errors in the first bin


def test_translation_angle_zero_norm_is_90deg():
    """A pure-rotation pair (zero relative translation) must score 90 deg
    like the reference's eps-guarded compare_translation_by_angle
    (metrics.py:392-398) — not the NaN->1e6 default path."""
    z = np.zeros((3, 3))
    ang = M.translation_angle(z, z)
    np.testing.assert_allclose(ang, 90.0)
    # and a genuine direction pair is unaffected
    a = np.array([[1.0, 0, 0]])
    b = np.array([[0.0, 1, 0]])
    np.testing.assert_allclose(M.translation_angle(a, b), 90.0)
    np.testing.assert_allclose(M.translation_angle(a, a), 0.0, atol=1e-3)
