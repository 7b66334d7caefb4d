"""Golden parity: composable criteria vs the importable PyTorch reference.

The reference's mapanything/train/losses.py imports standalone (no UniCeption
dependency), so every composable criterion is tested end-to-end against the
real thing on synthetic batches — the strongest possible oracle (round-1
VERDICT item 7). float64 on both sides, tolerances ~1e-9.
"""

import importlib
import pathlib
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mapanything_tpu.train import criteria as C

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="module", autouse=True)
def x64():
    # float64 on both sides: the parity assertions run at rtol ~1e-9.
    # torch default dtype must be f64 too — some reference code paths
    # (e.g. the disentangled pointmap recombination) create constants with
    # the default dtype.
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def ref_losses():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REFERENCE_ROOT))
    return importlib.import_module("mapanything.train.losses")


@pytest.fixture(scope="module")
def ref_geometry():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REFERENCE_ROOT))
    return importlib.import_module("mapanything.utils.geometry")


B, V, H, W = 2, 3, 14, 14


@pytest.fixture(scope="module")
def data(ref_geometry):
    """Synthetic geometrically-consistent batch in BOTH formats:
    reference list-of-view-dicts (torch f64) and stacked dicts (jnp f64)."""
    rng = np.random.default_rng(7)
    q = rng.normal(size=(B, V, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(B, V, 3))

    rays = rng.normal(size=(B, V, H, W, 3))
    rays[..., 2] = np.abs(rays[..., 2]) + 1.0
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    depth = 1.0 + np.abs(rng.normal(size=(B, V, H, W, 1)))
    pts_cam = rays * depth

    R = ref_geometry.quaternion_to_rotation_matrix(
        torch.from_numpy(q.reshape(-1, 4))
    ).numpy().reshape(B, V, 3, 3)
    pts3d = (
        np.einsum("bvij,bvhwj->bvhwi", R, pts_cam)
        + t[:, :, None, None, :]
    )
    valid = rng.uniform(size=(B, V, H, W)) > 0.2
    valid[..., 0, 0] = True  # every view keeps at least one valid pixel
    non_amb = valid | (rng.uniform(size=valid.shape) > 0.5)
    is_metric = np.array([True, False])
    is_synthetic = np.array([False, True])

    # predictions: GT + noise, multiplied by a predicted metric scale
    s = np.exp(rng.normal(size=(B,)) * 0.1)
    noise = lambda shape, eps=0.05: rng.normal(size=shape) * eps  # noqa: E731
    pr_rays = rays + noise(rays.shape)
    pr_rays /= np.linalg.norm(pr_rays, axis=-1, keepdims=True)
    pr_depth = (depth + np.abs(noise(depth.shape))) * s[:, None, None, None,
                                                        None]
    pr_q = q + noise(q.shape)
    pr_q /= np.linalg.norm(pr_q, axis=-1, keepdims=True)
    pr_t = (t + noise(t.shape)) * s[:, None, None]
    pr_pts_cam = pr_rays * pr_depth
    pr_R = ref_geometry.quaternion_to_rotation_matrix(
        torch.from_numpy(pr_q.reshape(-1, 4))
    ).numpy().reshape(B, V, 3, 3)
    pr_pts3d = (
        np.einsum("bvij,bvhwj->bvhwi", pr_R, pr_pts_cam)
        + pr_t[:, :, None, None, :]
    )
    conf = 1.0 + np.abs(rng.normal(size=(B, V, H, W)))
    logits = rng.normal(size=(B, V, H, W))

    pose44 = np.tile(np.eye(4), (B, V, 1, 1))
    pose44[..., :3, :3] = R
    pose44[..., :3, 3] = t

    def tt(x):
        return torch.from_numpy(np.ascontiguousarray(x)).to(torch.float64)

    ref_batch = [
        {
            "pts3d": tt(pts3d[:, i]),
            "pts3d_cam": tt(pts_cam[:, i]),
            "ray_directions_cam": tt(rays[:, i]),
            "depth_along_ray": tt(depth[:, i]),
            "camera_pose": tt(pose44[:, i]),
            "camera_pose_quats": tt(q[:, i]),
            "camera_pose_trans": tt(t[:, i]),
            "valid_mask": torch.from_numpy(valid[:, i]),
            "non_ambiguous_mask": torch.from_numpy(non_amb[:, i]),
            "is_metric_scale": torch.from_numpy(is_metric),
            "is_synthetic": torch.from_numpy(is_synthetic),
        }
        for i in range(V)
    ]
    ref_preds = [
        {
            "pts3d": tt(pr_pts3d[:, i]),
            "pts3d_cam": tt(pr_pts_cam[:, i]),
            "ray_directions": tt(pr_rays[:, i]),
            "depth_along_ray": tt(pr_depth[:, i]),
            "cam_quats": tt(pr_q[:, i]),
            "cam_trans": tt(pr_t[:, i]),
            # the reference model emits (B, 1) (model.py:1464-1469)
            "metric_scaling_factor": tt(s)[:, None],
            "conf": tt(conf[:, i]),
            "non_ambiguous_mask_logits": tt(logits[:, i]),
        }
        for i in range(V)
    ]

    j = lambda x: jnp.asarray(x, jnp.float64)  # noqa: E731
    batch = {
        "pts3d": j(pts3d),
        "pts3d_cam": j(pts_cam),
        "ray_directions_cam": j(rays),
        "depth_along_ray": j(depth),
        "camera_pose_quats": j(q),
        "camera_pose_trans": j(t),
        "valid_mask": jnp.asarray(valid),
        "non_ambiguous_mask": jnp.asarray(non_amb),
        "is_metric_scale": jnp.asarray(is_metric),
        "is_synthetic": jnp.asarray(is_synthetic),
    }
    preds = {
        "pts3d": j(pr_pts3d),
        "pts3d_cam": j(pr_pts_cam),
        "ray_directions": j(pr_rays),
        "depth_along_ray": j(pr_depth),
        "cam_quats": j(pr_q),
        "cam_trans": j(pr_t),
        "metric_scaling_factor": j(s),
        "conf": j(conf),
        "non_ambiguous_mask_logits": j(logits),
    }
    return ref_batch, ref_preds, batch, preds


def _ref_total(ref_loss_obj, ref_batch, ref_preds):
    out = ref_loss_obj(ref_batch, ref_preds)
    loss, details = out
    if not torch.is_tensor(loss):  # Sum list fell through (shouldn't)
        raise AssertionError("reference returned a non-scalar loss")
    return float(loss)


def _assert_close(ours, ref, rtol=1e-9):
    assert np.isfinite(ref) and np.isfinite(float(ours))
    np.testing.assert_allclose(float(ours), ref, rtol=rtol, atol=1e-11)


def _run(criterion, batch, preds):
    """Criterion total under jit: eager dispatch of the composite criteria
    graphs costs seconds per call on this 1-core box; the compiled program
    lands in conftest's persistent cache, so warm suite runs pay ~nothing.
    """
    return jax.jit(lambda b, p: criterion(b, p)[0])(batch, preds)


class TestBareCriteria:
    """Bare set criteria (reduction='mean' path, flatten=False)."""

    def test_regr3d(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.Regr3D(ref_losses.L2Loss(), norm_mode="?avg_dis",
                                loss_in_log=True)
        ours = C.Regr3D(C.L2Loss(), norm_mode="?avg_dis", loss_in_log=True)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_regr3d_norm_all_no_log(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.Regr3D(ref_losses.L1Loss(), norm_mode="avg_dis",
                                loss_in_log=False)
        ours = C.Regr3D(C.L1Loss(), norm_mode="avg_dis", loss_in_log=False)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_regr3d_gt_scale(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.Regr3D(ref_losses.L2Loss(), norm_mode="?avg_dis",
                                gt_scale=True)
        ours = C.Regr3D(C.L2Loss(), norm_mode="?avg_dis", gt_scale=True)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_points_plus_scale(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.PointsPlusScaleRegr3D(
            ref_losses.L2Loss(), norm_mode="avg_dis", loss_in_log=True
        )
        ours = C.PointsPlusScaleRegr3D(C.L2Loss(), norm_mode="avg_dis",
                                       loss_in_log=True)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_factored_geometry(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        kw = dict(norm_mode="?avg_dis", loss_in_log=True,
                  compute_world_frame_points_loss=True)
        ref = ref_losses.FactoredGeometryRegr3D(ref_losses.L2Loss(), **kw)
        ours = C.FactoredGeometryRegr3D(C.L2Loss(), **kw)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_factored_geometry_scale(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        kw = dict(norm_predictions=True, norm_mode="avg_dis",
                  loss_in_log=True, compute_world_frame_points_loss=True)
        crit = dict(alpha=0.5, scaling_c=0.05)
        ref = ref_losses.FactoredGeometryScaleRegr3D(
            ref_losses.RobustRegressionLoss(**crit), **kw
        )
        ours = C.FactoredGeometryScaleRegr3D(
            C.RobustRegressionLoss(**crit), **kw
        )
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_factored_geometry_scale_pairwise_pose(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        kw = dict(norm_predictions=True, norm_mode="avg_dis",
                  loss_in_log=True, compute_pairwise_relative_pose_loss=True)
        ref = ref_losses.FactoredGeometryScaleRegr3D(ref_losses.L1Loss(),
                                                     **kw)
        ours = C.FactoredGeometryScaleRegr3D(C.L1Loss(), **kw)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_disentangled(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        kw = dict(norm_predictions=True, norm_mode="avg_dis",
                  loss_in_log=True)
        ref = ref_losses.DisentangledFactoredGeometryScaleRegr3D(
            ref_losses.L2Loss(), **kw
        )
        ours = C.DisentangledFactoredGeometryScaleRegr3D(C.L2Loss(), **kw)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_factored_lloss_dispatch(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.FactoredGeometryScaleRegr3D(
            ref_losses.FactoredLLoss(), norm_mode="avg_dis"
        )
        ours = C.FactoredGeometryScaleRegr3D(C.FactoredLLoss(),
                                             norm_mode="avg_dis")
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))


class TestWrappers:
    """Standalone wrappers on flatten_across_image_only pixel losses."""

    def _pixel(self, ref_losses, **kw):
        base = dict(norm_predictions=True, norm_mode="avg_dis",
                    loss_in_log=True, flatten_across_image_only=True,
                    compute_world_frame_points_loss=True)
        base.update(kw)
        crit = dict(alpha=0.5, scaling_c=0.05)
        ref = ref_losses.FactoredGeometryScaleRegr3D(
            ref_losses.RobustRegressionLoss(**crit), **base
        )
        ours = C.FactoredGeometryScaleRegr3D(
            C.RobustRegressionLoss(**crit), **base
        )
        return ref, ours

    def test_conf_loss(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref_p, ours_p = self._pixel(ref_losses)
        ref = ref_losses.ConfLoss(ref_p, alpha=0.2, loss_set_indices=[0])
        ours = C.ConfLoss(ours_p, alpha=0.2, loss_set_indices=[0])
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_conf_loss_multiple_sets(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref_p, ours_p = self._pixel(ref_losses)
        ref = ref_losses.ConfLoss(ref_p, alpha=0.5, loss_set_indices=[0, 2])
        ours = C.ConfLoss(ours_p, alpha=0.5, loss_set_indices=[0, 2])
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_exclude_top_n(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref_p, ours_p = self._pixel(ref_losses)
        ref = ref_losses.ExcludeTopNPercentPixelLoss(
            ref_p, top_n_percent=5, apply_to_real_data_only=True,
            loss_set_indices=[1, 2],
        )
        ours = C.ExcludeTopNPercentPixelLoss(
            ours_p, top_n_percent=5, apply_to_real_data_only=True,
            loss_set_indices=[1, 2],
        )
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_exclude_top_n_all_data(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref_p, ours_p = self._pixel(ref_losses)
        ref = ref_losses.ExcludeTopNPercentPixelLoss(
            ref_p, top_n_percent=20, apply_to_real_data_only=False,
            loss_set_indices=[0],
        )
        ours = C.ExcludeTopNPercentPixelLoss(
            ours_p, top_n_percent=20, apply_to_real_data_only=False,
            loss_set_indices=[0],
        )
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_conf_and_exclude(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref_p, ours_p = self._pixel(ref_losses)
        kw = dict(conf_alpha=0.2, top_n_percent=5,
                  apply_to_real_data_only=True, conf_loss_set_indices=[0],
                  exclude_loss_set_indices=[1, 2])
        ref = ref_losses.ConfAndExcludeTopNPercentPixelLoss(ref_p, **kw)
        ours = C.ConfAndExcludeTopNPercentPixelLoss(ours_p, **kw)
        _assert_close(_run(ours, batch, preds),
                      _ref_total(ref, ref_batch, ref_preds))

    def test_non_ambiguous_mask(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = ref_losses.NonAmbiguousMaskLoss(ref_losses.BCELoss())
        ours = C.NonAmbiguousMaskLoss(C.BCELoss())
        out = ref(ref_batch, ref_preds)
        ref_total = out[0]
        if not torch.is_tensor(ref_total):  # Sum list of scalars
            ref_total = sum(x[0] for x in ref_total)
        # torch's fused BCE-with-logits differs from the log1p(exp)
        # formulation by ~1e-8 even in f64
        _assert_close(_run(ours, batch, preds), float(ref_total), rtol=1e-6)


class TestComposition:
    def test_multiloss_arithmetic(self, ref_losses, data):
        ref_batch, ref_preds, batch, preds = data
        ref = (
            ref_losses.Regr3D(ref_losses.L2Loss(), norm_mode="avg_dis") * 2.0
            + 0.3 * ref_losses.NonAmbiguousMaskLoss(ref_losses.BCELoss())
        )
        ours = (
            C.Regr3D(C.L2Loss(), norm_mode="avg_dis") * 2.0
            + 0.3 * C.NonAmbiguousMaskLoss(C.BCELoss())
        )
        ref_loss, _ = ref(ref_batch, ref_preds)
        # reference NonAmbiguousMaskLoss returns a Sum of scalars handled by
        # MultiLoss.forward; Regr3D with reduction 'mean' returns a scalar.
        # BCE tolerance as in test_non_ambiguous_mask.
        _assert_close(_run(ours, batch, preds), float(ref_loss), rtol=1e-6)

    def test_released_recipe(self, ref_losses, data):
        """The full released training criterion, end to end
        (configs/loss/overall_loss.yaml)."""
        ref_batch, ref_preds, batch, preds = data
        ref_pixel = ref_losses.FactoredGeometryScaleRegr3DPlusNormalGMLoss(
            ref_losses.RobustRegressionLoss(alpha=0.5, scaling_c=0.05),
            norm_predictions=True,
            norm_mode="avg_dis",
            loss_in_log=True,
            flatten_across_image_only=True,
            compute_world_frame_points_loss=True,
            apply_normal_and_gm_loss_to_synthetic_data_only=True,
            normal_loss_weight=3.0,
            gm_loss_weight=3.0,
        )
        ref = ref_losses.ConfAndExcludeTopNPercentPixelLoss(
            ref_pixel, conf_alpha=0.2, top_n_percent=5,
            apply_to_real_data_only=True, conf_loss_set_indices=[0],
            exclude_loss_set_indices=[1, 2],
        ) + 0.3 * ref_losses.NonAmbiguousMaskLoss(ref_losses.BCELoss())

        ours = C.released_criterion()
        ref_loss, _ = ref(ref_batch, ref_preds)
        ours_loss, details = jax.jit(ours)(batch, preds)
        _assert_close(ours_loss, float(ref_loss), rtol=1e-8)
        assert details  # per-term diagnostics populated

    def test_released_recipe_grad_flows(self, data):
        """d(total)/d(preds) exists and is finite through the composed
        criterion (stop_gradient only detaches the scale-set geometry)."""
        _, _, batch, preds = data
        ours = C.released_criterion()

        def f(p):
            return ours(batch, p)[0]

        grads = jax.jit(jax.grad(f))(preds)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)
