"""Loss stack tests: analytic sanity + gradient flow + exclusion semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jitu import japply  # noqa: F401  (shared jit cache pattern)
from mapanything_tpu.data.synthetic import make_synthetic_batch
from mapanything_tpu.train.losses import (
    OverallLossConfig,
    RobustRegressionLoss,
    bce_with_logits,
    exclude_top_n_percent,
    factored_geometry_scale_regr3d,
    overall_loss,
)

B, V, H, W = 2, 3, 14, 14


_SET_ORDER = []  # captured at trace time (jit output dicts are key-sorted)


@jax.jit
def _jitted_factored_values(gt, preds):
    sets = factored_geometry_scale_regr3d(gt, preds)
    if not _SET_ORDER:
        _SET_ORDER.extend(sets.keys())
    return [{kk: vv for kk, vv in t.items() if kk != "type"}
            for t in sets.values()]


def _jitted_factored_sets(gt, preds):
    """factored_geometry_scale_regr3d under jit, minus the static "type"
    strings (not valid jit outputs; the tests here only use loss/mask),
    with the reference set ORDER preserved."""
    vals = _jitted_factored_values(gt, preds)
    return dict(zip(_SET_ORDER, vals))


def perfect_preds(gt):
    """Predictions exactly matching GT (in view0 frame, metric scale 1)."""
    from mapanything_tpu.geometry import (
        closed_form_pose_inverse,
        pose_quats_trans_to_matrix,
        quaternion_inverse,
        quaternion_multiply,
        transform_pose_using_quats_and_trans_2_to_1,
    )

    q0 = gt["camera_pose_quats"][:, :1]
    t0 = gt["camera_pose_trans"][:, :1]
    rel_q, rel_t = transform_pose_using_quats_and_trans_2_to_1(
        jnp.broadcast_to(q0, gt["camera_pose_quats"].shape),
        jnp.broadcast_to(t0, gt["camera_pose_trans"].shape),
        gt["camera_pose_quats"],
        gt["camera_pose_trans"],
    )
    pose0 = pose_quats_trans_to_matrix(q0[:, 0], t0[:, 0])
    inv0 = closed_form_pose_inverse(pose0)
    pts_v0 = (
        jnp.einsum("bij,bvhwj->bvhwi", inv0[:, :3, :3], gt["pts3d"], precision="highest")
        + inv0[:, None, None, None, :3, 3]
    )
    b, v = gt["pts3d"].shape[:2]
    return {
        "pts3d": pts_v0,
        "pts3d_cam": gt["pts3d_cam"],
        "ray_directions": gt["ray_directions_cam"],
        "depth_along_ray": gt["depth_along_ray"],
        "cam_trans": rel_t,
        "cam_quats": rel_q,
        "metric_scaling_factor": jnp.ones((b,)),
        "conf": jnp.ones((b, v) + gt["pts3d"].shape[2:4]),
        "non_ambiguous_mask_logits": jnp.full(
            (b, v) + gt["pts3d"].shape[2:4], 10.0
        ),
    }


class TestFactoredLoss:
    def test_perfect_prediction_zero_geometry_loss(self):
        batch = make_synthetic_batch(B, V, H, W, seed=3)
        gt = batch["gt"]
        preds = perfect_preds(gt)
        sets = _jitted_factored_sets(gt, preds)
        order = list(sets.keys())
        assert order == [
            "pts3d", "cam_pts3d", "depth_along_ray", "ray_directions",
            "pose_quats", "pose_trans", "scale",
        ]
        for name, term in sets.items():
            loss = term["loss"]
            mask = term["mask"]
            val = (
                float(jnp.sum(loss * mask) / jnp.clip(mask.sum(), 1, None))
                if mask is not None
                else float(jnp.mean(loss))
            )
            assert val < 1e-3, f"{name} loss {val} not ~0 for perfect preds"

    @pytest.mark.slow
    def test_overall_loss_finite_and_scaled(self):
        batch = make_synthetic_batch(B, V, H, W, seed=4)
        gt = batch["gt"]
        preds = perfect_preds(gt)
        # distort
        preds = dict(preds)
        preds["depth_along_ray"] = preds["depth_along_ray"] * 1.3
        preds["pts3d_cam"] = preds["ray_directions"] * preds["depth_along_ray"]
        total, details = jax.jit(overall_loss)(gt, preds)
        assert np.isfinite(float(total))
        assert float(total) > 0
        # >2 views: 2/n scaling applied
        assert "total" in details

    def test_gradients_flow(self):
        batch = make_synthetic_batch(1, 2, H, W, seed=5)
        gt = batch["gt"]
        preds = perfect_preds(gt)

        def f(depth):
            p = dict(preds)
            p["depth_along_ray"] = depth
            p["pts3d_cam"] = p["ray_directions"] * depth
            return overall_loss(gt, p)[0]

        g = jax.jit(jax.grad(f))(preds["depth_along_ray"] * 1.1)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0

    def test_metric_scale_detached_from_geometry(self):
        """Scale gradient must flow ONLY through the scale loss term
        (reference detaches geometry from the scaling factor,
        losses.py:3310-3345)."""
        batch = make_synthetic_batch(1, 2, H, W, seed=6)
        gt = batch["gt"]
        base = perfect_preds(gt)

        def f(s):
            p = dict(base)
            # model applies s to all metric outputs
            p = {
                **p,
                "pts3d": base["pts3d"] * s,
                "pts3d_cam": base["pts3d_cam"] * s,
                "depth_along_ray": base["depth_along_ray"] * s,
                "cam_trans": base["cam_trans"] * s,
                "metric_scaling_factor": jnp.full((1,), s[0]),
            }
            sets = _jitted_factored_sets(gt, p)
            # geometry sets must be invariant to s (divided out)
            geo = sum(
                jnp.mean(t["loss"])
                for k, t in sets.items()
                if k != "scale"
            )
            return geo

        g = jax.jit(jax.grad(f))(jnp.asarray([2.0]))
        assert abs(float(g[0])) < 1e-4, "geometry loss should not depend on scale"


class TestWrappers:
    def test_exclude_top_n(self):
        loss = jnp.asarray(
            np.arange(100, dtype=np.float32)[None, None]
        )  # (1,1,100), increasing
        valid = jnp.ones((1, 1, 100), dtype=bool)
        keep = exclude_top_n_percent(loss, valid, top_n_percent=10.0)
        # top 10 values (90..99) excluded
        assert int(keep.sum()) == 90
        assert bool(keep[0, 0, 89]) and not bool(keep[0, 0, 90])

    def test_exclude_respects_validity(self):
        loss = jnp.asarray(np.arange(10, dtype=np.float32)[None, None])
        valid = jnp.asarray([[[True] * 5 + [False] * 5]])
        keep = exclude_top_n_percent(loss, valid, top_n_percent=40.0)
        # 5 valid, exclude top 40% of 5 = 2 -> keep 3 lowest valid
        assert int(keep.sum()) == 3
        assert not bool(keep[0, 0, 7])  # invalid stays excluded

    def test_exclude_keep_all_flag(self):
        loss = jnp.asarray(np.arange(10, dtype=np.float32)[None, None])
        valid = jnp.ones((1, 1, 10), dtype=bool)
        keep = exclude_top_n_percent(
            loss, valid, 50.0, keep_all=jnp.asarray([True])
        )
        assert int(keep.sum()) == 10

    def test_bce_matches_definition(self):
        logits = jnp.asarray([-2.0, 0.0, 3.0])
        target = jnp.asarray([0.0, 1.0, 1.0])
        expected = -(
            target * jax.nn.log_sigmoid(logits)
            + (1 - target) * jax.nn.log_sigmoid(-logits)
        )
        np.testing.assert_allclose(
            np.asarray(bce_with_logits(logits, target)),
            np.asarray(expected),
            rtol=1e-6,
        )

    def test_robust_loss_matches_reference_formula(self, ref_geometry):
        import torch

        sys_path_loaded = True
        del sys_path_loaded
        from mapanything.train import losses as ref_losses

        crit = RobustRegressionLoss(alpha=0.5, scaling_c=0.05)
        ref_crit = ref_losses.RobustRegressionLoss(
            alpha=0.5, scaling_c=0.05, reduction="none"
        )
        rng = np.random.default_rng(0)
        a = rng.normal(size=(4, 3)).astype(np.float32)
        b = rng.normal(size=(4, 3)).astype(np.float32)
        ours = np.asarray(crit(jnp.asarray(a), jnp.asarray(b)))
        ref = ref_crit(torch.from_numpy(a), torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestNormalGM:
    @pytest.mark.slow
    def test_perfect_prediction_zero(self):
        from mapanything_tpu.train.losses import normal_gm_loss

        batch = make_synthetic_batch(1, 2, 16, 16, seed=8)
        gt = batch["gt"]
        pts = gt["pts3d_cam"]
        total, details = normal_gm_loss(
            pts, pts, gt["valid_mask"],
            is_synthetic=jnp.ones((1,), dtype=bool),
        )
        assert float(details["gm_loss"]) < 1e-6
        # normal term has a MIN_ANGLE clamp (1 deg) so it is small, not zero
        assert float(details["normal_loss"]) < 0.1

    def test_real_data_masked_out(self):
        from mapanything_tpu.train.losses import normal_gm_loss

        batch = make_synthetic_batch(1, 2, 16, 16, seed=8)
        gt = batch["gt"]
        pts = gt["pts3d_cam"]
        import functools
        total, _ = jax.jit(functools.partial(
            normal_gm_loss, apply_to_synthetic_only=True))(
            pts, pts * 1.5, gt["valid_mask"],
            is_synthetic=jnp.zeros((1,), dtype=bool),  # real data
        )
        assert float(total) == 0.0

    @pytest.mark.slow
    def test_overall_loss_includes_terms(self):
        batch = make_synthetic_batch(1, 2, 16, 16, seed=9)
        gt = dict(batch["gt"])
        gt["is_synthetic"] = jnp.ones((1,), dtype=bool)
        preds = perfect_preds(gt)
        preds = dict(preds)
        preds["pts3d_cam"] = preds["pts3d_cam"] * 1.2
        total, details = jax.jit(overall_loss)(gt, preds)
        normal_keys = [k for k in details if "_normal_" in k]
        gm_keys = [k for k in details if "_gradient_matching_" in k]
        assert normal_keys and gm_keys
        gm_avg = [k for k in gm_keys if k.endswith("_avg")]
        assert float(details[gm_avg[0]]) > 0
