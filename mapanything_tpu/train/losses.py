"""Training losses (TPU-native rebuild of mapanything/train/losses.py).

Implements the released training recipe (configs/loss/overall_loss.yaml):

    ConfAndExcludeTopNPercentPixelLoss(
        FactoredGeometryScaleRegr3D*(RobustRegressionLoss(alpha=0.5, c=0.05),
            norm_mode='avg_dis', loss_in_log=True,
            flatten_across_image_only=True,
            compute_world_frame_points_loss=True),
        conf_alpha=0.2, top_n_percent=5, apply_to_real_data_only=True,
        conf_loss_set_indices=[0], exclude_loss_set_indices=[1, 2])
    + 0.3 * NonAmbiguousMaskLoss(BCELoss())

Redesign for XLA (vs losses.py:3117-3810):
  * views are stacked on axis 1 — every per-view Python loop becomes a
    batched op over (B, V, ...);
  * boolean-index gathers (`x[valid_mask]`) become masked reductions with
    identical means;
  * the exclude-top-N% per-image sort (losses.py:850-886) keeps a
    data-dependent *count* of pixels but static shapes: we sort each image's
    per-pixel loss once and derive a per-image threshold from the valid count.

Loss sets are ordered exactly as the reference (losses.py:3144-3148):
(0) world points, (1) cam points, (2) depth, (3) ray dirs, (4) pose quats,
(5) pose trans, (6) scale.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import (
    apply_log_to_norm,
    normalize_multiple_pointclouds,
    quaternion_inverse,
    quaternion_multiply,
    quaternion_to_rotation_matrix,
    transform_pose_using_quats_and_trans_2_to_1,
)

# ---------------------------------------------------------------------------
# Base criteria (losses.py:301-436) — pure distance functions (..., C) -> (...)
# ---------------------------------------------------------------------------


def l1_distance(a, b):
    return jnp.sum(jnp.abs(a - b), axis=-1)


def l2_distance(a, b):
    return jnp.linalg.norm(a - b, axis=-1)


@dataclasses.dataclass(frozen=True)
class RobustRegressionLoss:
    """Barron's general robust loss (arXiv:1701.03077); losses.py:408."""

    alpha: float = 0.5
    scaling_c: float = 0.25

    def __call__(self, a, b):
        error_scaled = jnp.sum(((a - b) / self.scaling_c) ** 2, axis=-1)
        am2 = abs(self.alpha - 2)
        return (am2 / self.alpha) * (
            jnp.power(error_scaled / am2 + 1.0, self.alpha / 2) - 1.0
        )


@dataclasses.dataclass(frozen=True)
class L1Loss:
    def __call__(self, a, b):
        return l1_distance(a, b)


@dataclasses.dataclass(frozen=True)
class L2Loss:
    def __call__(self, a, b):
        return l2_distance(a, b)


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCE-with-logits (losses.py:437)."""
    target = target.astype(logits.dtype)
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


# ---------------------------------------------------------------------------
# Factored geometry + scale regression
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FactoredGeometryConfig:
    norm_predictions: bool = True
    norm_mode: str = "avg_dis"
    loss_in_log: bool = True
    depth_type_for_loss: str = "depth_along_ray"
    compute_world_frame_points_loss: bool = True
    compute_pairwise_relative_pose_loss: bool = False
    weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


def factored_geometry_scale_regr3d(
    gt: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    criterion=RobustRegressionLoss(alpha=0.5, scaling_c=0.05),
    cfg: FactoredGeometryConfig = FactoredGeometryConfig(),
    return_normalized: bool = False,
):
    """Compute the ordered loss sets of FactoredGeometryScaleRegr3D
    (losses.py:3117; view0-frame normalization logic at :3198-3296).

    Args (all (B, V, ...)):
        gt: pts3d (world), pts3d_cam, ray_directions_cam, depth_along_ray,
            camera_pose_quats/trans (world), valid_mask (B,V,H,W),
            non_ambiguous_mask (B,V,H,W), is_metric_scale (B,),
        preds: model forward output dict.

    Returns:
        {name: {"loss": ..., "mask": ..., "type": "pixel"|"view"|"sample"}}
        in the reference set order.
    """
    b, v, h, w, _ = gt["pts3d"].shape
    eps = 1e-8

    # ---- GT in view0 frame (losses.py:3208-3280) -------------------------
    gt_q0 = gt["camera_pose_quats"][:, 0]
    gt_t0 = gt["camera_pose_trans"][:, 0]
    inv_q0 = quaternion_inverse(gt_q0)
    r0_inv = quaternion_to_rotation_matrix(inv_q0)  # (B, 3, 3)
    t0_inv = -jnp.einsum("bij,bj->bi", r0_inv, gt_t0, precision="highest")
    gt_pts_v0 = (
        jnp.einsum("bij,bvhwj->bvhwi", r0_inv, gt["pts3d"], precision="highest")
        + t0_inv[:, None, None, None, :]
    )
    gt_pose_quats, gt_pose_trans = transform_pose_using_quats_and_trans_2_to_1(
        gt_q0[:, None].repeat(v, 1), gt_t0[:, None].repeat(v, 1),
        gt["camera_pose_quats"], gt["camera_pose_trans"],
    )
    # view0 gets exact identity (losses.py:3252-3266)
    identity_q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    gt_pose_quats = gt_pose_quats.at[:, 0].set(identity_q)
    gt_pose_trans = gt_pose_trans.at[:, 0].set(0.0)

    valid = gt["valid_mask"]  # (B, V, H, W)

    if cfg.depth_type_for_loss == "depth_along_ray":
        gt_depth = gt["depth_along_ray"]
        pr_depth = preds["depth_along_ray"]
    else:
        gt_depth = gt["pts3d_cam"][..., 2:]
        pr_depth = preds["pts3d_cam"][..., 2:]

    # ---- predictions: divide out the metric scale (detached; :3310-3327) -
    s = preds["metric_scaling_factor"]  # (B,)
    s5 = s[:, None, None, None, None]
    pr_pts = preds["pts3d"] / s5
    pr_pts_cam = preds["pts3d_cam"] / s5
    pr_depth = pr_depth / s5
    pr_pose_trans = preds["cam_trans"] / s[:, None, None]
    pr_pose_quats = preds["cam_quats"]

    # ---- joint avg-dis normalization (losses.py:3368-3400) ----------------
    gt_pts_n, gt_factor = normalize_multiple_pointclouds(
        gt_pts_v0, valid, cfg.norm_mode, ret_factor=True
    )
    gt_pts_cam_n = gt["pts3d_cam"] / gt_factor
    gt_depth_n = gt_depth / gt_factor
    gt_pose_trans_n = gt_pose_trans / gt_factor[:, :, 0, 0, :]

    if cfg.norm_predictions:
        pr_pts_n, pr_factor = normalize_multiple_pointclouds(
            pr_pts, valid, cfg.norm_mode, ret_factor=True
        )
        pr_pts_cam_n = pr_pts_cam / pr_factor
        pr_depth_n = pr_depth / pr_factor
        pr_pose_trans_n = pr_pose_trans / pr_factor[:, :, 0, 0, :]
    else:
        pr_pts_n, pr_pts_cam_n = pr_pts, pr_pts_cam
        pr_depth_n, pr_pose_trans_n = pr_depth, pr_pose_trans

    # ---- metric-scale loss inputs (losses.py:3404-3427) -------------------
    # Norm factor of the *detached* scaled prediction == detached pr_factor*s.
    metric_scale_mask = gt["is_metric_scale"]  # (B,)
    valid_gt_factor = gt_factor[:, 0, 0, 0, 0] > eps
    scale_valid = metric_scale_mask & valid_gt_factor
    pr_metric_factor = jax.lax.stop_gradient(
        (pr_factor if cfg.norm_predictions else jnp.ones_like(gt_factor))
    )[:, 0, 0, 0, :] * s[:, None]
    gt_metric_factor = gt_factor[:, 0, 0, 0, :]

    # ---- per-pixel losses --------------------------------------------------
    if cfg.loss_in_log:
        gt_depth_l = apply_log_to_norm(gt_depth_n)
        pr_depth_l = apply_log_to_norm(pr_depth_n)
        gt_cam_l = apply_log_to_norm(gt_pts_cam_n)
        pr_cam_l = apply_log_to_norm(pr_pts_cam_n)
        gt_pts_l = apply_log_to_norm(gt_pts_n)
        pr_pts_l = apply_log_to_norm(pr_pts_n)
        gt_scale_l = apply_log_to_norm(gt_metric_factor)
        pr_scale_l = apply_log_to_norm(pr_metric_factor)
    else:
        gt_depth_l, pr_depth_l = gt_depth_n, pr_depth_n
        gt_cam_l, pr_cam_l = gt_pts_cam_n, pr_pts_cam_n
        gt_pts_l, pr_pts_l = gt_pts_n, pr_pts_n
        gt_scale_l, pr_scale_l = gt_metric_factor, pr_metric_factor

    w0, w1, w2, w3, w4, w5, w6 = cfg.weights

    def pixel(pred_x, gt_x):
        return criterion(pred_x, gt_x).reshape(b, v, h * w)

    losses = {}
    if cfg.compute_world_frame_points_loss:
        losses["pts3d"] = {
            "loss": pixel(pr_pts_l, gt_pts_l) * w0,
            "mask": valid.reshape(b, v, h * w),
            "type": "pixel",
        }
    losses["cam_pts3d"] = {
        "loss": pixel(pr_cam_l, gt_cam_l) * w1,
        "mask": valid.reshape(b, v, h * w),
        "type": "pixel",
    }
    losses[cfg.depth_type_for_loss] = {
        "loss": pixel(pr_depth_l, gt_depth_l) * w2,
        "mask": valid.reshape(b, v, h * w),
        "type": "pixel",
    }
    losses["ray_directions"] = {
        "loss": pixel(preds["ray_directions"], gt["ray_directions_cam"]) * w3,
        "mask": None,  # use_mask=False in the reference (losses.py:3775)
        "type": "pixel",
    }

    view_has_valid = valid.reshape(b, v, -1).sum(-1) > 0
    if cfg.compute_pairwise_relative_pose_loss:
        # Exhaustive pairwise relative poses (losses.py:3560-3650): for each
        # ordered pair (i, j), pose_j expressed in pose_i's frame, for both
        # prediction and GT; quats handle the double cover; trans masked by
        # both views having valid pixels.
        def pairwise(quats, trans):
            qi = jnp.broadcast_to(quats[:, :, None], (b, v, v, 4)).reshape(-1, 4)
            ti = jnp.broadcast_to(trans[:, :, None], (b, v, v, 3)).reshape(-1, 3)
            qj = jnp.broadcast_to(quats[:, None, :], (b, v, v, 4)).reshape(-1, 4)
            tj = jnp.broadcast_to(trans[:, None, :], (b, v, v, 3)).reshape(-1, 3)
            rq, rt = transform_pose_using_quats_and_trans_2_to_1(qi, ti, qj, tj)
            return rq.reshape(b, v, v, 4), rt.reshape(b, v, v, 3)

        pr_rq, pr_rt = pairwise(pr_pose_quats, pr_pose_trans_n)
        gt_rq, gt_rt = pairwise(gt_pose_quats, gt_pose_trans_n)
        off_diag = ~jnp.eye(v, dtype=bool)[None]  # (1, V, V)
        quats_loss = jnp.minimum(
            criterion(pr_rq, gt_rq), criterion(pr_rq, -gt_rq)
        )
        trans_loss = criterion(pr_rt, gt_rt)
        pair_valid = (
            view_has_valid[:, :, None] & view_has_valid[:, None, :] & off_diag
        )
        losses["pose_quats"] = {
            "loss": quats_loss * w4,
            "mask": jnp.broadcast_to(off_diag, (b, v, v)),
            "type": "view",
        }
        losses["pose_trans"] = {
            "loss": trans_loss * w5,
            "mask": pair_valid,
            "type": "view",
        }
    else:
        # per-view pose losses; quats handle the double cover (losses.py:3669)
        quats_loss = jnp.minimum(
            criterion(pr_pose_quats, gt_pose_quats),
            criterion(pr_pose_quats, -gt_pose_quats),
        )
        # trans masked by views that have any valid pixel (losses.py:3297)
        trans_loss = criterion(pr_pose_trans_n, gt_pose_trans_n)
        losses["pose_quats"] = {"loss": quats_loss * w4, "mask": None,
                                "type": "view"}
        losses["pose_trans"] = {
            "loss": trans_loss * w5,
            "mask": view_has_valid,
            "type": "view",
        }
    losses["scale"] = {
        "loss": criterion(pr_scale_l, gt_scale_l) * w6,
        "mask": scale_valid,
        "type": "sample",
    }
    if return_normalized:
        aux = {"pr_pts_cam_n": pr_pts_cam_n, "gt_pts_cam_n": gt_pts_cam_n}
        return losses, aux
    return losses


# ---------------------------------------------------------------------------
# Wrappers: confidence weighting + top-N% exclusion (losses.py:688,817,994)
# ---------------------------------------------------------------------------


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def exclude_top_n_percent(
    pixel_loss: jnp.ndarray,  # (B, V, HW)
    valid: jnp.ndarray,  # (B, V, HW) bool
    top_n_percent: float,
    keep_all: Optional[jnp.ndarray] = None,  # (B,) bool — e.g. synthetic data
) -> jnp.ndarray:
    """Per-image mask keeping the bottom (100-N)% of *valid* pixels.

    Static-shape rebuild of losses.py:850-886: instead of sorting a gathered
    variable-length vector, sort the full per-image loss (invalid pixels
    pushed to -inf) and read the threshold at the per-image dynamic rank.
    """
    hw = pixel_loss.shape[-1]
    neg_inf = jnp.asarray(-jnp.inf, pixel_loss.dtype)
    masked = jnp.where(valid, pixel_loss, neg_inf)
    sorted_loss = jnp.sort(masked, axis=-1)  # ascending; valid occupy the top
    n_valid = valid.sum(axis=-1)  # (B, V)
    n_excl = (n_valid * top_n_percent / 100.0).astype(jnp.int32)
    # threshold = largest kept value = sorted[hw - n_excl - 1]
    idx = jnp.clip(hw - n_excl - 1, 0, hw - 1)
    thresh = jnp.take_along_axis(sorted_loss, idx[..., None], axis=-1)
    keep = valid & (pixel_loss <= thresh)
    keep = keep | (n_excl[..., None] == 0) & valid
    if keep_all is not None:
        keep = jnp.where(keep_all[:, None, None], valid, keep)
    return keep


def _smooth(err: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Smooth-L1 shaping of angular errors (losses.py:101)."""
    if beta == 0:
        return err
    return jnp.where(err < beta, 0.5 * err * err / beta, err - 0.5 * beta)


def compute_normal_loss(points, gt_points, mask):
    """Quad-cross-product normal consistency (losses.py:108, MoGe-style).

    Args: points/gt_points (B, H, W, 3); mask (B, H, W) bool.
    Returns a scalar (summed over batch, normalized like the reference:
    / (valid_count * 4 * max(H, W)))."""
    import math

    from ..geometry import angle_diff_vec3

    h, w = points.shape[-3:-1]

    def quads(p):
        lu = p[..., :-1, :-1, :]
        ru = p[..., :-1, 1:, :]
        ld = p[..., 1:, :-1, :]
        rd = p[..., 1:, 1:, :]
        return (
            jnp.cross(ru - rd, ld - rd),
            jnp.cross(lu - ru, rd - ru),
            jnp.cross(ld - lu, ru - lu),
            jnp.cross(rd - ld, lu - ld),
        )

    pr = quads(points)
    gt = quads(gt_points)
    m_lu = mask[..., :-1, :-1]
    m_ru = mask[..., :-1, 1:]
    m_ld = mask[..., 1:, :-1]
    m_rd = mask[..., 1:, 1:]
    ms = (m_ru & m_ld & m_rd, m_lu & m_rd & m_ru,
          m_ld & m_ru & m_lu, m_rd & m_lu & m_ld)

    min_a, max_a, beta = math.radians(1), math.radians(90), math.radians(3)
    loss = 0.0
    for p, g, m in zip(pr, gt, ms):
        ang = jnp.clip(angle_diff_vec3(p, g), min_a, max_a)
        loss = loss + m * _smooth(ang, beta)
    total_valid = (ms[0] | ms[1] | ms[2] | ms[3]).sum()
    denom = jnp.maximum(total_valid * (4 * max(h, w)), 1)
    return jnp.sum(loss) / denom * jnp.where(total_valid > 0, 1.0, 0.0)


def compute_gradient_matching_loss(prediction, gt_target, mask, scales=4):
    """Multi-scale gradient matching on (B, H, W, C) maps (losses.py:243,
    MiDaS eq. 11)."""
    def one_scale(pred, gt, m):
        m = jnp.broadcast_to(m[..., None], pred.shape)
        diff = (pred - gt) * m
        gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (m[:, :, 1:] * m[:, :, :-1])
        gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (m[:, 1:, :] * m[:, :-1, :])
        gx = jnp.clip(gx, None, 100.0)
        gy = jnp.clip(gy, None, 100.0)
        total = jnp.sum(gx) + jnp.sum(gy)
        n_valid = jnp.sum(m)
        return jnp.where(n_valid > 0, total / jnp.maximum(n_valid, 1), 0.0)

    mask = mask.astype(prediction.dtype)
    total = 0.0
    for s in range(scales):
        step = 2 ** s
        total = total + one_scale(
            prediction[:, ::step, ::step], gt_target[:, ::step, ::step],
            mask[:, ::step, ::step],
        )
    return total


def normal_gm_loss(
    pr_pts_cam_n: jnp.ndarray,  # (B, V, H, W, 3) normalized cam points
    gt_pts_cam_n: jnp.ndarray,
    valid: jnp.ndarray,  # (B, V, H, W)
    is_synthetic: Optional[jnp.ndarray] = None,  # (B,)
    apply_to_synthetic_only: bool = True,
    normal_loss_weight: float = 3.0,
    gm_loss_weight: float = 3.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """FactoredGeometryScaleRegr3DPlusNormalGMLoss extra terms
    (losses.py:3810-3960): per-view normal consistency on normalized camera
    points + multi-scale gradient matching on log z-depth, synthetic data
    only in the released recipe."""
    b, v = valid.shape[:2]
    mask = valid
    if apply_to_synthetic_only:
        syn = (is_synthetic if is_synthetic is not None
               else jnp.zeros((b,), dtype=bool))
        mask = mask & syn[:, None, None, None]

    normal_total = 0.0
    gm_total = 0.0
    for i in range(v):  # per-view scalars, like the reference's view loop
        normal_total = normal_total + compute_normal_loss(
            pr_pts_cam_n[:, i], gt_pts_cam_n[:, i], mask[:, i]
        )
        pr_z = apply_log_to_norm(pr_pts_cam_n[:, i, ..., 2:])
        gt_z = apply_log_to_norm(gt_pts_cam_n[:, i, ..., 2:])
        gm_total = gm_total + compute_gradient_matching_loss(
            pr_z, gt_z, mask[:, i]
        )
    total = normal_loss_weight * normal_total + gm_loss_weight * gm_total
    return total, {
        "normal_loss": normal_loss_weight * normal_total,
        "gm_loss": gm_loss_weight * gm_total,
    }


def non_ambiguous_mask_loss(
    logits: jnp.ndarray,  # (B, V, H, W)
    gt_non_ambiguous: jnp.ndarray,  # (B, V, H, W) bool
) -> jnp.ndarray:
    """NonAmbiguousMaskLoss(BCELoss()) — losses.py:641,437."""
    return jnp.mean(bce_with_logits(logits, gt_non_ambiguous))


# ---------------------------------------------------------------------------
# The released overall training criterion
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OverallLossConfig:
    conf_alpha: float = 0.2
    top_n_percent: float = 5.0
    mask_loss_weight: float = 0.3
    criterion_alpha: float = 0.5
    criterion_scaling_c: float = 0.05
    # normal + gradient-matching auxiliary terms (released recipe: on, 3.0,
    # synthetic data only)
    use_normal_gm: bool = True
    normal_loss_weight: float = 3.0
    gm_loss_weight: float = 3.0
    factored: FactoredGeometryConfig = FactoredGeometryConfig()


def overall_loss(
    gt: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    cfg: OverallLossConfig = OverallLossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """configs/loss/overall_loss.yaml train_criterion + 2/n_views scaling
    (training.py:474-477), expressed through the composable criteria API
    (train/criteria.py) — golden-tested against the importable reference in
    tests/test_criteria.py."""
    from . import criteria as C  # deferred: criteria imports helpers above

    fc = cfg.factored
    w = fc.weights
    crit = C.RobustRegressionLoss(cfg.criterion_alpha, cfg.criterion_scaling_c)
    kw = dict(
        norm_predictions=fc.norm_predictions,
        norm_mode=fc.norm_mode,
        loss_in_log=fc.loss_in_log,
        flatten_across_image_only=True,
        depth_type_for_loss=fc.depth_type_for_loss,
        compute_world_frame_points_loss=fc.compute_world_frame_points_loss,
        compute_pairwise_relative_pose_loss=(
            fc.compute_pairwise_relative_pose_loss
        ),
        world_frame_points_loss_weight=w[0],
        cam_frame_points_loss_weight=w[1],
        depth_loss_weight=w[2],
        ray_directions_loss_weight=w[3],
        pose_quats_loss_weight=w[4],
        pose_trans_loss_weight=w[5],
        scale_loss_weight=w[6],
    )
    if cfg.use_normal_gm:
        pixel = C.FactoredGeometryScaleRegr3DPlusNormalGMLoss(
            crit,
            apply_normal_and_gm_loss_to_synthetic_data_only=True,
            normal_loss_weight=cfg.normal_loss_weight,
            gm_loss_weight=cfg.gm_loss_weight,
            **kw,
        )
    else:
        pixel = C.FactoredGeometryScaleRegr3D(crit, **kw)
    criterion = C.ConfAndExcludeTopNPercentPixelLoss(
        pixel,
        conf_alpha=cfg.conf_alpha,
        top_n_percent=cfg.top_n_percent,
        apply_to_real_data_only=True,
        conf_loss_set_indices=[0],
        exclude_loss_set_indices=[1, 2],
    ) + cfg.mask_loss_weight * C.NonAmbiguousMaskLoss(C.BCELoss())

    total, details = criterion(gt, preds)
    n_views = gt["pts3d"].shape[1]
    if n_views > 2:
        total = total * (2.0 / n_views)
    details["total"] = total
    return total, details
