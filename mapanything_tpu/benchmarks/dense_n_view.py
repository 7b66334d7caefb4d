"""Dense N-view benchmark (rebuild of benchmarking/dense_n_view/benchmark.py).

Protocol (reference :45-560 + SURVEY.md §3.4): for each multi-view set, put
GT and predictions in view0's frame, divide predictions by the predicted
metric scale, jointly avg-dis-normalize both, then report per set:
    pointmaps_abs_rel, pointmaps_inlier_thres_103,
    depth_abs_rel, depth_inlier_thres_103   (z-depth),
    pose_ate_rmse, pose_auc_5               (Horn-aligned ATE / rel-pose AUC),
    scale_abs_rel                           (metric norm factor ratio).

The normalization block runs jitted on device; metric scalars are computed
host-side in numpy on the reduced arrays.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import geometry as G
from ..utils import metrics as M


@jax.jit
def _normalize_for_metrics(gt: Dict[str, jnp.ndarray],
                           preds: Dict[str, jnp.ndarray]):
    """View0-frame + scale-removed + avg-dis-normalized quantities.

    Same math as the loss's get_all_info (train/losses.py) but returning the
    eval quantities: normalized pointmaps, z-depths, 4x4 poses, norm factors.
    """
    b, v = gt["pts3d"].shape[:2]

    # GT in view0 frame
    gt_q0, gt_t0 = gt["camera_pose_quats"][:, 0], gt["camera_pose_trans"][:, 0]
    inv_q0 = G.quaternion_inverse(gt_q0)
    r0_inv = G.quaternion_to_rotation_matrix(inv_q0)
    t0_inv = -jnp.einsum("bij,bj->bi", r0_inv, gt_t0, precision="highest")
    gt_pts_v0 = (
        jnp.einsum("bij,bvhwj->bvhwi", r0_inv, gt["pts3d"], precision="highest")
        + t0_inv[:, None, None, None, :]
    )
    gt_q, gt_t = G.transform_pose_using_quats_and_trans_2_to_1(
        jnp.broadcast_to(gt_q0[:, None], gt["camera_pose_quats"].shape),
        jnp.broadcast_to(gt_t0[:, None], gt["camera_pose_trans"].shape),
        gt["camera_pose_quats"], gt["camera_pose_trans"],
    )

    # predictions relative to predicted view0, scale divided out
    pr_q0, pr_t0 = preds["cam_quats"][:, 0], preds["cam_trans"][:, 0]
    pr_q, pr_t = G.transform_pose_using_quats_and_trans_2_to_1(
        jnp.broadcast_to(pr_q0[:, None], preds["cam_quats"].shape),
        jnp.broadcast_to(pr_t0[:, None], preds["cam_trans"].shape),
        preds["cam_quats"], preds["cam_trans"],
    )
    pr_rot0_inv = G.quaternion_to_rotation_matrix(G.quaternion_inverse(pr_q0))
    pr_t0_inv = -jnp.einsum("bij,bj->bi", pr_rot0_inv, pr_t0, precision="highest")
    pr_pts_v0 = (
        jnp.einsum("bij,bvhwj->bvhwi", pr_rot0_inv, preds["pts3d"],
                   precision="highest")
        + pr_t0_inv[:, None, None, None, :]
    )

    s = preds["metric_scaling_factor"][:, None, None, None, None]
    pr_pts_nos = pr_pts_v0 / s
    pr_pts_cam_nos = preds["pts3d_cam"] / s
    pr_t_nos = pr_t / preds["metric_scaling_factor"][:, None, None]

    valid = gt["valid_mask"]
    gt_pts_n, gt_f = G.normalize_multiple_pointclouds(gt_pts_v0, valid,
                                                      ret_factor=True)
    pr_pts_n, pr_f = G.normalize_multiple_pointclouds(pr_pts_nos, valid,
                                                      ret_factor=True)
    gt_cam_n = gt["pts3d_cam"] / gt_f
    pr_cam_n = pr_pts_cam_nos / pr_f
    gt_t_n = gt_t / gt_f[:, :, 0, 0, :]
    pr_t_n = pr_t_nos / pr_f[:, :, 0, 0, :]

    # metric scale factors: predicted metric pts = nos pts * s
    pr_metric_f = pr_f[:, 0, 0, 0, 0] * preds["metric_scaling_factor"]
    gt_metric_f = gt_f[:, 0, 0, 0, 0]

    gt_poses = G.pose_quats_trans_to_matrix(gt_q, gt_t_n)
    pr_poses = G.pose_quats_trans_to_matrix(pr_q, pr_t_n)
    return {
        "gt_pts": gt_pts_n, "pr_pts": pr_pts_n,
        "gt_depth_z": gt_cam_n[..., 2:], "pr_depth_z": pr_cam_n[..., 2:],
        "gt_poses": gt_poses, "pr_poses": pr_poses,
        "valid": valid,
        "gt_metric_f": gt_metric_f, "pr_metric_f": pr_metric_f,
    }


def compute_metrics_for_batch(gt, preds) -> List[Dict[str, float]]:
    """Per-sample (multi-view set) metric dicts for one batch."""
    q = _normalize_for_metrics(gt, preds)
    q = {k: np.asarray(v) for k, v in q.items()}
    b, v = q["valid"].shape[:2]
    out = []
    for i in range(b):
        valid = q["valid"][i].reshape(v, -1)
        gt_pts = q["gt_pts"][i].reshape(v, -1, 3)
        pr_pts = q["pr_pts"][i].reshape(v, -1, 3)
        gt_z = q["gt_depth_z"][i].reshape(v, -1, 1)
        pr_z = q["pr_depth_z"][i].reshape(v, -1, 1)

        pose_ate = M.evaluate_ate(list(q["gt_poses"][i]), list(q["pr_poses"][i]))
        r_err, t_err = M.se3_to_relative_pose_error(
            q["pr_poses"][i], q["gt_poses"][i], v
        )
        auc5, _ = M.calculate_auc_np(r_err, t_err, max_threshold=5)

        scale_abs_rel = float(
            np.abs(q["pr_metric_f"][i] - q["gt_metric_f"][i])
            / max(q["gt_metric_f"][i], 1e-8)
        )
        out.append(
            {
                "pointmaps_abs_rel": M.m_rel_ae(gt_pts, pr_pts, valid),
                "pointmaps_inlier_thres_103": M.thresh_inliers(
                    gt_pts, pr_pts, 1.03, valid
                ),
                "depth_abs_rel": M.m_rel_ae(gt_z, pr_z, valid),
                "depth_inlier_thres_103": M.thresh_inliers(gt_z, pr_z, 1.03, valid),
                "pose_ate_rmse": pose_ate,
                "pose_auc_5": auc5,
                "scale_abs_rel": scale_abs_rel,
            }
        )
    return out


def run_dense_n_view_benchmark(
    model,
    params,
    loader,
    geom_cfg,
    output_json: Optional[str] = None,
    memory_efficient: bool = False,
) -> Dict[str, float]:
    """Evaluate a model over a test loader; returns dataset-mean metrics and
    optionally writes the per-set JSON (reference output contract)."""
    # Host-side adapters (external torch models, models/adapters.py
    # VGGTAdapter) set jit_compatible=False — their forward runs outside
    # jit; device models get the jitted path.
    if getattr(model, "jit_compatible", True):
        fwd = jax.jit(
            lambda p, vw: model.apply(p, vw, geom_cfg,
                                      memory_efficient=memory_efficient)
        )
    else:
        def fwd(p, vw):
            return model.apply(p, vw, geom_cfg,
                               memory_efficient=memory_efficient)
    per_set: List[Dict[str, float]] = []
    loader.set_epoch(0)
    for batch in loader:
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        preds = fwd(params, jb["views"])
        per_set.extend(compute_metrics_for_batch(jb["gt"], preds))

    keys = per_set[0].keys() if per_set else []
    summary = {
        k: float(np.nanmean([s[k] for s in per_set])) for k in keys
    }
    summary["num_sets"] = len(per_set)
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump({"summary": summary, "per_set": per_set}, f, indent=1)
    return summary
