"""Sequence-parallel (view-sharded) TRAINING: loss + train step.

`parallel.view_sharded_forward` lifts the inference view ceiling to the
mesh; this module does the same for training. The forward runs the ring
trunk (models/mapanything.py `trunk_seq_axis`, differentiable via
ops/ring_attention); the loss below reproduces the released training
criterion (`criteria.released_criterion` semantics, as wired by
`losses.overall_loss`) with the VIEW axis sharded over a mesh axis.

The criterion's reduction is per-VIEW means summed over views — which
makes sharding natural: every per-view reduce (confidence weighting,
top-N% exclusion, pose double-cover min-of-means, normal/GM, mask BCE) is
view-local, and the global total is a psum of local view sums. Only three
quantities actually cross views:

  * the GT reference pose (global view 0) — all-gathered from shard 0;
  * the joint avg-dis pointcloud normalization factors — masked distance
    sums reduce with psum;
  * the pairwise-relative-pose arm (off in the released recipe) — the
    per-view pose vectors are tiny, so they are all-gathered and the term
    computed replicated, counted once.

Parity with the unsharded `overall_loss` total is asserted in
tests/test_seq_parallel.py. This module deliberately does NOT touch
train/criteria.py (the golden-tested composable DSL): it is a parallel
implementation of the one released recipe, validated by equivalence.
Detail keys are aggregated per set (per-GLOBAL-view detail names cannot
be built inside shard_map, where the shard index is traced).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..geometry import (
    quaternion_inverse,
    quaternion_to_rotation_matrix,
    safe_norm,
    transform_pose_using_quats_and_trans_2_to_1,
)
from ..ops.collectives import all_gather_grad_correct, psum_grad_correct
from .criteria import _keep_bottom_n_mask, _masked_mean
from .losses import (
    OverallLossConfig,
    RobustRegressionLoss,
    apply_log_to_norm,
    bce_with_logits,
    compute_gradient_matching_loss,
    compute_normal_loss,
)


def _gather_views(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, V_local, ...) -> (B, V_global, ...) in global view order
    (transpose-correct gather: gradients flow back per slot, summed over
    every shard's consumption — collectives.py)."""
    g = all_gather_grad_correct(x, axis_name)  # (p, B, V_local, ...)
    g = jnp.moveaxis(g, 0, 1)  # (B, p, V_local, ...)
    return g.reshape(g.shape[0], -1, *g.shape[3:])


def _normalize_factor_psum(pts, valid, axis_name):
    """avg_dis joint normalization factor with the view axis sharded
    (geometry/norm.normalize_multiple_pointclouds, cross-shard psums)."""
    b = pts.shape[0]
    masked = pts * valid[..., None]
    dis = safe_norm(masked, axis=-1)  # (B, V_local, H, W)
    num = psum_grad_correct(jnp.sum((dis * valid).reshape(b, -1), axis=-1),
                            axis_name)
    nnz = jax.lax.psum(jnp.sum(valid.reshape(b, -1), axis=-1), axis_name)
    factor = jnp.clip(num / (nnz + 1e-8), 1e-8, None)
    return factor[:, None, None, None, None]


def view_sharded_overall_loss(
    gt: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    cfg: OverallLossConfig = OverallLossConfig(),
    axis_name: str = "model",
):
    """`losses.overall_loss` with gt/preds holding only the LOCAL view
    shard (call inside shard_map). Returns (total, details); both are
    replicated scalars identical on every shard."""
    fc = cfg.factored
    assert fc.norm_mode == "avg_dis", "released recipe uses avg_dis"
    assert fc.depth_type_for_loss == "depth_along_ray"
    # the conf/exclude set selection below is hard-coded by NAME for the
    # released set order; without the world-points set the flat indices
    # would re-target different sets (criteria.py:1110 _select_flat)
    assert fc.compute_world_frame_points_loss, (
        "view_sharded_overall_loss implements the released recipe's set "
        "selection (conf on pts3d, exclusion on cam_pts3d/depth); "
        "compute_world_frame_points_loss=False re-targets the wrappers — "
        "use the unsharded overall_loss or extend the selection here"
    )
    criterion = RobustRegressionLoss(cfg.criterion_alpha,
                                     cfg.criterion_scaling_c)
    b, v, h, w, _ = gt["pts3d"].shape
    ring = jax.lax.psum(1, axis_name)
    n_views_global = v * ring

    def log(x):
        return apply_log_to_norm(x) if fc.loss_in_log else x

    # ---- GT in GLOBAL view-0 frame ----------------------------------------
    q0 = _gather_views(gt["camera_pose_quats"][:, :1], axis_name)[:, 0]
    t0 = _gather_views(gt["camera_pose_trans"][:, :1], axis_name)[:, 0]
    inv_q0 = quaternion_inverse(q0)
    r0_inv = quaternion_to_rotation_matrix(inv_q0)
    t0_inv = -jnp.einsum("bij,bj->bi", r0_inv, t0, precision="highest")
    gt_pts_v0 = (
        jnp.einsum("bij,bvhwj->bvhwi", r0_inv, gt["pts3d"],
                   precision="highest")
        + t0_inv[:, None, None, None, :]
    )
    gt_pose_quats, gt_pose_trans = transform_pose_using_quats_and_trans_2_to_1(
        q0[:, None].repeat(v, 1), t0[:, None].repeat(v, 1),
        gt["camera_pose_quats"], gt["camera_pose_trans"],
    )
    # the GLOBAL view 0 (first view of shard 0) gets exact identity
    shard = jax.lax.axis_index(axis_name)
    is_global_v0 = (shard * v + jnp.arange(v)) == 0  # (V_local,)
    identity_q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    gt_pose_quats = jnp.where(is_global_v0[None, :, None], identity_q,
                              gt_pose_quats)
    gt_pose_trans = jnp.where(is_global_v0[None, :, None], 0.0,
                              gt_pose_trans)

    valid = gt["valid_mask"]
    gt_depth = gt["depth_along_ray"]

    # ---- predictions: divide out the metric scale (criteria._unscale_preds)
    s = preds["metric_scaling_factor"]
    s5 = s[:, None, None, None, None]
    pr_pts = preds["pts3d"] / s5
    pr_pts_cam = preds["pts3d_cam"] / s5
    pr_depth = preds["depth_along_ray"] / s5
    pr_pose_trans = preds["cam_trans"] / s[:, None, None]
    pr_pose_quats = preds["cam_quats"]

    # ---- joint avg-dis normalization (cross-shard psums) -------------------
    gt_factor = _normalize_factor_psum(gt_pts_v0, valid, axis_name)
    gt_pts_n = gt_pts_v0 / gt_factor
    gt_pts_cam_n = gt["pts3d_cam"] / gt_factor
    gt_depth_n = gt_depth / gt_factor
    gt_pose_trans_n = gt_pose_trans / gt_factor[:, :, 0, 0]

    pr_factor = _normalize_factor_psum(pr_pts, valid, axis_name)
    if fc.norm_predictions:
        pr_pts_n = pr_pts / pr_factor
        pr_pts_cam_n = pr_pts_cam / pr_factor
        pr_depth_n = pr_depth / pr_factor
        pr_pose_trans_n = pr_pose_trans / pr_factor[:, :, 0, 0]
    else:
        pr_pts_n, pr_pts_cam_n = pr_pts, pr_pts_cam
        pr_depth_n, pr_pose_trans_n = pr_depth, pr_pose_trans

    # ---- metric-scale set inputs (replicated (B,) quantities) --------------
    scale_valid = gt["is_metric_scale"] & (gt_factor[:, 0, 0, 0, 0] > 1e-8)
    pr_metric_factor = (jax.lax.stop_gradient(pr_factor)[:, 0, 0, 0, :]
                        * s[:, None])
    gt_metric_factor = gt_factor[:, 0, 0, 0, :]

    w0, w1, w2, w3, w4, w5, w6 = fc.weights
    mask_f = valid.reshape(b, v, h * w)
    is_syn = gt.get("is_synthetic")
    if is_syn is None:
        is_syn = jnp.zeros((b,), dtype=bool)

    details: Dict[str, jnp.ndarray] = {}

    def viewsum(per_view_vals, name):
        """Sum of per-view reduced scalars over LOCAL views, recorded."""
        val = sum(per_view_vals)
        details[f"{name}_viewsum_local"] = val
        return val

    local = 0.0

    # set 0 (conf-weighted): world pts3d
    conf_flat = preds["conf"].reshape(b, v, -1)
    log_conf = jnp.log(conf_flat)
    if fc.compute_world_frame_points_loss:
        loss0 = (criterion(log(pr_pts_n), log(gt_pts_n)) * w0
                 ).reshape(b, v, h * w)
        vals = []
        for i in range(v):
            cl = loss0[:, i] * conf_flat[:, i] - cfg.conf_alpha * log_conf[:, i]
            vals.append(_masked_mean(cl, mask_f[:, i]))
        local = local + viewsum(vals, "pts3d_conf")

    # sets 1-2 (top-N% excluded): cam points + depth
    def excluded(loss_bvn, name):
        vals = []
        for i in range(v):
            keep = _keep_bottom_n_mask(loss_bvn[:, i], mask_f[:, i],
                                       100.0 - cfg.top_n_percent)
            keep = jnp.where(is_syn[:, None], mask_f[:, i], keep)
            vals.append(_masked_mean(loss_bvn[:, i], keep))
        return viewsum(vals, name)

    loss1 = (criterion(log(pr_pts_cam_n), log(gt_pts_cam_n)) * w1
             ).reshape(b, v, h * w)
    local = local + excluded(loss1, "cam_pts3d")
    loss2 = (criterion(log(pr_depth_n), log(gt_depth_n)) * w2
             ).reshape(b, v, h * w)
    local = local + excluded(loss2, "depth_along_ray")

    # ray directions: plain per-view means (no mask)
    loss3 = (criterion(preds["ray_directions"], gt["ray_directions_cam"])
             * w3).reshape(b, v, h * w)
    local = local + viewsum([jnp.mean(loss3[:, i]) for i in range(v)],
                            "ray_directions")

    view_has_valid = valid.reshape(b, v, -1).sum(-1) > 0
    replicated = 0.0
    if fc.compute_pairwise_relative_pose_loss:
        # pairwise over the GLOBAL view set: tiny per-view vectors, gather
        # and compute replicated (counted once, outside the psum)
        pq_g = _gather_views(pr_pose_quats, axis_name)
        pt_g = _gather_views(pr_pose_trans_n, axis_name)
        gq_g = _gather_views(gt_pose_quats, axis_name)
        gt_g = _gather_views(gt_pose_trans_n, axis_name)
        hv_g = _gather_views(view_has_valid[..., None], axis_name)[..., 0]
        vg = n_views_global

        def pairwise(quats, trans):
            qi = jnp.broadcast_to(quats[:, :, None], (b, vg, vg, 4))
            ti = jnp.broadcast_to(trans[:, :, None], (b, vg, vg, 3))
            qj = jnp.broadcast_to(quats[:, None, :], (b, vg, vg, 4))
            tj = jnp.broadcast_to(trans[:, None, :], (b, vg, vg, 3))
            rq, rt = transform_pose_using_quats_and_trans_2_to_1(
                qi.reshape(-1, 4), ti.reshape(-1, 3),
                qj.reshape(-1, 4), tj.reshape(-1, 3),
            )
            return rq.reshape(b, vg, vg, 4), rt.reshape(b, vg, vg, 3)

        pr_rq, pr_rt = pairwise(pq_g, pt_g)
        gt_rq, gt_rt = pairwise(gq_g, gt_g)
        off_diag = ~jnp.eye(vg, dtype=bool)[None]
        # the wrapper's _reduce_rest path reduces the ELEMENTWISE
        # double-cover min (the min-of-means variant only applies to the
        # bare reduce_terms path the released recipe never takes)
        quats_loss = jnp.minimum(criterion(pr_rq, gt_rq),
                                 criterion(pr_rq, -gt_rq)) * w4
        trans_loss = criterion(pr_rt, gt_rt) * w5
        pair_valid = (hv_g[:, :, None] & hv_g[:, None, :]) & off_diag
        od = jnp.broadcast_to(off_diag, (b, vg, vg))
        quats_total = sum(
            _masked_mean(quats_loss[:, i], od[:, i]) for i in range(vg)
        )
        trans_total = sum(
            _masked_mean(trans_loss[:, i], pair_valid[:, i])
            for i in range(vg)
        )
        details["pose_quats_sum"] = quats_total
        details["pose_trans_sum"] = trans_total
        replicated = replicated + quats_total + trans_total
    else:
        # per-view pose terms: ELEMENTWISE double-cover min, then mean
        # (the wrapper's _reduce_rest path; min-of-means only applies to
        # the bare reduce_terms path the released recipe never takes)
        quats_loss = jnp.minimum(
            criterion(pr_pose_quats, gt_pose_quats),
            criterion(pr_pose_quats, -gt_pose_quats),
        ) * w4
        trans_loss = criterion(pr_pose_trans_n, gt_pose_trans_n) * w5
        local = local + viewsum(
            [jnp.mean(quats_loss[:, i]) for i in range(v)],
            "pose_quats",
        )
        local = local + viewsum(
            [_masked_mean(trans_loss[:, i], view_has_valid[:, i])
             for i in range(v)],
            "pose_trans",
        )

    # metric-scale set: one SAMPLE term, replicated quantities
    scale_loss = criterion(log(pr_metric_factor), log(gt_metric_factor)) * w6
    scale_val = _masked_mean(scale_loss, scale_valid)
    details["scale_loss"] = scale_val
    replicated = replicated + scale_val

    # ---- normal + GM (per-view scalar terms, synthetic-only) ---------------
    if cfg.use_normal_gm:
        ngm_mask = valid & is_syn[:, None, None, None]
        n_vals, g_vals = [], []
        for i in range(v):
            n_vals.append(compute_normal_loss(
                pr_pts_cam_n[:, i], gt_pts_cam_n[:, i], ngm_mask[:, i]
            ) * cfg.normal_loss_weight)
            pr_z = apply_log_to_norm(pr_pts_cam_n[:, i, ..., 2:])
            gt_z = apply_log_to_norm(gt_pts_cam_n[:, i, ..., 2:])
            g_vals.append(compute_gradient_matching_loss(
                pr_z, gt_z, ngm_mask[:, i]
            ) * cfg.gm_loss_weight)
        local = local + viewsum(n_vals, "normal")
        local = local + viewsum(g_vals, "gradient_matching")

    # ---- non-ambiguous mask BCE: one mean per view, summed, weighted ------
    bce_vals = [
        jnp.mean(bce_with_logits(preds["non_ambiguous_mask_logits"][:, i],
                                 gt["non_ambiguous_mask"][:, i]))
        for i in range(v)
    ]
    local = local + cfg.mask_loss_weight * viewsum(bce_vals, "mask_bce")

    # The SHARE decomposition: total = sum_shards(share). Replicated
    # terms (scale set, pairwise pose) are identical on every shard, so
    # they enter each share at 1/ring weight. The caller differentiates
    # the share and psums the parameter gradients explicitly
    # (make_view_sharded_train_step) — together with the transpose-correct
    # collectives above this reproduces the unsharded gradients exactly.
    share = local + replicated / ring
    if n_views_global > 2:
        share = share * (2.0 / n_views_global)
    total = jax.lax.psum(jax.lax.stop_gradient(share), axis_name)
    details = {k: jax.lax.psum(val, axis_name) if "viewsum_local" in k
               else val for k, val in details.items()}
    details["total"] = total
    return total, dict(details, _share=share)


def make_view_sharded_train_step(
    model,
    geom_cfg,
    loss_cfg: OverallLossConfig = OverallLossConfig(),
    mesh=None,
    seq_axis: str = "model",
) -> Callable:
    """Train step with the VIEW axis sharded over `mesh[seq_axis]`.

    The returned (jittable) step(state, batch, rng) matches
    `make_train_step` semantics; params stay replicated, views/gt shard
    over `seq_axis`, per-shard parameter cotangents are psummed. Per-device
    activation AND gradient memory scale O(V/p), so view counts beyond one
    chip's HBM can TRAIN.

    Restrictions: alternating trunk. Stochastic geom knobs work: (B, 1)
    per-sample draws replicate identically (same fold), while per-(sample,
    view) draws fold the shard index inside the model (mapanything.py) so
    view shards draw independently.
    """
    import dataclasses

    import optax
    from jax.sharding import PartitionSpec as P

    ring_cfg = dataclasses.replace(model.cfg, trunk_seq_axis=seq_axis)
    ring_model = type(model)(cfg=ring_cfg)

    def local_loss(params, batch, rng):
        preds = ring_model.apply(params, batch["views"], geom_cfg, rng=rng)
        total, details = view_sharded_overall_loss(
            batch["gt"], preds, loss_cfg, axis_name=seq_axis)
        share = details.pop("_share")
        return share, (total, details)

    def local_grads(params, batch, rng):
        (_, (loss, details)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, batch, rng)
        # total = sum_shards(share): the true gradient is the psum of each
        # shard's d(share)/d(params)
        grads = jax.lax.psum(grads, seq_axis)
        return loss, details, grads

    def _shard_specs(tree):
        return jax.tree_util.tree_map(
            lambda x: P(None, seq_axis) if jnp.ndim(x) >= 2 else P(), tree
        )

    def step(state, batch, rng):
        from ..ops.collectives import shard_map_compat

        batch_specs = {"views": _shard_specs(batch["views"]),
                       "gt": _shard_specs(batch["gt"])}
        # check_vma stays OFF (pallas calls inside require it); gradient
        # correctness is guaranteed structurally instead: the loss is a
        # per-shard SHARE, collectives on differentiated quantities use
        # the transpose-correct wrappers (ops/collectives.py), and the
        # parameter gradients are explicitly psummed above.
        fn = shard_map_compat(
            local_grads,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P(), P()),
        )
        loss, details, grads = fn(state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, **details}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step
