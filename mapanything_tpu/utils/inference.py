"""User-facing inference pipeline: validation, preprocessing, postprocessing.

Rebuild of mapanything/utils/inference.py (validate:128, preprocess:202,
postprocess:294) plus the reference's MapAnything.infer() driver
(model.py:1963-2112), restructured for TPU:

  * The user API stays list-of-view-dicts; `stack_views` converts to the
    batched (B, V, ...) pytree at the host boundary, and `unstack_views`
    converts back.
  * ALL postprocessing — denormalization, depth_z, intrinsics recovery, pose
    matrices, confidence-percentile mask, depth/normal edge masks — runs
    inside one jitted on-device function. The reference does the mask stage
    in per-image host numpy loops (inference.py:386-454, a primary
    TPU-migration target per SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as G
from ..models import GeometricInputConfig, MapAnything
from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

ALLOWED_VIEW_KEYS = {
    "img",
    "data_norm_type",
    "depth_z",
    "ray_directions",
    "intrinsics",
    "camera_poses",
    "is_metric_scale",
    "true_shape",
    "idx",
    "instance",
}

REQUIRED_KEYS = {"img", "data_norm_type"}

CONFLICTING_KEYS = [("intrinsics", "ray_directions")]

_META_KEYS = ("data_norm_type", "true_shape", "idx", "instance")


def validate_input_views_for_inference(
    views: List[Dict[str, Any]],
) -> List[Dict[str, Any]]:
    """Strict input validation (reference inference.py:128-199)."""
    if not isinstance(views, list) or len(views) == 0:
        raise ValueError("views must be a non-empty list of dicts")

    any_pose = any("camera_poses" in v for v in views)
    for i, view in enumerate(views):
        if not isinstance(view, dict):
            raise ValueError(f"view {i} must be a dict")
        unknown = set(view.keys()) - ALLOWED_VIEW_KEYS
        if unknown:
            raise ValueError(
                f"view {i}: unknown keys {sorted(unknown)}; "
                f"allowed: {sorted(ALLOWED_VIEW_KEYS)}"
            )
        missing = REQUIRED_KEYS - set(view.keys())
        if missing:
            raise ValueError(f"view {i}: missing required keys {sorted(missing)}")
        for a, b in CONFLICTING_KEYS:
            if a in view and b in view:
                raise ValueError(
                    f"view {i}: cannot provide both '{a}' and '{b}'"
                )
        if "depth_z" in view and not ("intrinsics" in view or "ray_directions" in view):
            raise ValueError(
                f"view {i}: depth_z requires intrinsics or ray_directions"
            )
    if any_pose and "camera_poses" not in views[0]:
        raise ValueError(
            "if any view has camera_poses, view 0 must also have camera_poses"
        )
    return views


def preprocess_input_views_for_inference(
    views: List[Dict[str, Any]],
) -> List[Dict[str, Any]]:
    """Canonicalize optional inputs (reference inference.py:202-293):
    intrinsics -> unit rays, depth_z -> depth_along_ray, poses -> quats+trans,
    default is_metric_scale=True."""
    processed = []
    for i, view in enumerate(views):
        out = dict(view)
        img = jnp.asarray(view["img"])
        bsz = img.shape[0]
        if img.shape[1] == 3 and img.shape[-1] != 3:  # NCHW (reference layout)
            h, w = img.shape[-2], img.shape[-1]
        else:  # NHWC (our native layout)
            h, w = img.shape[-3], img.shape[-2]

        if "intrinsics" in view:
            _, rays = G.get_rays_in_camera_frame(
                jnp.asarray(view["intrinsics"], jnp.float32), h, w,
                normalize_to_unit_sphere=True,
            )
            out["ray_directions"] = rays
            del out["intrinsics"]
        elif "ray_directions" in view:
            rays = jnp.asarray(view["ray_directions"], jnp.float32)
            out["ray_directions"] = rays / (
                jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-8
            )

        if "depth_z" in view:
            out["depth_along_ray"] = G.depth_along_ray_from_z_depth_and_rays(
                jnp.asarray(view["depth_z"], jnp.float32), out["ray_directions"]
            )
            del out["depth_z"]

        if "camera_poses" in view:
            poses = view["camera_poses"]
            if isinstance(poses, tuple) and len(poses) == 2:
                quats, trans = (jnp.asarray(p, jnp.float32) for p in poses)
            else:
                poses = jnp.asarray(poses, jnp.float32)
                if poses.shape[-2:] != (4, 4):
                    raise ValueError(
                        f"view {i}: camera_poses must be (quats, trans) or (B,4,4)"
                    )
                quats = G.rotation_matrix_to_quaternion(poses[:, :3, :3])
                trans = poses[:, :3, 3]
            out["camera_pose_quats"] = quats
            out["camera_pose_trans"] = trans
            del out["camera_poses"]

        if "is_metric_scale" not in out:
            out["is_metric_scale"] = jnp.ones((bsz,), dtype=bool)
        else:
            ims = out["is_metric_scale"]
            if isinstance(ims, bool):
                ims = jnp.full((bsz,), ims)
            out["is_metric_scale"] = jnp.asarray(ims, dtype=bool)

        if "ray_directions" in out:
            out["ray_directions_cam"] = out.pop("ray_directions")
        processed.append(out)
    return processed


def stack_views(views: List[Dict[str, Any]]) -> Dict[str, jnp.ndarray]:
    """List of per-view dicts (each (B, ...)) -> batched (B, V, ...) pytree.

    Views missing an optional field get zero-filled entries with a False
    validity mask (the TPU-native replacement for the reference's ragged
    per-view presence checks)."""
    num_views = len(views)
    batched: Dict[str, jnp.ndarray] = {}

    imgs = jnp.stack([jnp.asarray(v["img"], jnp.float32) for v in views], axis=1)
    if imgs.shape[-1] != 3:  # accept NCHW input, convert to NHWC
        imgs = jnp.moveaxis(imgs, -3, -1)
    batched["img"] = imgs
    b, _, h, w, _ = imgs.shape

    def gather(key, shape, mask_key):
        present = [key in v for v in views]
        if not any(present):
            return
        vals, valid = [], []
        for v in views:
            if key in v:
                vals.append(jnp.asarray(v[key], jnp.float32))
                valid.append(jnp.ones((vals[-1].shape[0],), dtype=bool))
            else:
                vals.append(jnp.zeros((b,) + shape, jnp.float32))
                valid.append(jnp.zeros((b,), dtype=bool))
        batched[key] = jnp.stack(vals, axis=1)
        batched[mask_key] = jnp.stack(valid, axis=1)

    gather("ray_directions_cam", (h, w, 3), "ray_dirs_valid")
    gather("depth_along_ray", (h, w, 1), "depth_valid")
    gather("camera_pose_quats", (4,), "pose_valid")
    if "camera_pose_quats" in batched:
        vals = [
            jnp.asarray(v["camera_pose_trans"], jnp.float32)
            if "camera_pose_trans" in v
            else jnp.zeros((b, 3), jnp.float32)
            for v in views
        ]
        batched["camera_pose_trans"] = jnp.stack(vals, axis=1)
        # identity quats where pose absent (matches model.py:712-718)
        identity = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        batched["camera_pose_quats"] = jnp.where(
            batched["pose_valid"][..., None],
            batched["camera_pose_quats"],
            identity,
        )

    if any("is_metric_scale" in v for v in views):
        batched["is_metric_scale"] = jnp.stack(
            [
                jnp.asarray(
                    v.get("is_metric_scale", jnp.ones((b,), dtype=bool)),
                    dtype=bool,
                ).reshape(b)
                for v in views
            ],
            axis=1,
        )
    return batched


def unstack_views(batched: Dict[str, jnp.ndarray], num_views: int) -> List[Dict[str, jnp.ndarray]]:
    """Batched (B, V, ...) outputs -> per-view list of dicts (reference
    output contract, model.py:2040-2041)."""
    return [
        {k: v[:, i] if v.ndim > 1 and v.shape[1] == num_views else v
         for k, v in batched.items()}
        for i in range(num_views)
    ]


# ---------------------------------------------------------------------------
# On-device postprocess
# ---------------------------------------------------------------------------


def _largest_divisor_leq(n: int, target: int) -> int:
    for c in range(min(n, target), 0, -1):
        if n % c == 0:
            return c
    return 1


def postprocess_outputs(
    preds: Dict[str, jnp.ndarray],
    imgs: jnp.ndarray,
    data_norm_type: str = "dinov2",
    apply_mask: bool = True,
    mask_edges: bool = True,
    edge_normal_threshold: float = 5.0,
    edge_depth_threshold: float = 0.03,
    apply_confidence_mask: bool = False,
    confidence_percentile: float = 10.0,
    view_chunk: "int | None" = None,
) -> Dict[str, jnp.ndarray]:
    """Derived fields + combined masking, fully on device.

    Matches reference inference.py:294-481 semantics; the per-image host numpy
    loops (quantile, points_to_normals, depth/normals edges) become batched
    jnp (geometry/edges.py).

    Every step is per-view separable (the confidence quantile is over each
    view's own pixels), so ``view_chunk`` processes the view axis in chunks
    under ``lax.map``: the fp32 intermediates (normals, edge maps, quantile
    bisection workspace) then exist only at chunk width, which is what lets
    100+-view scenes postprocess on a 16 GB chip. Semantics are identical
    to the unchunked path; chunk size rounds down to a divisor of V."""
    if view_chunk is not None:
        v = imgs.shape[1]
        c = _largest_divisor_leq(v, view_chunk)
        if c < v:
            kw = dict(
                data_norm_type=data_norm_type, apply_mask=apply_mask,
                mask_edges=mask_edges,
                edge_normal_threshold=edge_normal_threshold,
                edge_depth_threshold=edge_depth_threshold,
                apply_confidence_mask=apply_confidence_mask,
                confidence_percentile=confidence_percentile,
            )
            per_view = {k: a for k, a in preds.items()
                        if hasattr(a, "ndim") and a.ndim >= 2
                        and a.shape[:2] == (imgs.shape[0], v)}
            rest = {k: a for k, a in preds.items() if k not in per_view}

            def body(i):
                sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                    x, i * c, c, axis=1)
                return postprocess_outputs(
                    jax.tree.map(sl, per_view), sl(imgs), **kw)

            out = jax.lax.map(body, jnp.arange(v // c))

            def unseg(x):  # (nc, B, c, ...) -> (B, V, ...)
                x = jnp.moveaxis(x, 0, 1)
                return x.reshape(x.shape[0], v, *x.shape[3:])

            return {**rest, **jax.tree.map(unseg, out)}

    out = dict(preds)

    mean, std = IMAGE_NORMALIZATION_DICT[data_norm_type]
    out["img_no_norm"] = imgs * jnp.asarray(std, imgs.dtype) + jnp.asarray(
        mean, imgs.dtype
    )

    if "pts3d_cam" in out:
        out["depth_z"] = out["pts3d_cam"][..., 2:3]

    if "ray_directions" in out:
        out["intrinsics"] = G.recover_pinhole_intrinsics_from_ray_directions(
            out["ray_directions"]
        )

    if "cam_trans" in out and "cam_quats" in out:
        out["camera_poses"] = G.pose_quats_trans_to_matrix(
            out["cam_quats"], out["cam_trans"]
        )

    if apply_mask and "non_ambiguous_mask" in out:
        final_mask = out["non_ambiguous_mask"]  # (B, V, H, W) bool

        if apply_confidence_mask and "conf" in out:
            from ..ops.quantile import quantile_threshold

            conf = out["conf"]
            b, v = conf.shape[:2]
            flat = conf.reshape(b, v, -1)
            # bisection threshold instead of jnp.quantile: the sort-based
            # quantile alone costs ~17s of XLA compile at 518^2
            thresh = quantile_threshold(
                flat, confidence_percentile / 100.0, axis=-1
            )[..., None, None]
            final_mask = final_mask & (conf > thresh)

        if mask_edges and "pts3d" in out:
            # fused plane-wise points->normals->edges (geometry/edges.py:
            # points_normal_edges) — ~6x faster than the channel-last
            # composition at 518^2 on TPU (the 3-wide channel axis would
            # otherwise sit in the 128-lane minor dim for every pass)
            normal_edges = G.points_normal_edges(
                out["pts3d"], tol=edge_normal_threshold, mask=final_mask
            )
            depth_edges = G.depth_edge(
                out["depth_z"][..., 0], rtol=edge_depth_threshold, mask=final_mask
            )
            final_mask = final_mask & ~(depth_edges & normal_edges)

        m = final_mask[..., None].astype(out["pts3d"].dtype)
        for key in ("pts3d", "pts3d_cam", "depth_along_ray", "depth_z"):
            if key in out:
                out[key] = out[key] * m
        out["mask"] = final_mask[..., None]

    return out


# ---------------------------------------------------------------------------
# End-to-end pipeline
# ---------------------------------------------------------------------------


class InferencePipeline:
    """Holds (model, params) and provides the reference's `.infer()` API.

    The forward + postprocess is one jitted function per static configuration
    (shape bucket, flag set); repeated calls at the same resolution/view count
    hit the compile cache.
    """

    def __init__(self, model: MapAnything, params,
                 view_shard_mesh=None, seq_axis: str = "model"):
        """Args:
            view_shard_mesh: optional jax Mesh — forwards run view-sharded
                over `seq_axis` (sequence-parallel ring attention,
                parallel/inference.py), lifting the view ceiling to the
                whole mesh. The view count must be a multiple of the axis size.
        """
        self.model = model
        self.params = params
        self.view_shard_mesh = view_shard_mesh
        self.seq_axis = seq_axis
        self._jitted = {}

    def infer(
        self,
        views: List[Dict[str, Any]],
        memory_efficient_inference: "bool | str" = "auto",
        apply_mask: bool = True,
        mask_edges: bool = True,
        edge_normal_threshold: float = 5.0,
        edge_depth_threshold: float = 0.03,
        apply_confidence_mask: bool = False,
        confidence_percentile: float = 10.0,
        ignore_calibration_inputs: bool = False,
        ignore_depth_inputs: bool = False,
        ignore_pose_inputs: bool = False,
        ignore_depth_scale_inputs: bool = False,
        ignore_pose_scale_inputs: bool = False,
        data_norm_type: str = "dinov2",
        task: Optional[str] = None,
    ) -> List[Dict[str, jnp.ndarray]]:
        """Reference-compatible inference entry point (model.py:1963).

        ``task`` selects a named preset from ``configs/model/task/*.yaml``
        (e.g. ``"mvs"``, ``"registration_sparse"``); its per-modality
        probabilities are intersected with the modalities actually present in
        ``views``, replacing the availability-derived config. Stochastic
        (training-mix) presets are rejected here — inference needs 0/1
        probabilities so every mask branch folds at trace time.
        """
        views = validate_input_views_for_inference(views)
        views = preprocess_input_views_for_inference(views)
        batched = stack_views(views)
        num_views = len(views)

        has_ray = "ray_directions_cam" in batched and not ignore_calibration_inputs
        has_depth = "depth_along_ray" in batched and not ignore_depth_inputs
        has_pose = "camera_pose_quats" in batched and not ignore_pose_inputs
        if task is not None:
            from ..models import task_config
            preset = task_config(task)
            geom_cfg = dataclasses.replace(
                preset,
                ray_dirs_prob=preset.ray_dirs_prob if has_ray else 0.0,
                depth_prob=preset.depth_prob if has_depth else 0.0,
                cam_prob=preset.cam_prob if has_pose else 0.0,
                sparse_depth_prob=preset.sparse_depth_prob if has_depth else 0.0,
            )
            if not geom_cfg.deterministic():
                raise ValueError(
                    f"task preset {task!r} is a stochastic training mix; "
                    "inference requires 0/1 probabilities — use it with the "
                    "training loop instead"
                )
        else:
            geom_cfg = GeometricInputConfig(
                overall_prob=1.0 if (has_ray or has_depth or has_pose) else 0.0,
                dropout_prob=0.0 if (has_ray or has_depth or has_pose) else 1.0,
                ray_dirs_prob=1.0 if has_ray else 0.0,
                depth_prob=1.0 if has_depth else 0.0,
                cam_prob=1.0 if has_pose else 0.0,
                sparse_depth_prob=0.0,
                depth_scale_norm_all_prob=(
                    1.0 if ignore_depth_scale_inputs else 0.0),
                pose_scale_norm_all_prob=(
                    1.0 if ignore_pose_scale_inputs else 0.0),
            )

        # Resolve "auto" memory-efficiency to concrete chunking knobs for
        # THIS shape (models.resolve_memory_policy): small view counts run
        # the fully-dense program, large ones get exactly the chunking HBM
        # requires — the trace-time analogue of the reference's adaptive
        # free-memory minibatching (model.py:1263-1438).
        bsz, nv, ih, iw = batched["img"].shape[:4]
        if memory_efficient_inference == "auto":
            from ..models.mapanything import resolve_memory_policy

            pol = resolve_memory_policy(self.model.cfg, bsz, nv, ih, iw)
            mem_eff = pol.memory_efficient
            post_chunk = pol.post_view_chunk
            run_model = (self.model if pol.cfg == self.model.cfg
                         else type(self.model)(cfg=pol.cfg))
        else:
            mem_eff = bool(memory_efficient_inference)
            post_chunk = 8 if mem_eff else None
            run_model = self.model

        flags = (
            geom_cfg, mem_eff, post_chunk, run_model.cfg,
            apply_mask, mask_edges,
            edge_normal_threshold, edge_depth_threshold, apply_confidence_mask,
            confidence_percentile, data_norm_type,
            tuple(sorted(batched.keys())),
            batched["img"].shape,
        )
        # Forward and postprocess are jitted SEPARATELY: fusing them into one
        # program makes XLA's optimization passes superlinear (~490s compile
        # for the flagship at 518^2 vs ~50s split). The extra dispatch is
        # negligible next to the network.
        fn = self._jitted.get(flags)
        if fn is None:
            if self.view_shard_mesh is not None:
                from ..parallel import view_sharded_forward

                # jit so repeat calls hit the trace cache — unjitted, every
                # request would redo the eval_shape + shard_map setup
                fwd = jax.jit(partial(
                    view_sharded_forward, run_model,
                    mesh=self.view_shard_mesh, geom_cfg=geom_cfg,
                    seq_axis=self.seq_axis,
                    memory_efficient=mem_eff,
                ))
            else:
                fwd = jax.jit(
                    partial(
                        _forward_only,
                        model=run_model,
                        geom_cfg=geom_cfg,
                        memory_efficient=mem_eff,
                    )
                )
            post = jax.jit(
                partial(
                    postprocess_outputs,
                    data_norm_type=data_norm_type,
                    apply_mask=apply_mask,
                    mask_edges=mask_edges,
                    edge_normal_threshold=edge_normal_threshold,
                    edge_depth_threshold=edge_depth_threshold,
                    apply_confidence_mask=apply_confidence_mask,
                    confidence_percentile=confidence_percentile,
                    # memory-efficient requests chunk the postprocess too
                    # (per-view-exact, see postprocess_outputs) and donate
                    # the forward's outputs for buffer reuse
                    view_chunk=post_chunk,
                ),
                donate_argnums=(0,) if mem_eff else (),
            )
            fn = (fwd, post)
            self._jitted[flags] = fn
        fwd, post = fn
        out = post(fwd(self.params, batched), batched["img"])
        return unstack_views(out, num_views)


def _forward_only(params, batched, *, model, geom_cfg, memory_efficient):
    # sparse-depth presets (registration_sparse) need randomness for the
    # WHICH-pixels draw even at prob 1.0; a fixed key keeps inference
    # reproducible (the reference uses unseeded torch.rand here,
    # model.py:884-941)
    rng = (jax.random.PRNGKey(0)
           if geom_cfg.sparse_depth_prob > 0.0 else None)
    return model.apply(
        params, batched, geom_cfg, rng=rng,
        memory_efficient=memory_efficient
    )
