"""External-model adapter seam (reference §2.9 wrapper contract).

The reference serves 10 different models through one contract — every
wrapper's `forward(views)` returns the SAME factored prediction keys, which
is what lets one training loop, one loss DSL and three benchmarks evaluate
any model (reference models/external/vggt/__init__.py:82-153,
models/external/dust3r/__init__.py:210-222).

This module is the TPU-native equivalent: an adapter is any object with

    .apply(params, views, geom_cfg, memory_efficient=False) -> preds dict

where `views` is the stacked (B, V, ...) views pytree and `preds` carries
the factored keys:

    pts3d, pts3d_cam, ray_directions, depth_along_ray,
    cam_quats, cam_trans, metric_scaling_factor, conf,
    non_ambiguous_mask, non_ambiguous_mask_logits

— the exact duck-type `benchmarks/dense_n_view.run_dense_n_view_benchmark`
drives, so a new model needs ZERO benchmark-code changes
(tests/test_adapters.py runs ModularDUSt3R through the dense N-view
benchmark unmodified).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..geometry import (
    rigid_points_registration,
    rotation_matrix_to_quaternion,
    safe_norm,
)

FACTORED_PRED_KEYS = (
    "pts3d",
    "pts3d_cam",
    "ray_directions",
    "depth_along_ray",
    "cam_quats",
    "cam_trans",
    "metric_scaling_factor",
    "conf",
    "non_ambiguous_mask",
    "non_ambiguous_mask_logits",
)


def _rays_depth_from_cam_points(pts_cam: jnp.ndarray):
    """(..., H, W, 3) camera-frame points -> unit rays + depth-along-ray."""
    depth = safe_norm(pts_cam, axis=-1, keepdims=True)
    rays = pts_cam / jnp.clip(depth, 1e-8, None)
    return rays, depth


class ModularDUSt3RAdapter:
    """ModularDUSt3R -> factored benchmark contract.

    DUSt3R predicts both views' pointmaps in view 1's frame; the factored
    quantities are derived the way the reference's DUSt3R-lineage wrappers
    do (models/external/dust3r/__init__.py:182-218):

      * view 1: its pointmap IS the camera-frame pointmap (identity pose);
      * view 2: run the SWAPPED pair to get view 2's own camera-frame
        pointmap, then recover the relative pose with confidence-weighted
        Kabsch between the two predictions of the same surface (the roma
        rigid_points_registration pattern) — fully on device;
      * rays/depth-along-ray from the camera-frame pointmaps;
      * metric_scaling_factor = 1 (DUSt3R geometry is scale-ambiguous).
    """

    def __init__(self, model):
        self.model = model

    def init(self, rng, views, *a, **kw):
        return self.model.init(rng, {"img": views["img"]})

    def apply(self, params, views: Dict[str, Any], geom_cfg=None,
              memory_efficient: bool = False) -> Dict[str, jnp.ndarray]:
        del geom_cfg, memory_efficient  # images-only, 2-view model
        imgs = views["img"]
        b, v, h, w, _ = imgs.shape
        assert v == 2, "ModularDUSt3RAdapter adapts the 2-view model"

        fwd = self.model.apply(params, {"img": imgs})
        swapped = self.model.apply(params, {"img": imgs[:, ::-1]})

        pts_v1 = fwd["pts3d"]  # (B, 2, H, W, 3) both in view1 frame
        conf = fwd["conf"]  # (B, 2, H, W)
        # view2's own-frame pointmap = swapped run's first output
        pts2_cam = swapped["pts3d"][:, 0]
        conf2_cam = swapped["conf"][:, 0]

        # cam2world (world = view1 frame) for view 2: the transform taking
        # view2-frame points onto their view1-frame prediction.
        weights = (conf[:, 1] * conf2_cam).reshape(b, h * w)
        r, t = rigid_points_registration(
            pts2_cam.reshape(b, h * w, 3),
            pts_v1[:, 1].reshape(b, h * w, 3),
            weights=weights,
        )
        quat2 = rotation_matrix_to_quaternion(r)

        identity_q = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], pts_v1.dtype), (b, 4)
        )
        cam_quats = jnp.stack([identity_q, quat2], axis=1)
        cam_trans = jnp.stack([jnp.zeros((b, 3), pts_v1.dtype), t], axis=1)

        pts_cam = jnp.stack([pts_v1[:, 0], pts2_cam], axis=1)
        rays, depth = _rays_depth_from_cam_points(pts_cam)

        ones_mask = jnp.ones((b, v, h, w), bool)
        return {
            "pts3d": pts_v1,
            "pts3d_cam": pts_cam,
            "ray_directions": rays,
            "depth_along_ray": depth,
            "cam_quats": cam_quats,
            "cam_trans": cam_trans,
            "metric_scaling_factor": jnp.ones((b,), jnp.float32),
            "conf": conf,
            "non_ambiguous_mask": ones_mask,
            "non_ambiguous_mask_logits": jnp.full((b, v, h, w), 10.0),
        }


class MapAnythingAdapter:
    """Identity adapter: MapAnything already speaks the contract. Exists so
    external tooling can treat every model uniformly."""

    def __init__(self, model):
        self.model = model

    def init(self, *a, **kw):
        return self.model.init(*a, **kw)

    def apply(self, params, views, geom_cfg=None, memory_efficient=False):
        kw = {}
        if geom_cfg is not None:
            kw["geom_cfg"] = geom_cfg
        return self.model.apply(params, views,
                                memory_efficient=memory_efficient, **kw)
