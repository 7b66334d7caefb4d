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


class VGGTAdapter:
    """VGGT (torch) -> the factored benchmark contract.

    Wraps a constructed torch VGGT module — the reference's vendored
    `mapanything.models.external.vggt.models.vggt.VGGT` (or the same
    architecture loaded with `VGGT.from_pretrained("facebook/VGGT-1B")`) —
    the way the reference's VGGTWrapper does
    (models/external/vggt/__init__.py:82-190), but all output conversion
    runs through THIS framework's jnp geometry instead of the wrapper's
    torch utils:

      * camera_head pose encoding [t(3), xyzw quat(4), fov_h, fov_w]
        decoded to cam-from-world extrinsics + pinhole K (pose_enc.py:108);
      * depth_head z-depth -> camera pointmaps, unit rays, depth-along-ray
        (geometry/rays.py);
      * world pointmaps via the factored recombination.

    The torch forward stays on host (the reference runs it on CUDA; there
    is no TPU torch), which matches the external-wrapper role: evaluate a
    foreign model under this framework's benchmarks with zero benchmark
    changes.
    """

    jit_compatible = False  # torch forward cannot be traced

    def __init__(self, model, data_norm_type: str = "dinov2"):
        self.model = model
        self.data_norm_type = data_norm_type

    def init(self, *a, **kw):
        return {}  # torch params live inside the module

    def apply(self, params, views: Dict[str, Any], geom_cfg=None,
              memory_efficient: bool = False) -> Dict[str, jnp.ndarray]:
        del params, geom_cfg, memory_efficient
        import numpy as np
        import torch

        from ..geometry import (
            closed_form_pose_inverse,
            convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap,
            convert_z_depth_to_depth_along_ray,
            depthmap_to_camera_frame,
            get_rays_in_camera_frame,
        )
        from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

        imgs = np.asarray(views["img"], np.float32)  # (B,V,H,W,3)
        b, v, h, w, _ = imgs.shape
        # VGGT expects [0,1] images ("identity" norm,
        # external/vggt/__init__.py:104-108) — undo our data norm
        mean, std = IMAGE_NORMALIZATION_DICT[self.data_norm_type]
        imgs01 = np.clip(imgs * std.astype(np.float32)
                         + mean.astype(np.float32), 0.0, 1.0)
        t_imgs = torch.from_numpy(
            np.ascontiguousarray(imgs01.transpose(0, 1, 4, 2, 3))
        )

        self.model.eval()
        with torch.no_grad():
            agg_tokens, ps_idx = self.model.aggregator(t_imgs)
            pose_enc = self.model.camera_head(agg_tokens)[-1]  # (B,V,9)
            depth_map, depth_conf = self.model.depth_head(
                agg_tokens, t_imgs, ps_idx
            )  # (B,V,H,W,1), (B,V,H,W)

        pose_enc = jnp.asarray(pose_enc.numpy())
        depth_z = jnp.asarray(depth_map.numpy())[..., 0]  # (B,V,H,W)
        conf = jnp.asarray(depth_conf.numpy())

        # decode pose encoding (pose_enc.py:110-130): xyzw quats, fov -> K
        trans_w2c = pose_enc[..., :3]
        quat_w2c = pose_enc[..., 3:7]
        fov_h = pose_enc[..., 7]
        fov_w = pose_enc[..., 8]
        fy = (h / 2.0) / jnp.tan(fov_h / 2.0)
        fx = (w / 2.0) / jnp.tan(fov_w / 2.0)
        K = jnp.zeros((b, v, 3, 3), jnp.float32)
        K = K.at[..., 0, 0].set(fx).at[..., 1, 1].set(fy)
        K = K.at[..., 0, 2].set(w / 2).at[..., 1, 2].set(h / 2)
        K = K.at[..., 2, 2].set(1.0)

        # cam-from-world -> cam2world
        from ..geometry import pose_quats_trans_to_matrix
        from ..geometry import rotation_matrix_to_quaternion as rot2quat

        w2c = pose_quats_trans_to_matrix(quat_w2c, trans_w2c)  # (B,V,4,4)
        c2w = closed_form_pose_inverse(w2c)
        cam_quats = rot2quat(c2w[..., :3, :3])
        cam_trans = c2w[..., :3, 3]

        pts3d_cam, _ = depthmap_to_camera_frame(depth_z, K)
        depth_along_ray = convert_z_depth_to_depth_along_ray(
            depth_z, K
        )[..., None]
        _, rays = get_rays_in_camera_frame(K, h, w,
                                           normalize_to_unit_sphere=True)
        pts3d = convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap(
            rays, depth_along_ray, cam_trans, cam_quats
        )

        ones_mask = jnp.ones((b, v, h, w), bool)
        return {
            "pts3d": pts3d,
            "pts3d_cam": pts3d_cam,
            "ray_directions": rays,
            "depth_along_ray": depth_along_ray,
            "cam_quats": cam_quats,
            "cam_trans": cam_trans,
            "metric_scaling_factor": jnp.ones((b,), jnp.float32),
            "conf": conf,
            "non_ambiguous_mask": ones_mask,
            "non_ambiguous_mask_logits": jnp.full((b, v, h, w), 10.0),
        }


class Pi3Adapter:
    """Pi3 (torch) -> the factored benchmark contract.

    Wraps a constructed torch Pi3 module — the reference's vendored
    `mapanything.models.external.pi3.models.pi3.Pi3` (or the same
    architecture loaded via `Pi3.from_pretrained("yyfz233/Pi3")`) — the way
    the reference's Pi3Wrapper does (models/external/pi3/__init__.py:57-135),
    with output conversion through this framework's jnp geometry:

      * `camera_poses` (B,V,4,4) are cam2world; translation/quaternion are
        read off directly (pi3/__init__.py:98-101);
      * `local_points` are the camera-frame pointmaps: depth-along-ray is
        their norm and rays the normalized directions
        (pi3/__init__.py:104-109);
      * `points` are the world pointmaps (already unprojected by Pi3's own
        einsum, pi3.py:246-249);
      * Pi3 geometry is scale-ambiguous: metric_scaling_factor = 1.

    The torch forward stays on host (external-wrapper role, §2.9). Pi3
    expects images in [0, 1] ("identity" norm — it applies its own ImageNet
    normalization internally, pi3.py:143-147), so this adapter undoes the
    framework's data norm first.
    """

    jit_compatible = False  # torch forward cannot be traced

    def __init__(self, model, data_norm_type: str = "dinov2"):
        self.model = model
        self.data_norm_type = data_norm_type

    def init(self, *a, **kw):
        return {}  # torch params live inside the module

    def apply(self, params, views: Dict[str, Any], geom_cfg=None,
              memory_efficient: bool = False) -> Dict[str, jnp.ndarray]:
        del params, geom_cfg, memory_efficient
        import numpy as np
        import torch

        from ..geometry import rotation_matrix_to_quaternion as rot2quat
        from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

        imgs = np.asarray(views["img"], np.float32)  # (B,V,H,W,3)
        b, v, h, w, _ = imgs.shape
        mean, std = IMAGE_NORMALIZATION_DICT[self.data_norm_type]
        imgs01 = np.clip(imgs * std.astype(np.float32)
                         + mean.astype(np.float32), 0.0, 1.0)
        t_imgs = torch.from_numpy(
            np.ascontiguousarray(imgs01.transpose(0, 1, 4, 2, 3))
        )  # (B,V,3,H,W)

        self.model.eval()
        with torch.no_grad():
            res = self.model(t_imgs)

        pts3d = jnp.asarray(res["points"].numpy())          # (B,V,H,W,3)
        pts3d_cam = jnp.asarray(res["local_points"].numpy())
        conf = jnp.asarray(res["conf"].numpy())[..., 0]     # (B,V,H,W)
        c2w = jnp.asarray(res["camera_poses"].numpy())      # (B,V,4,4)

        rays, depth_along_ray = _rays_depth_from_cam_points(pts3d_cam)
        cam_quats = rot2quat(c2w[..., :3, :3])
        cam_trans = c2w[..., :3, 3]

        ones_mask = jnp.ones((b, v, h, w), bool)
        return {
            "pts3d": pts3d,
            "pts3d_cam": pts3d_cam,
            "ray_directions": rays,
            "depth_along_ray": depth_along_ray,
            "cam_quats": cam_quats,
            "cam_trans": cam_trans,
            "metric_scaling_factor": jnp.ones((b,), jnp.float32),
            "conf": conf,
            "non_ambiguous_mask": ones_mask,
            "non_ambiguous_mask_logits": jnp.full((b, v, h, w), 10.0),
        }


class MoGeAdapter:
    """MoGe v1/v2 (torch, monocular) -> the factored benchmark contract.

    Wraps a constructed torch MoGeModel — the reference's vendored
    `mapanything.models.external.moge.models.v2.MoGeModel` (or v1) — the way
    the reference's MoGeWrapper does (models/external/moge/__init__.py:64-
    127): `model.infer(image, num_tokens=(H//14)*(W//14), apply_mask=False)`
    per view, camera-frame points out.

    MoGe is single-view: the reference wrapper asserts V == 1. This adapter
    generalizes by running each view independently — every view gets an
    identity pose and `pts3d == pts3d_cam`, which is exactly the V=1
    semantics repeated, so single-view RMVD-style depth evaluation works for
    any V while multi-view alignment is (correctly) not claimed.

      * rays + depth-along-ray from the camera-frame points
        (moge/__init__.py:105-108);
      * non_ambiguous_mask from the predicted sky/ambiguity mask when the
        model has a mask head;
      * metric_scaling_factor = 1 (the wrapper does not consume
        MoGe-2's metric scale; parity with moge/__init__.py:110-121).
    """

    jit_compatible = False  # torch forward cannot be traced

    def __init__(self, model, data_norm_type: str = "dinov2"):
        self.model = model
        self.data_norm_type = data_norm_type

    def init(self, *a, **kw):
        return {}

    def apply(self, params, views: Dict[str, Any], geom_cfg=None,
              memory_efficient: bool = False) -> Dict[str, jnp.ndarray]:
        del params, geom_cfg, memory_efficient
        import numpy as np
        import torch

        from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

        imgs = np.asarray(views["img"], np.float32)  # (B,V,H,W,3)
        b, v, h, w, _ = imgs.shape
        mean, std = IMAGE_NORMALIZATION_DICT[self.data_norm_type]
        imgs01 = np.clip(imgs * std.astype(np.float32)
                         + mean.astype(np.float32), 0.0, 1.0)

        pts, masks = [], []
        self.model.eval()
        num_tokens = max((h // 14) * (w // 14), 4)
        with torch.no_grad():
            for view in range(v):
                t_img = torch.from_numpy(np.ascontiguousarray(
                    imgs01[:, view].transpose(0, 3, 1, 2)
                ))  # (B,3,H,W)
                out = self.model.infer(
                    image=t_img, num_tokens=num_tokens, apply_mask=False,
                    use_fp16=False,
                )
                pts.append(out["points"].float().numpy())  # (B,H,W,3)
                if "mask" in out:
                    masks.append(out["mask"].float().numpy() > 0.5)
                else:
                    masks.append(np.ones((b, h, w), bool))

        pts3d_cam = jnp.asarray(np.stack(pts, axis=1))  # (B,V,H,W,3)
        mask = jnp.asarray(np.stack(masks, axis=1))     # (B,V,H,W)

        rays, depth_along_ray = _rays_depth_from_cam_points(pts3d_cam)
        identity_quat = jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (b, v, 1)
        )
        return {
            "pts3d": pts3d_cam,
            "pts3d_cam": pts3d_cam,
            "ray_directions": rays,
            "depth_along_ray": depth_along_ray,
            "cam_quats": identity_quat,
            "cam_trans": jnp.zeros((b, v, 3), jnp.float32),
            "metric_scaling_factor": jnp.ones((b,), jnp.float32),
            "conf": jnp.ones((b, v, h, w), jnp.float32),
            "non_ambiguous_mask": mask,
            "non_ambiguous_mask_logits": jnp.where(mask, 10.0, -10.0),
        }
