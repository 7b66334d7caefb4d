"""RMVD-style MVS-depth benchmark adaptor (reference
benchmarking/rmvd_mvs_benchmark/adaptors.py:17 RMVD_MAPA_Wrapper).

The RobustMVD (`rmvd`) pip harness is not available in this environment, so
this module ships both halves of the seam:

  * `RMVDAdaptor` — the adaptor class with the exact RMVD wrapper surface
    (`input_adapter` numpy-multi-view -> model views; `__call__`;
    `output_adapter` -> {"depth", "depth_uncertainty"} numpy), pluggable
    into the real rmvd evaluation when that package is present;
  * `evaluate_mvs_depth` — a self-contained MVS-depth evaluation loop
    implementing the RMVD depth metrics (abs-rel + inlier@1.03, optional
    least-squares scale alignment for scale-ambiguous predictions) so the
    adaptor is exercisable end-to-end without the pip package
    (tests/test_adapters.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import get_rays_in_camera_frame, rotation_matrix_to_quaternion
from ..models import GeometricInputConfig, images_only_config
from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT


class RMVDAdaptor:
    """Adapts a factored-contract model (MapAnything or any
    models/adapters.py adapter) to the RMVD evaluation interface.

    inference_conditioning: "image" | "image+intrinsics" |
        "image+intrinsics+pose" — mirrors the reference's geometric-input
        probability overrides (adaptors.py:47-60) via GeometricInputConfig.
    """

    def __init__(self, model, params, data_norm_type: str = "dinov2",
                 inference_conditioning: str = "image",
                 evaluate_single_view: bool = False):
        self.model = model
        self.params = params
        self.data_norm_type = data_norm_type
        self.inference_conditioning = inference_conditioning
        self.evaluate_single_view = evaluate_single_view
        if inference_conditioning == "image":
            self.geom_cfg = images_only_config()
        elif inference_conditioning == "image+intrinsics":
            self.geom_cfg = GeometricInputConfig(
                overall_prob=1.0, dropout_prob=0.0, ray_dirs_prob=1.0,
                depth_prob=0.0, cam_prob=0.0,
            )
        elif inference_conditioning == "image+intrinsics+pose":
            self.geom_cfg = GeometricInputConfig(
                overall_prob=1.0, dropout_prob=0.0, ray_dirs_prob=1.0,
                depth_prob=0.0, cam_prob=1.0,
            )
        else:
            raise ValueError(
                f"unknown inference_conditioning {inference_conditioning!r}"
            )
        # External torch-backed adapters (models/adapters.py) set
        # jit_compatible=False — their forward runs outside jit.
        if getattr(model, "jit_compatible", True):
            self._fwd = jax.jit(
                lambda p, v: self.model.apply(p, v, self.geom_cfg)
            )
        else:
            self._fwd = lambda p, v: self.model.apply(p, v, self.geom_cfg)

    # -- RMVD wrapper surface ------------------------------------------------
    def input_adapter(
        self,
        images: Sequence[np.ndarray],  # V x (1, 3, H, W) uint8/float RGB
        keyview_idx: int = 0,
        poses: Optional[Sequence[np.ndarray]] = None,  # V x (1, 4, 4) key_T_i
        intrinsics: Optional[Sequence[np.ndarray]] = None,  # V x (1, 3, 3)
        depth_range=None,
    ) -> Dict[str, jnp.ndarray]:
        """numpy multi-view sample -> stacked views pytree. The key view is
        moved to index 0 (the model's reference-view convention)."""
        del depth_range
        order = [keyview_idx] + [
            i for i in range(len(images)) if i != keyview_idx
        ]
        mean, std = IMAGE_NORMALIZATION_DICT[self.data_norm_type]
        mean = np.asarray(mean, np.float32)
        std = np.asarray(std, np.float32)

        imgs, rays, quats, trans = [], [], [], []
        for i in order:
            img = np.asarray(images[i], np.float32)
            if img.max() > 2.0:  # uint8-range input
                img = img / 255.0
            img = img[0].transpose(1, 2, 0)  # (H, W, 3)
            imgs.append((img - mean) / std)
            if intrinsics is not None:
                k = jnp.asarray(intrinsics[i][0], jnp.float32)
                _, dirs = get_rays_in_camera_frame(
                    k, img.shape[0], img.shape[1],
                    normalize_to_unit_sphere=True,
                )
                rays.append(dirs)
            if poses is not None:
                # rmvd poses are key_T_i: invert to i_T_key (cam2key)
                p = np.linalg.inv(np.asarray(poses[i][0], np.float64))
                quats.append(rotation_matrix_to_quaternion(
                    jnp.asarray(p[:3, :3], jnp.float32)))
                trans.append(jnp.asarray(p[:3, 3], jnp.float32))
            if self.evaluate_single_view:
                break

        views: Dict[str, jnp.ndarray] = {
            "img": jnp.stack(imgs)[None],  # (1, V, H, W, 3)
        }
        if rays and "intrinsics" in self.inference_conditioning:
            views["ray_directions_cam"] = jnp.stack(rays)[None]
        if quats and "pose" in self.inference_conditioning:
            views["camera_pose_quats"] = jnp.stack(quats)[None]
            views["camera_pose_trans"] = jnp.stack(trans)[None]
            views["is_metric_scale"] = jnp.ones(
                (1, len(quats)), dtype=bool
            )
        return views

    def __call__(self, views: Dict[str, jnp.ndarray]):
        return self._fwd(self.params, views)

    def output_adapter(self, model_output) -> tuple:
        """Factored predictions -> RMVD pred dict for the key view (index 0):
        z-depth (1, 1, H, W) + 1/conf uncertainty (adaptors.py:171-183)."""
        z = np.asarray(model_output["pts3d_cam"][:, 0, ..., 2])  # (1, H, W)
        pred = {"depth": z[:, None]}
        conf = np.asarray(model_output.get(
            "conf", jnp.ones_like(model_output["pts3d_cam"][..., 0])
        )[:, 0])
        pred["depth_uncertainty"] = (1.0 / np.clip(conf, 1e-6, None))[:, None]
        return pred, {}


def evaluate_mvs_depth(
    adaptor: RMVDAdaptor,
    samples: Sequence[Dict],
    align_scale: bool = True,
) -> Dict[str, float]:
    """Self-contained RMVD-protocol MVS-depth evaluation.

    Each sample: {"images": [...], "keyview_idx": int, "gt_depth": (H, W),
    optional "poses"/"intrinsics"}. Metrics per the rmvd harness: abs-rel
    and inlier ratio @1.03 over valid (gt>0) pixels, with optional
    least-squares scale alignment (rmvd's default for non-metric models).
    """
    absrels: List[float] = []
    inliers: List[float] = []
    for s in samples:
        views = adaptor.input_adapter(
            s["images"], s.get("keyview_idx", 0), s.get("poses"),
            s.get("intrinsics"),
        )
        pred, _ = adaptor.output_adapter(adaptor(views))
        depth = pred["depth"][0, 0]
        gt = np.asarray(s["gt_depth"], np.float32)
        valid = gt > 0
        if not valid.any():
            continue
        if align_scale:
            scale = float(
                (gt[valid] * depth[valid]).sum()
                / np.clip((depth[valid] ** 2).sum(), 1e-12, None)
            )
            depth = depth * scale
        rel = np.abs(depth[valid] - gt[valid]) / gt[valid]
        absrels.append(float(rel.mean()))
        inliers.append(float(
            (np.maximum(depth[valid] / gt[valid],
                        gt[valid] / np.clip(depth[valid], 1e-12, None))
             < 1.03).mean()
        ))
    return {
        "depth_abs_rel": float(np.mean(absrels)) if absrels else float("nan"),
        "depth_inlier_103": float(np.mean(inliers)) if inliers else float("nan"),
        "num_samples": len(absrels),
    }
