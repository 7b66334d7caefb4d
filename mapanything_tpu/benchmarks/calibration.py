"""Single-view calibration benchmark (rebuild of
benchmarking/calibration/benchmark.py:25-235).

Metric: angular error (degrees) between predicted and GT per-pixel ray
directions on single-view inputs."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import angle_diff_vec3


@jax.jit
def ray_angular_error_deg(pred_rays: jnp.ndarray, gt_rays: jnp.ndarray) -> jnp.ndarray:
    """Mean per-image angular ray error in degrees; inputs (..., H, W, 3)."""
    ang = angle_diff_vec3(pred_rays, gt_rays)
    return jnp.rad2deg(jnp.mean(ang, axis=(-2, -1)))


def run_calibration_benchmark(
    model, params, loader, geom_cfg, output_json: Optional[str] = None
) -> Dict[str, float]:
    # Same adapter seam as dense_n_view: host-side external models
    # (jit_compatible=False, e.g. AnyCalibAdapter) run outside jit.
    if getattr(model, "jit_compatible", True):
        fwd = jax.jit(
            lambda p, vw: model.apply(p, vw, geom_cfg)["ray_directions"]
        )
    else:
        def fwd(p, vw):
            return model.apply(p, vw, geom_cfg)["ray_directions"]
    errors: List[float] = []
    loader.set_epoch(0)
    for batch in loader:
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        views = dict(jb["views"])
        # single-view calibration: keep only view 0, drop geometric priors
        views = {"img": views["img"][:, :1]}
        pred_rays = fwd(params, views)
        gt_rays = jb["gt"]["ray_directions_cam"][:, :1]
        err = np.asarray(ray_angular_error_deg(pred_rays, gt_rays))
        errors.extend(err.reshape(-1).tolist())

    summary = {
        "ray_angular_error_deg_mean": float(np.mean(errors)),
        "ray_angular_error_deg_median": float(np.median(errors)),
        "num_images": len(errors),
    }
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump({"summary": summary, "per_image": errors}, f, indent=1)
    return summary
