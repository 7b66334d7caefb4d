"""Output adaptors: pure activation/range post-processors on raw head channels.

Jnp-function rebuild of the 17 UniCeption adaptor classes imported at
reference model.py:49-68 and configured by configs/model/pred_head/
adaptor_config/raydirs_depth_pose_confidence_mask_scale.yaml:
  * ray dirs: linear, normalized to the unit sphere;
  * depth: exp, vmin 0;
  * confidence: exp, vmin 1 (conf = vmin + exp(x));
  * mask: sigmoid prob + raw logits;
  * pose: linear trans + unit-normalized quats;
  * scale: exp, vmin 1e-8.

Adaptors are stateless — pure functions returning a dict of named fields —
so they live outside the flax module tree (no params, nothing to convert).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _exp_with_vmin(x: jnp.ndarray, vmin: float) -> jnp.ndarray:
    """mode="exp" with a lower bound: vmin + exp(x) (vmax = inf)."""
    return vmin + jnp.exp(x)


def normalize_to_unit_sphere(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), eps, None)


def ray_dirs_adaptor(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) raw -> unit-sphere ray directions."""
    return normalize_to_unit_sphere(x)


def depth_adaptor(x: jnp.ndarray, vmin: float = 0.0) -> jnp.ndarray:
    """(..., 1) raw -> positive depth (exp activation)."""
    return _exp_with_vmin(x, vmin)


def confidence_adaptor(x: jnp.ndarray, vmin: float = 1.0) -> jnp.ndarray:
    """(..., 1) raw -> confidence >= vmin."""
    return _exp_with_vmin(x, vmin)


def mask_adaptor(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., 1) raw -> {"mask": sigmoid prob, "logits": raw}."""
    return {"mask": jnp.asarray(1.0) / (1.0 + jnp.exp(-x)), "logits": x}


def pose_adaptor(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., 7) raw -> {"trans": (...,3) linear, "quats": (...,4) unit}."""
    trans = x[..., :3]
    quats = normalize_to_unit_sphere(x[..., 3:7])
    return {"trans": trans, "quats": quats}


def scale_adaptor(x: jnp.ndarray, vmin: float = 1e-8) -> jnp.ndarray:
    """(..., 1) raw -> positive metric scale."""
    return _exp_with_vmin(x, vmin)


def dense_adaptor_raydirs_depth_conf_mask(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Split the 6-channel dense head output and apply per-field activations.

    Channel order per the released config input_dim: 6 = ray dirs 3 +
    log-depth 1 + confidence 1 + mask 1.
    """
    assert x.shape[-1] == 6
    return {
        "ray_directions": ray_dirs_adaptor(x[..., 0:3]),
        "depth_along_ray": depth_adaptor(x[..., 3:4]),
        "conf": confidence_adaptor(x[..., 4:5]),
        **mask_adaptor(x[..., 5:6]),
    }


def dense_adaptor_pointmap(x: jnp.ndarray, with_conf: bool = False,
                           with_mask: bool = False) -> Dict[str, jnp.ndarray]:
    """Pointmap-style dense adaptors (ablations): linear xyz (+conf/mask)."""
    out = {"pts3d": x[..., 0:3]}
    c = 3
    if with_conf:
        out["conf"] = confidence_adaptor(x[..., c : c + 1])
        c += 1
    if with_mask:
        out.update(mask_adaptor(x[..., c : c + 1]))
        c += 1
    return out
