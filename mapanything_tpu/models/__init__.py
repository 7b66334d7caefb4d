"""Model registry + factory (the reference's models/__init__.py:41-191)."""

from __future__ import annotations

from typing import Any, Dict

from .mapanything import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    aug_training_config,
    images_only_config,
)

MODEL_CONFIGS: Dict[str, Any] = {
    "mapanything": MapAnythingConfig,
}


def model_factory(model_str: str = "mapanything", **overrides) -> MapAnything:
    """Build a model by name with config overrides (reference
    models/__init__.py:128)."""
    if model_str not in MODEL_CONFIGS:
        raise ValueError(
            f"unknown model {model_str!r}; available: {sorted(MODEL_CONFIGS)}"
        )
    cfg = MODEL_CONFIGS[model_str](**overrides)
    return MapAnything(cfg=cfg)


from .tasks import TASK_NAMES, task_config

__all__ = [
    "GeometricInputConfig",
    "MapAnything",
    "MapAnythingConfig",
    "MODEL_CONFIGS",
    "TASK_NAMES",
    "aug_training_config",
    "images_only_config",
    "model_factory",
    "task_config",
]

from .modular_dust3r import ModularDUSt3R, ModularDUSt3RConfig

MODEL_CONFIGS["modular_dust3r"] = ModularDUSt3RConfig


from .pretrained import from_pretrained  # noqa: E402

__all__.append("from_pretrained")


def mapanything_ablations_config(**overrides) -> "MapAnythingConfig":
    """MapAnythingAblations preset (reference ablations.py:78): no scale
    token, optional RoPE trunk positional encoding."""
    defaults = dict(use_scale_token=False, trunk_rope_freq=100.0)
    defaults.update(overrides)
    return MapAnythingConfig(**defaults)
