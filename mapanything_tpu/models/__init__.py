"""Model registry + factory (the reference's models/__init__.py:41-191)."""

from __future__ import annotations

from typing import Any, Dict

from .mapanything import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    MemoryPolicy,
    aug_training_config,
    images_only_config,
    resolve_memory_policy,
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


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under ONE jitted program.

    Eager Flax init dispatches every parameter initializer as its own tiny
    XLA program — ~435 compilations (~30 s on CPU, worse over a TPU tunnel
    where each dispatch pays the RTT) for the full MapAnything model. Traced
    as a single program it compiles once and hits the persistent compile
    cache on repeat runs.

    Array leaves (views, rng keys) are passed as traced arguments so they
    don't bloat the program as embedded constants; everything else (config
    dataclasses, flags) is closed over statically.
    """
    import jax as _jax
    import numpy as _np

    flat, treedef = _jax.tree_util.tree_flatten((rngs, args, kwargs))
    is_arr = [isinstance(l, (_jax.Array, _np.ndarray)) for l in flat]
    statics = [None if a else l for l, a in zip(flat, is_arr)]

    @_jax.jit
    def _init(arr_leaves):
        it = iter(arr_leaves)
        rebuilt = [next(it) if a else s for s, a in zip(statics, is_arr)]
        r, ar, kw = _jax.tree_util.tree_unflatten(treedef, rebuilt)
        return model.init(r, *ar, **kw)

    return _init([l for l, a in zip(flat, is_arr) if a])


__all__ = [
    "GeometricInputConfig",
    "MapAnything",
    "MapAnythingConfig",
    "MODEL_CONFIGS",
    "TASK_NAMES",
    "aug_training_config",
    "images_only_config",
    "jit_init",
    "MemoryPolicy",
    "model_factory",
    "resolve_memory_policy",
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
