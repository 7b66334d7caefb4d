"""Sequence-parallel (view-sharded) full-model inference.

The reference's view ceiling is one GPU's HBM (~2000 views on 140 GB,
reference README.md:132) because its trunk attention never spans devices.
Here the VIEW axis shards over a mesh axis: the encoder, frame attention,
DPT heads and postprocess are all per-view (they run on local shards
unchanged), while the trunk's global-attention layers run ring attention
(ops/ring_attention.py) and the scale token stays replicated — the result
is bitwise-equivalent semantics to the single-device forward with
per-device memory O(V/p), so the view ceiling scales with the mesh.

Cross-view prior encoding is handled inside the model when
`cfg.trunk_seq_axis` is set (models/mapanything.py): the pose reference is
the GLOBAL view 0 (all-gathered) and the pose-translation norm reduces
across shards with psum.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
from jax.sharding import PartitionSpec as P


def _shard_map(body, **kwargs):
    from ..ops.collectives import shard_map_compat

    return shard_map_compat(body, **kwargs)


def view_sharded_forward(
    model,
    params,
    views: Dict[str, Any],
    mesh,
    geom_cfg=None,
    seq_axis: str = "model",
    memory_efficient: bool = False,
):
    """Full MapAnything forward with views sharded over `mesh[seq_axis]`.

    Args:
        model: a MapAnything instance (alternating trunk).
        params: its params (replicated; pass placed arrays for zero copy).
        views: the stacked (B, V, ...) views pytree; V must divide the axis
            size (pad with duplicate views and slice outputs if ragged).
        geom_cfg: a DETERMINISTIC GeometricInputConfig (inference-time 0/1
            probabilities); stochastic training mixes are rejected — the
            per-view Bernoulli draws would need per-shard rng plumbing.

    Returns:
        The same outputs dict as `model.apply`, with per-view outputs
        sharded over `seq_axis` (fetch or `jax.device_get` as usual).
    """
    from ..models.mapanything import GeometricInputConfig

    geom_cfg = geom_cfg or GeometricInputConfig()
    if not geom_cfg.deterministic():
        raise ValueError(
            "view_sharded_forward requires a deterministic geom_cfg "
            "(0/1 probabilities); got a stochastic training mix"
        )
    if getattr(model.cfg, "scan_layers", False):
        # the ring path stays unrolled (nn/trunk.py: scan_layers requires
        # no seq_axis), so fold a scan-layout checkpoint back to the
        # per-layer layout and drive the unrolled model throughout
        from ..utils.weights import unstack_scan_params

        params = dict(params, params=unstack_scan_params(params["params"]))
        model = type(model)(
            cfg=dataclasses.replace(model.cfg, scan_layers=False))
    size = mesh.shape[seq_axis]
    v = views["img"].shape[1]
    if v % size != 0:
        raise ValueError(
            f"view count {v} must be a multiple of the '{seq_axis}' axis "
            f"size {size}; pad with duplicate views and slice the outputs"
        )

    ring_cfg = dataclasses.replace(model.cfg, trunk_seq_axis=seq_axis)
    ring_model = type(model)(cfg=ring_cfg)
    body = functools.partial(
        _apply, ring_model, geom_cfg, memory_efficient
    )

    # per-view leaves (everything in views has the V axis at dim 1)
    view_specs = jax.tree_util.tree_map(
        lambda x: P(None, seq_axis), views
    )
    # output STRUCTURE from the unsharded model (the ring body uses
    # axis_index/psum, which only trace inside shard_map)
    out_shapes = jax.eval_shape(
        functools.partial(_apply, model, geom_cfg, memory_efficient),
        params, views,
    )
    out_specs = jax.tree_util.tree_map(
        lambda s: P(None, seq_axis) if s.ndim >= 2 else P(), out_shapes
    )
    fn = _shard_map(
        body, mesh=mesh, in_specs=(P(), view_specs), out_specs=out_specs
    )
    return fn(params, views)


def _apply(ring_model, geom_cfg, memory_efficient, params, views):
    return ring_model.apply(params, views, geom_cfg,
                            memory_efficient=memory_efficient)
