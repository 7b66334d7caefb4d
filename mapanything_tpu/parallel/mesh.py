"""Device mesh + sharding rules (the NCCL/DDP replacement, SURVEY.md §2.5).

The reference scales with torch DDP over NCCL (train_tools.py:362-403) — data
parallelism only. The TPU-native design expresses parallelism as a
jax.sharding Mesh with named axes and lets XLA GSPMD insert ICI collectives:

  * "data"  — batch axis (DP): gradient psum replaces DDP all-reduce;
  * "model" — tensor parallelism (TP): trunk/encoder attention QKV and MLP
    kernels are sharded on their output features, projections on input
    features, so each attention layer runs head-parallel with one
    reduce-scatter/all-gather pair inserted by XLA.

Pipeline/expert parallelism are not applicable to this architecture (single
trunk, no MoE) — matching the reference, which has neither (SURVEY §2.5).
Sequence parallelism over the view axis comes from the same "model" axis via
activation sharding constraints on the (B, V, ...) tensors.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (
        f"mesh {n_data}x{n_model} does not cover {n} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Parameter partition rules: (regex on '/'-joined param path) -> PartitionSpec.
# First match wins; default replicated. Kernels are (in, out) for Dense and
# (kh, kw, in, out) for Conv.
_PARAM_RULES = [
    # attention fused QKV + MLP up-projection: shard output features
    (r".*(qkv|fc1)/kernel$", P(None, "model")),
    # attention output proj + MLP down-projection: shard input features
    (r".*attn/proj/kernel$", P("model", None)),
    (r".*mlp/fc2/kernel$", P("model", None)),
    # biases of sharded-output layers
    (r".*(qkv|fc1)/bias$", P("model")),
]


def param_sharding(path: str, value, mesh: Mesh) -> NamedSharding:
    """Sharding for one parameter by path rules (default: replicated)."""
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            # only apply when divisible; fall back to replication otherwise
            ok = True
            for dim, axis in zip(value.shape, spec):
                if axis is not None and dim % mesh.shape[axis] != 0:
                    ok = False
            if ok and len(spec) <= value.ndim:
                full = P(*([None] * (value.ndim - len(spec)) + list(spec)))
                return NamedSharding(mesh, full)
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to the TP rules."""
    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
            for k in [getattr(p, "key", str(p)) for p in kp]
        )

    def place(kp, x):
        return jax.device_put(x, param_sharding(path_str(kp), x, mesh))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over "data" (replaces DistributedSampler
    sharding + DDP, datasets/__init__.py:40-47)."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a (B, ...) batch pytree with B sharded over the data axis."""
    sharding = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(place, batch)
