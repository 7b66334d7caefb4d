"""mapanything_tpu — TPU-native (JAX/XLA/Pallas) multi-view metric 3D reconstruction.

A from-scratch rebuild of the capabilities of MapAnything
(facebookresearch/map-anything): one feed-forward multi-view transformer that
regresses factored metric geometry (per-pixel ray directions, depth-along-ray,
per-view camera pose, a global metric scale, confidence and validity masks)
from N images plus any subset of optional geometric priors.

Architecture is TPU-first:
  * everything inside jit is static-shape (B, V, ...) batched tensors — views
    live on a leading view axis instead of Python lists of dicts;
  * stochastic input dropout uses explicit PRNG keys;
  * confidence/edge mask postprocessing runs on device (reduce_window pooling)
    instead of per-image host numpy loops;
  * scaling is expressed with jax.sharding Meshes (data/view axes) rather than
    NCCL process groups.

Subpackages:
  geometry  — pure-jnp geometry math (rays, quats, pointmaps, normalization,
              on-device edge masks)
  nn        — flax.linen network modules (DINOv2 ViT, alternating-attention
              multi-view trunk, DPT / pose / scale heads, adaptors)
  models    — model assembly + factory (MapAnything)
  ops       — Pallas kernels & fused attention wrappers
  parallel  — device mesh / sharding utilities
  train     — losses, optimizer, train step, checkpointing
  data      — host-side image loading + resolution bucketing
  utils     — inference pre/post-processing, weight conversion, metrics
"""

__version__ = "0.1.0"
