"""TPU compute kernels: fused attention (XLA + Pallas flash), resize ops."""

from .attention import sdpa

__all__ = ["sdpa"]
