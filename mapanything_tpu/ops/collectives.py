"""Transpose-correct collectives for shard_map graphs with the vma check off.

Pallas calls inside shard_map currently require `check_vma=False`; with the
check off, jax's automatic transposes for psum/all_gather degrade to
per-shard identity — the backward of `y = psum(x)` delivers each shard only
ITS OWN downstream cotangent, silently dropping the cross-shard terms
(`d/dx_j sum_i f_i(psum(x))` needs `sum_i ∂f_i`). These custom-VJP wrappers
restore the true transposes:

    psum:        x̄ = psum(ȳ)            (sum every shard's cotangent)
    all_gather:  x̄ = psum(ȳ_g)[own slot]

Use them for any collective on a DIFFERENTIATED quantity inside a
`check_vma=False` shard_map (see train/seq_parallel.py, nn/layers.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_grad_correct(x, axis_name: str):
    """`jax.lax.psum` whose backward sums cotangents across shards."""
    return jax.lax.psum(x, axis_name)


def _psum_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


psum_grad_correct.defvjp(_psum_fwd, _psum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def all_gather_grad_correct(x, axis_name: str):
    """`jax.lax.all_gather` (stacked leading axis) whose backward sums the
    gathered cotangents across shards and returns each shard its slot."""
    return jax.lax.all_gather(x, axis_name)


def _ag_fwd(x, axis_name):
    return jax.lax.all_gather(x, axis_name), None


def _ag_bwd(axis_name, _, ct):
    ct = jax.lax.psum(ct, axis_name)  # (p, ...) summed over consumers
    idx = jax.lax.axis_index(axis_name)
    return (jnp.take(ct, idx, axis=0),)


all_gather_grad_correct.defvjp(_ag_fwd, _ag_bwd)


def shard_map_compat(fn, **kwargs):
    """shard_map with the rep/vma check off, across jax versions (the
    pallas calls inside these graphs require the check off; gradient
    correctness comes from the wrappers above — see train/seq_parallel.py).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        return shard_map(fn, check_rep=False, **kwargs)
