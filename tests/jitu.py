"""Shared test helper: cached jitted module.apply.

Eager flax apply dispatches every op as its own XLA program — tens of
seconds per tiny-model forward on a 1-core box. One jitted program per
(module, static kwargs) compiles once, lands in conftest's persistent
compile cache, and makes repeat suite runs cheap.
"""

import functools

import jax


@functools.cache
def japply(module, **static_kw):
    """jitted `module.apply` with `static_kw` closed over (hashables only).

    Runtime args/kwargs (params, arrays, rng=...) pass through traced.
    """
    return jax.jit(functools.partial(module.apply, **static_kw))
