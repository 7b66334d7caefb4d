"""Misc utilities (rebuild of mapanything/utils/misc.py + device.py +
parallel.py host helpers — SURVEY.md §2.1 last row).

seeding, stream-to-logger redirection, invalid-value masking, thread-pool
maps, and host<->device transfer helpers."""

from __future__ import annotations

import logging
import random
import sys
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Callable, Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def seed_everything(seed: int) -> None:
    """Seed python/numpy RNGs (jax threads keys explicitly by design)."""
    random.seed(seed)
    np.random.seed(seed)


class StreamToLogger:
    """Redirect a stream (stdout/stderr) through logging
    (reference misc.py:18)."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buf = ""

    def write(self, buf: str):
        self._buf += buf
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line:
                self.logger.log(self.level, line)

    def flush(self):
        if self._buf:
            self.logger.log(self.level, self._buf)
            self._buf = ""


def redirect_output_to_logger(logger: logging.Logger) -> None:
    sys.stdout = StreamToLogger(logger, logging.INFO)
    sys.stderr = StreamToLogger(logger, logging.ERROR)


def invalid_to_nans(arr: jnp.ndarray, valid_mask: Optional[jnp.ndarray],
                    ndim: int = 999) -> jnp.ndarray:
    """Set invalid entries to NaN (reference misc.py invalid_to_nans)."""
    if valid_mask is not None:
        arr = jnp.where(valid_mask[..., None], arr, jnp.nan)
    if arr.ndim > ndim:
        arr = arr.reshape((-1,) + arr.shape[-(ndim - 1):])
    return arr


def invalid_to_zeros(arr: jnp.ndarray, valid_mask: Optional[jnp.ndarray],
                     ndim: int = 999):
    """Zero invalid entries + count valid per batch (misc.py invalid_to_zeros)."""
    if valid_mask is not None:
        arr = arr * valid_mask[..., None]
        nnz = valid_mask.reshape(valid_mask.shape[0], -1).sum(axis=-1)
    else:
        nnz = np.prod(arr.shape[1:-1])
    if arr.ndim > ndim:
        arr = arr.reshape((-1,) + arr.shape[-(ndim - 1):])
    return arr, nnz


def thread_map(fn: Callable, items: Iterable, max_workers: int = 8) -> List[Any]:
    """Ordered threaded map (reference parallel.py equivalents)."""
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(fn, items))


def process_map(fn: Callable, items: Iterable, max_workers: int = 8) -> List[Any]:
    with ProcessPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(fn, items))


def to_device(tree, device=None):
    """Host pytree -> device arrays (reference device.py:14 'to' helpers)."""
    if device is None:
        device = jax.devices()[0]
    return jax.device_put(jax.tree_util.tree_map(jnp.asarray, tree), device)


def to_host(tree):
    """Device pytree -> numpy."""
    return jax.tree_util.tree_map(np.asarray, tree)
