"""Checkpoint save/load via orbax (replaces torch.save master-only flow).

Rebuild of train_tools.py:549-629 (save_model/load_model) on orbax:
  * async-capable, multi-host-safe array checkpoints;
  * the saved tree is {"params", "opt_state", "step", "best_so_far"} —
    the same logical contents as the reference's
    {"model", "optimizer", "epoch", "best_so_far"} (no GradScaler: bf16
    training needs none);
  * `save_params`/`load_params` handle inference-only param trees.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_params(path: str, params: Any) -> None:
    """Save an inference params pytree."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    """Load a params pytree (optionally restored onto a template's
    shardings/dtypes)."""
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(_abs(path), template)
    return ckptr.restore(_abs(path))


def save_train_state(path: str, state, best_so_far: float | None = None) -> None:
    """Save the full training state (params + optimizer + step)."""
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if best_so_far is not None:
        tree["best_so_far"] = jax.numpy.asarray(best_so_far)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), tree, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, state):
    """Restore a training state saved by save_train_state onto `state`'s
    structure; returns (state, best_so_far or None)."""
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(_abs(path), {**template, "best_so_far": jax.numpy.zeros(())})
        best = float(restored.pop("best_so_far"))
    except Exception:
        restored = ckptr.restore(_abs(path), template)
        best = None
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, best
