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


def save_train_state(path: str, state, best_so_far: float | None = None,
                     epoch: int | None = None) -> None:
    """Save the full training state (params + optimizer + step).

    ``epoch`` records the number of COMPLETED epochs; deriving it from
    step//len(loader) on resume undercounts with the dynamic
    views->batch-size sampler (its __len__ divides by the max batch size,
    not the realized mix)."""
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if best_so_far is not None:
        tree["best_so_far"] = jax.numpy.asarray(best_so_far)
    if epoch is not None:
        tree["epoch"] = jax.numpy.asarray(epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), tree, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, state):
    """Restore a training state saved by save_train_state onto `state`'s
    structure; returns (state, best_so_far or None, epoch or None)."""
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr = ocp.StandardCheckpointer()
    best = epoch = None
    for extras in ({"best_so_far": jax.numpy.zeros(()),
                    "epoch": jax.numpy.zeros((), jax.numpy.int32)},
                   {"epoch": jax.numpy.zeros((), jax.numpy.int32)},
                   {"best_so_far": jax.numpy.zeros(())},
                   {}):
        try:
            restored = ckptr.restore(_abs(path), {**template, **extras})
            if "epoch" in extras:
                epoch = int(restored.pop("epoch"))
            if "best_so_far" in extras:
                best = float(restored.pop("best_so_far"))
            break
        except Exception:
            continue
    else:
        restored = ckptr.restore(_abs(path), template)
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, best, epoch
