"""Optimizer, LR schedules, and the jitted/sharded training step.

Rebuild of the reference training loop internals (training.py:386-573,
train_tools.py:406-983) the TPU way:

  * AdamW(0.9, 0.95) with per-submodule parameter groups (train_tools.py:760):
    the encoder gets a lower LR multiplier (configs/train_params/
    lower_encoder_lr_64g.yaml) — implemented with optax multi_transform;
  * per-iteration cosine schedule with linear warmup (train_tools.py:874);
  * grad clip 1.0 (training.py:515-525) — optax.clip_by_global_norm;
  * grad accumulation (training.py:432) — optax.MultiSteps;
  * bf16 forward with fp32 params/optimizer state — native TPU mixed
    precision, no GradScaler needed (bf16 has fp32's exponent range; the
    reference's NativeScalerWithGradNormCount exists for fp16);
  * DP/TP via jax.jit over a Mesh (parallel/mesh.py): gradient all-reduce is
    the psum XLA inserts for data-sharded batches — the DDP replacement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import GeometricInputConfig, MapAnything
from .losses import OverallLossConfig, overall_loss


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-4
    encoder_lr_scale: float = 0.05  # 1e-5 / 2e-4 (lower_encoder_lr_64g.yaml)
    warmup_steps: int = 1000
    total_steps: int = 100_000
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0
    accum_steps: int = 1


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def cosine_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup + cosine decay to min_lr (train_tools.py:874)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.total_steps,
        end_value=cfg.min_lr,
    )


def _group_label(path) -> str:
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top == "params":
        top = (path[1].key if hasattr(path[1], "key") else str(path[1]))
    return "encoder" if top == "encoder" else "rest"


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    schedule = cosine_schedule(cfg)

    def _decay_mask(tree):
        # the reference excludes biases and every 1-D tensor (LayerNorm/
        # LayerScale gammas, pos embeds collapsed to vectors) from weight
        # decay (train_tools.py get_parameter_groups :833-834)
        return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, tree)

    def adamw(scale: float):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2),
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * scale
            ),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_label(path), params
    )
    # One GLOBAL clip across all parameter groups, ahead of the per-group
    # transforms — the reference clips a single combined norm to 1.0
    # (training.py:515-525, train_tools.py:406-466); clipping per group
    # would allow a combined norm of up to sqrt(n_groups).
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {"encoder": adamw(cfg.encoder_lr_scale), "rest": adamw(1.0)}, labels
        ),
    )
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def create_train_state(
    model: MapAnything, params, optim_cfg: OptimConfig
) -> TrainState:
    tx = make_optimizer(optim_cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(
    model: MapAnything,
    geom_cfg: GeometricInputConfig,
    loss_cfg: OverallLossConfig = OverallLossConfig(),
) -> Callable:
    """Build the pure train-step function: (state, batch, rng) -> (state, metrics).

    `batch` carries the stacked views (model inputs) AND the GT supervision
    keys (pts3d, pts3d_cam, valid_mask, non_ambiguous_mask, ...)."""

    def loss_fn(params, batch, rng):
        preds = model.apply(params, batch["views"], geom_cfg, rng=rng)
        total, details = overall_loss(batch["gt"], preds, loss_cfg)
        return total, details

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, **details}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh=None, batch_spec=None):
    """jit the step.

    Without a mesh this is `jax.jit(step, donate_argnums=(0,))` — placement
    shardings on state/batch still propagate (the loop's `shard_batch` path).
    With a mesh, the batch argument is CONSTRAINED to `batch_spec` (default:
    leading axis over the "data" mesh axis) so a host-resident batch is
    data-sharded even if the caller forgot to place it; state and rng are
    left unspecified so params keep their placement shardings and GSPMD
    inserts the collectives.
    """
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec

    spec = batch_spec if batch_spec is not None else PartitionSpec("data")
    batch_sharding = NamedSharding(mesh, spec)
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        # pytree-prefix: one sharding broadcast over every batch leaf
        in_shardings=(None, batch_sharding, None),
    )
