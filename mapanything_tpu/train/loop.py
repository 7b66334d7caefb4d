"""Training loop driver (rebuild of mapanything/train/training.py +
train_tools.py MetricLogger/SmoothedValue).

Epoch structure mirrors the reference (an "epoch" is a dataset chunk,
training.py:43-336): per-epoch eval with frozen val samples, best-checkpoint
tracking on median val loss, save last/best/keep_freq, auto-resume, loss
explosion tripwire (dump batch + debug checkpoint + exit,
training.py:480-509).

TPU specifics:
  * one jitted train step (train/step.py) — grad all-reduce is GSPMD's psum,
    there is no DDP wrapper;
  * bf16 forward with fp32 params — no GradScaler;
  * host metrics are fetched once per print_freq (a host fetch is the only
    reliable completion barrier over the axon tunnel).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import jit_init, GeometricInputConfig, MapAnything, aug_training_config
from .checkpoints import load_train_state, save_train_state
from .losses import OverallLossConfig
from .step import OptimConfig, TrainState, create_train_state, make_train_step


class SmoothedValue:
    """Windowed + global average tracker (train_tools.py:34)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value,
        )


class MetricLogger:
    """Iteration logger with ETA (train_tools.py:98)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        n = len(iterable) if hasattr(iterable, "__len__") else None
        end = time.time()
        for i, obj in enumerate(iterable):
            yield i, obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % print_freq == 0:
                if n:
                    eta = iter_time.avg * (n - i)
                    eta_str = f"eta: {int(eta // 60)}:{int(eta % 60):02d}"
                else:
                    eta_str = ""
                print(f"{header} [{i}{f'/{n}' if n else ''}] {eta_str} "
                      f"{self} time/it: {iter_time}")
        total = time.time() - start
        print(f"{header} done in {total:.1f}s")


@dataclasses.dataclass
class TrainLoopConfig:
    output_dir: str = "./out"
    epochs: int = 10
    print_freq: int = 10
    save_freq: int = 1  # save checkpoint-last every N epochs
    keep_freq: int = 0  # additionally keep checkpoint-{epoch} every N epochs
    eval_freq: int = 1
    loss_explosion_thresh: float = 1000.0
    seed: int = 0
    resume: bool = True
    num_views_sample_key: Optional[int] = None


def train(
    model: MapAnything,
    train_loader,
    loop_cfg: TrainLoopConfig,
    optim_cfg: OptimConfig,
    geom_cfg: GeometricInputConfig = aug_training_config(),
    loss_cfg: OverallLossConfig = OverallLossConfig(),
    test_loaders: Optional[Dict[str, Any]] = None,
    init_params=None,
    mesh=None,
):
    """Run the full training loop. Returns the final TrainState.

    With `mesh` (a ("data", "model") jax.sharding.Mesh, parallel/mesh.py),
    params are placed by the partition rules and every batch is data-sharded
    before the step — GSPMD inserts the DP psum / TP collectives
    (SURVEY.md §2.5; validated by __graft_entry__.dryrun_multichip)."""
    os.makedirs(loop_cfg.output_dir, exist_ok=True)
    log_path = os.path.join(loop_cfg.output_dir, "log.txt")

    rng = jax.random.PRNGKey(loop_cfg.seed)

    # --- init params from the first batch's shapes ---
    train_loader.set_epoch(0)
    first_batch = next(iter(train_loader))
    views0 = {k: jnp.asarray(v) for k, v in first_batch["views"].items()}
    if init_params is None:
        init_params = jit_init(model, rng, views0, geom_cfg,
                                 rng=jax.random.PRNGKey(1))
    if mesh is not None:
        from ..parallel import shard_params

        # optimizer moments inherit the param placements (zeros_like keeps
        # shardings), so sharding before create_train_state covers opt_state
        init_params = shard_params(init_params, mesh)
    state = create_train_state(model, init_params, optim_cfg)

    # --- resume (training.py:213-224) ---
    best_so_far = None
    last_path = os.path.join(loop_cfg.output_dir, "checkpoint-last")
    start_epoch = 0
    if loop_cfg.resume and os.path.isdir(last_path):
        state, best_so_far, ckpt_epoch = load_train_state(last_path, state)
        if ckpt_epoch is not None:
            start_epoch = ckpt_epoch
        else:
            # legacy checkpoints without the epoch field: derive from the
            # step count (exact for fixed batch sizes; the dynamic sampler
            # yields more batches than len(), so this can over-skip —
            # which is why new checkpoints store the epoch)
            start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed from {last_path} at step {int(state.step)} "
              f"(epoch {start_epoch})")

    from .step import jit_train_step

    train_step = jit_train_step(make_train_step(model, geom_cfg, loss_cfg),
                                mesh=mesh)

    for epoch in range(start_epoch, loop_cfg.epochs):
        # ---- eval ----
        if test_loaders and epoch % loop_cfg.eval_freq == 0:
            val_stats = {}
            for name, loader in test_loaders.items():
                val_stats[name] = test_one_epoch(
                    model, state.params, loader, loss_cfg, epoch=epoch,
                    name=name,
                )
            median_val = float(np.median([v["loss_med"] for v in val_stats.values()]))
            if best_so_far is None or median_val < best_so_far:
                best_so_far = median_val
                save_train_state(
                    os.path.join(loop_cfg.output_dir, "checkpoint-best"),
                    state, best_so_far, epoch=epoch,
                )
                print(f"epoch {epoch}: new best val loss {best_so_far:.4f}")

        # ---- train one epoch (training.py:386) ----
        # The per-epoch rng is DERIVED from (seed, epoch), not threaded
        # across epochs: a kill+resume at any epoch boundary then replays
        # the identical rng stream the uninterrupted run would have used,
        # making auto-resume trajectory-exact (reference relies on
        # torchrun restarts + resume, training.py:213-224; its unseeded
        # CUDA rng has no such guarantee).
        epoch_rng = jax.random.fold_in(jax.random.PRNGKey(loop_cfg.seed),
                                       epoch + 1)
        state, _ = train_one_epoch(
            model, state, train_step, train_loader, epoch, loop_cfg,
            epoch_rng, log_path, mesh=mesh,
        )

        # ---- checkpoints (training.py:237-285) ----
        if (epoch + 1) % loop_cfg.save_freq == 0:
            save_train_state(last_path, state, best_so_far, epoch=epoch + 1)
        if loop_cfg.keep_freq and (epoch + 1) % loop_cfg.keep_freq == 0:
            save_train_state(
                os.path.join(loop_cfg.output_dir, f"checkpoint-{epoch}"),
                state, best_so_far, epoch=epoch + 1,
            )
    return state


def train_one_epoch(model, state, train_step, loader, epoch, loop_cfg, rng,
                    log_path, mesh=None):
    logger = MetricLogger()
    loader.set_epoch(epoch)
    n_steps = 0

    # The explosion tripwire runs EVERY iteration (reference training.py:
    # 480-509) but fetches the loss one step late: the host check of step i
    # happens after step i+1 has been dispatched, so the device pipeline is
    # never stalled and at most ONE step trains on a post-explosion state.
    pending = None  # (metrics, host_batch, iter_idx, n_views)

    def _check(metrics_i, batch_i, idx, n_views_i):
        loss_i = float(metrics_i["loss"])  # host fetch = completion barrier
        if not np.isfinite(loss_i) or loss_i > loop_cfg.loss_explosion_thresh:
            _dump_explosion(loop_cfg.output_dir, batch_i, state, loss_i,
                            epoch, idx)
        if idx % loop_cfg.print_freq == 0:
            logger.update(
                loss=loss_i, grad_norm=float(metrics_i["grad_norm"]),
                n_views=n_views_i,
            )

    for i, batch in logger.log_every(loader, loop_cfg.print_freq,
                                     header=f"Epoch [{epoch}]"):
        jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
        if mesh is not None:
            jbatch = _global_batch(jbatch, mesh)
        n_views = jbatch["views"]["img"].shape[1]
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, jbatch, step_rng)

        if pending is not None:
            _check(*pending)
        pending = (metrics, batch, i, n_views)
        n_steps += 1

    if pending is not None:
        _check(*pending)

    with open(log_path, "a") as f:
        f.write(json.dumps({
            "epoch": epoch,
            "train_loss_med": logger.meters["loss"].median,
            "train_loss_avg": logger.meters["loss"].global_avg,
            "steps": n_steps,
        }) + "\n")
    return state, rng


def _global_batch(jbatch, mesh):
    """Data-shard a host batch over the mesh. Single-process: placement via
    NamedSharding; multi-host: each process's local shard is assembled into
    one global array (the jax replacement for DistributedSampler+NCCL)."""
    import jax as _jax

    if _jax.process_count() > 1:
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as _P

        return multihost_utils.host_local_array_to_global_array(
            jbatch, mesh, _P("data")
        )
    from ..parallel import shard_batch

    return shard_batch(jbatch, mesh)


@functools.lru_cache(maxsize=8)
def _eval_step(model, loss_cfg):
    """One jitted eval step per (model, loss_cfg) — defining the closure
    inside test_one_epoch would defeat jax.jit's identity-keyed cache and
    retrace/recompile the full model every epoch."""
    from ..models import images_only_config
    from .losses import overall_loss

    @jax.jit
    def eval_step(params, batch):
        preds = model.apply(params, batch["views"], images_only_config())
        total, details = overall_loss(batch["gt"], preds, loss_cfg)
        return total

    return eval_step


def test_one_epoch(model, params, loader, loss_cfg, epoch=0, name="val"):
    """Frozen-sample validation (training.py:575): deterministic geom config,
    all priors off (images-only), median loss tracked."""
    eval_step = _eval_step(model, loss_cfg)

    loader.set_epoch(0)  # frozen val samples across epochs
    losses = []
    for batch in loader:
        jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
        losses.append(float(eval_step(params, jbatch)))
    stats = {
        "loss_med": float(np.median(losses)) if losses else float("nan"),
        "loss_avg": float(np.mean(losses)) if losses else float("nan"),
    }
    print(f"[eval {name}] epoch {epoch}: median {stats['loss_med']:.4f} "
          f"avg {stats['loss_avg']:.4f} over {len(losses)} batches")
    return stats


def _dump_explosion(output_dir, batch, state, loss, epoch, it):
    """Loss-explosion forensics (training.py:480-509): dump the exact batch
    + a debug checkpoint, then exit non-zero."""
    dump_dir = os.path.join(output_dir, "explosion_dump")
    os.makedirs(dump_dir, exist_ok=True)
    flat = {}
    for grp, tree in batch.items():
        for k, v in tree.items():
            flat[f"{grp}.{k}"] = np.asarray(v)
    np.savez(os.path.join(dump_dir, f"batch_e{epoch}_i{it}.npz"), **flat)
    # NOTE: the pipelined tripwire checks step i after step i+1 dispatched,
    # so this state is POST-explosion (one update past the dumped batch) —
    # useful for inspecting the damage, but replay from clean weights must
    # start from checkpoint-last (the reference dumps pre-step state,
    # training.py:480-509; keeping a pre-step copy here would double
    # param memory since the step donates its input state).
    save_train_state(os.path.join(dump_dir, "checkpoint-post-explosion"),
                     state)
    print(f"LOSS EXPLOSION ({loss}) at epoch {epoch} iter {it}; "
          f"batch + POST-explosion checkpoint dumped to {dump_dir} "
          "(replay from checkpoint-last for clean weights)",
          file=sys.stderr)
    sys.exit(1)


# ---------------------------------------------------------------------------
# Dataset-mix DSL (training.py:122 / datasets/__init__.py:35)
# ---------------------------------------------------------------------------


def build_dataset_mix(spec: str, **context):
    """Evaluate a dataset-mix expression like
    "100 @ WAIDataset(spec='eth3d', ...) + 50 @ WAIDataset(...)".

    Same DSL surface as the reference's eval(dataset_str) but with an explicit
    namespace (only dataset constructors + provided context)."""
    from ..data.wai_datasets import WAIDataset, make_wai_dataset

    namespace = {"WAIDataset": WAIDataset, "make_wai_dataset": make_wai_dataset}
    namespace.update(context)
    return eval(spec, {"__builtins__": {}}, namespace)  # noqa: S307
