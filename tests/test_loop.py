"""train_one_epoch smoke tests: per-iteration explosion tripwire + logging.

The tripwire must fire on EVERY iteration (reference training.py:480-509),
not only at print_freq boundaries — round-1 VERDICT weak item 6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mapanything_tpu.train.loop import TrainLoopConfig, train_one_epoch
from mapanything_tpu.train.step import TrainState


class _FakeLoader:
    """Yields tiny batches shaped like the real loader's output."""

    def __init__(self, n=6):
        self.n = n

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {
                "views": {"img": np.zeros((1, 2, 4, 4, 3), np.float32)},
                "gt": {"x": np.full((3,), float(i), np.float32)},
            }


def _toy_state():
    params = {"params": {"w": jnp.ones((3,), jnp.float32)}}
    tx = optax.sgd(0.1)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def _toy_step(explode_at=None):
    def step(state, batch, rng):
        loss = jnp.mean((state.params["params"]["w"] - batch["gt"]["x"]) ** 2)
        if explode_at is not None:
            # make the loss non-finite on one specific host-side batch value
            loss = jnp.where(batch["gt"]["x"][0] == explode_at,
                             jnp.nan, loss)
        grads = jax.grad(
            lambda p: jnp.mean((p["params"]["w"] - batch["gt"]["x"]) ** 2)
        )(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step)


def test_train_one_epoch_runs(tmp_path):
    cfg = TrainLoopConfig(output_dir=str(tmp_path), print_freq=3)
    state, rng = train_one_epoch(
        None, _toy_state(), _toy_step(), _FakeLoader(6), epoch=0,
        loop_cfg=cfg, rng=jax.random.PRNGKey(0),
        log_path=str(tmp_path / "log.txt"),
    )
    assert int(state.step) == 6


@pytest.mark.parametrize("explode_at", [1.0, 4.0])
def test_explosion_fires_on_any_iteration(tmp_path, explode_at):
    """NaN at a non-print_freq iteration must still be caught (one-step
    delayed check), dumping the batch and exiting non-zero."""
    cfg = TrainLoopConfig(output_dir=str(tmp_path), print_freq=3)
    with pytest.raises(SystemExit):
        train_one_epoch(
            None, _toy_state(), _toy_step(explode_at=explode_at),
            _FakeLoader(6), epoch=0, loop_cfg=cfg,
            rng=jax.random.PRNGKey(0), log_path=str(tmp_path / "log.txt"),
        )
    dumps = list((tmp_path / "explosion_dump").glob("batch_*.npz"))
    assert len(dumps) == 1
