"""Optimizer unit tests.

Guards the round-1 VERDICT fix: grad clipping must be ONE global norm across
all parameter groups (reference training.py:515-525, train_tools.py:406-466),
not a per-group clip inside each multi_transform branch (which allows a
combined norm of up to sqrt(n_groups) and erases the relative magnitude
between the encoder and the rest).
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from mapanything_tpu.train.step import OptimConfig, make_optimizer


def _params():
    return {
        "params": {
            "encoder": {"w": jnp.zeros((4,), jnp.float32)},
            "trunk": {"w": jnp.zeros((4,), jnp.float32)},
        }
    }


def _grads(enc_scale, rest_scale):
    base = jnp.array([1.0, -2.0, 3.0, -4.0], jnp.float32)
    return {
        "params": {
            "encoder": {"w": base * enc_scale},
            "trunk": {"w": base * rest_scale},
        }
    }


def _run_two_steps(tx, g1, g2):
    params = _params()
    state = tx.init(params)
    for g in (g1, g2):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def _oracle_tx(cfg, params, clip_global: bool):
    """Independently-constructed optax chain: [global clip →] per-group adamw
    [→ per-group clip inside each branch when clip_global=False]."""
    from mapanything_tpu.train.step import _group_label, cosine_schedule

    schedule = cosine_schedule(cfg)

    def adamw(scale, with_clip):
        parts = [optax.clip_by_global_norm(cfg.grad_clip)] if with_clip else []
        parts += [
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lambda step: schedule(step) * scale),
        ]
        return optax.chain(*parts)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_label(path), params
    )
    mt = optax.multi_transform(
        {
            "encoder": adamw(cfg.encoder_lr_scale, not clip_global),
            "rest": adamw(1.0, not clip_global),
        },
        labels,
    )
    if clip_global:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), mt)
    return mt


def test_grad_clip_is_global_across_groups():
    cfg = OptimConfig(warmup_steps=1, total_steps=10)
    tx = make_optimizer(cfg, _params())

    # Two steps with grads well above the clip threshold and *different*
    # encoder-vs-rest magnitude ratios. A global clip preserves the ratio;
    # a per-group clip destroys it — distinguishable after step 2 (adam's
    # step-1 update is elementwise sign, so one step cannot tell them apart).
    g1, g2 = _grads(30.0, 40.0), _grads(40.0, 30.0)

    ours = _run_two_steps(tx, g1, g2)
    global_oracle = _run_two_steps(_oracle_tx(cfg, _params(), True), g1, g2)
    pergroup = _run_two_steps(_oracle_tx(cfg, _params(), False), g1, g2)

    flat = lambda t: jnp.concatenate(  # noqa: E731
        [x.ravel() for x in jax.tree_util.tree_leaves(t)]
    )
    assert jnp.allclose(flat(ours), flat(global_oracle), atol=1e-7)
    assert not jnp.allclose(flat(ours), flat(pergroup), atol=1e-7)


def test_clipped_combined_norm_at_most_one():
    cfg = OptimConfig(warmup_steps=1, total_steps=10)
    # Extract what adam actually sees by running the public optimizer on an
    # identity-like config is impossible (adam normalizes); instead assert on
    # the clip primitive exactly as make_optimizer composes it: one clip over
    # the FULL tree.
    clip = optax.clip_by_global_norm(cfg.grad_clip)
    g = _grads(30.0, 40.0)
    clipped, _ = clip.update(g, clip.init(_params()), _params())
    assert float(optax.global_norm(clipped)) <= 1.0 + 1e-6
    # ratio between groups preserved (30:40)
    enc = float(optax.global_norm(clipped["params"]["encoder"]))
    rest = float(optax.global_norm(clipped["params"]["trunk"]))
    assert enc / rest == pytest.approx(30.0 / 40.0, rel=1e-5)


def test_weight_decay_skips_1d_params():
    """Reference get_parameter_groups (train_tools.py:833-834) gives 1-D
    tensors and biases weight_decay=0; the optax chain must mask them."""
    cfg = OptimConfig(lr=0.0, warmup_steps=0, total_steps=10,
                      weight_decay=0.1)
    params = {
        "params": {
            "trunk": {
                "kernel": jnp.ones((3, 3), jnp.float32),
                "bias": jnp.ones((3,), jnp.float32),
            }
        }
    }
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # lr=0 -> scale_by_learning_rate zeroes everything INCLUDING the decay
    # term; use a tiny lr instead to see the decay through
    cfg = OptimConfig(lr=1.0, min_lr=1.0, warmup_steps=0, total_steps=10,
                      weight_decay=0.1)
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    kernel_upd = updates["params"]["trunk"]["kernel"]
    bias_upd = updates["params"]["trunk"]["bias"]
    assert float(jnp.abs(kernel_upd).max()) > 0  # kernels decay
    assert float(jnp.abs(bias_upd).max()) == 0  # 1-D params do not
