"""scan_layers (O(1)-HLO nn.scan stacks) vs the unrolled layer loops.

The scan path must be a pure compile-time optimization: identical forward
numerics given identical weights (stack_scan_params maps the per-layer
layout onto the stacked one), identical output pytree, and a full
round-trip through unstack_scan_params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.models import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    images_only_config,
    jit_init,
)
from mapanything_tpu.utils.weights import (
    stack_scan_params,
    unstack_scan_params,
)

_TINY = dict(
    encoder_size="test",
    trunk_dim=64,
    trunk_depth=4,
    trunk_num_heads=2,
    trunk_indices=(1, 2),
    dpt_feature_dim=16,
    dpt_out_channels=(16, 16, 16, 16),
    dpt_hidden_dims=(8, 8),
    # fp32: scan vs unrolled is op-for-op identical, so parity is exact.
    # Under bf16 the two paths fuse differently inside XLA (the scan body
    # is one fusion reused per layer; the unrolled stack fuses per layer),
    # which perturbs results at bf16-rounding level — covered separately
    # by test_scan_bf16_close.
    dtype=jnp.float32,
)


def _views(b=1, v=2, h=28, w=42, multimodal=False, seed=0):
    rng = np.random.default_rng(seed)
    views = {"img": jnp.asarray(
        rng.normal(size=(b, v, h, w, 3)).astype(np.float32) * 0.3)}
    if multimodal:
        rays = rng.normal(size=(b, v, h, w, 3)).astype(np.float32)
        rays[..., 2] = np.abs(rays[..., 2]) + 1.0
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        q = rng.normal(size=(b, v, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        views["ray_directions_cam"] = jnp.asarray(rays)
        views["camera_pose_quats"] = jnp.asarray(q)
        views["camera_pose_trans"] = jnp.asarray(
            rng.normal(size=(b, v, 3)).astype(np.float32))
        views["is_metric_scale"] = jnp.ones((b, v), dtype=bool)
    return views


@pytest.mark.parametrize("multimodal", [False, True])
def test_scan_forward_matches_unrolled(multimodal):
    geom = (GeometricInputConfig() if multimodal
            else images_only_config())
    views = _views(multimodal=multimodal)

    base = MapAnything(cfg=MapAnythingConfig(**_TINY))
    params = jit_init(base, jax.random.PRNGKey(0), views, geom)
    ref = jax.jit(lambda p, vw: base.apply(p, vw, geom))(params, views)

    scan = MapAnything(cfg=MapAnythingConfig(**_TINY, scan_layers=True))
    sparams = {"params": stack_scan_params(params["params"])}
    out = jax.jit(lambda p, vw: scan.apply(p, vw, geom))(sparams, views)

    assert set(out) == set(ref)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        np.testing.assert_allclose(
            a, b, rtol=2e-5, atol=2e-5,
            err_msg=f"scan forward diverged on {k}")


def test_scan_bf16_close():
    """bf16 serving path: scan vs unrolled may differ by bf16 rounding
    (different XLA fusion boundaries), but must stay within a few ulps —
    anything larger means a semantic bug, not rounding."""
    cfg = dict(_TINY)
    cfg["dtype"] = jnp.bfloat16
    geom = images_only_config()
    views = _views()
    base = MapAnything(cfg=MapAnythingConfig(**cfg))
    params = jit_init(base, jax.random.PRNGKey(0), views, geom)
    ref = jax.jit(lambda p, vw: base.apply(p, vw, geom))(params, views)
    scan = MapAnything(cfg=MapAnythingConfig(**cfg, scan_layers=True))
    sparams = {"params": stack_scan_params(params["params"])}
    out = jax.jit(lambda p, vw: scan.apply(p, vw, geom))(sparams, views)
    for k in ref:
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(out[k], np.float32)
        vals = np.unique(a)
        if vals.size <= 2 and set(vals.tolist()) <= {0.0, 1.0}:
            # binary mask: rounding near the confidence threshold flips
            # individual pixels — bound the flip FRACTION instead
            assert float(np.mean(a != b)) < 0.02, (
                f"bf16 scan path flipped too many {k} pixels")
            continue
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / scale < 0.06, (
            f"bf16 scan path diverged beyond rounding on {k}")


def test_scan_param_structure_matches_init():
    """jit_init on a scan model and stack_scan_params(unrolled init) must
    produce the same tree structure and shapes."""
    views = _views()
    geom = images_only_config()
    base = MapAnything(cfg=MapAnythingConfig(**_TINY))
    scan = MapAnything(cfg=MapAnythingConfig(**_TINY, scan_layers=True))
    p_base = jit_init(base, jax.random.PRNGKey(0), views, geom)
    p_scan = jit_init(scan, jax.random.PRNGKey(0), views, geom)
    stacked = {"params": stack_scan_params(p_base["params"])}
    ja, jb = jax.tree_util.tree_structure(stacked), \
        jax.tree_util.tree_structure(p_scan)
    assert ja == jb
    for a, b in zip(jax.tree_util.tree_leaves(stacked),
                    jax.tree_util.tree_leaves(p_scan)):
        assert a.shape == b.shape


def test_stack_unstack_roundtrip():
    views = _views()
    geom = images_only_config()
    base = MapAnything(cfg=MapAnythingConfig(**_TINY))
    params = jit_init(base, jax.random.PRNGKey(0), views, geom)["params"]
    rt = unstack_scan_params(stack_scan_params(params))
    assert (jax.tree_util.tree_structure(rt)
            == jax.tree_util.tree_structure(dict(params)))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_grad_parity():
    """Training path: grads through the scanned stacks equal the unrolled
    grads (mapped through the layout converters)."""
    from mapanything_tpu.data.synthetic import make_synthetic_batch
    from mapanything_tpu.train.losses import OverallLossConfig, overall_loss

    batch = make_synthetic_batch(1, 2, 28, 42, seed=0)
    geom = GeometricInputConfig()
    base = MapAnything(cfg=MapAnythingConfig(
        **_TINY, encoder_gradient_checkpointing=True,
        trunk_gradient_checkpointing=True))
    scan = MapAnything(cfg=MapAnythingConfig(
        **_TINY, scan_layers=True, encoder_gradient_checkpointing=True,
        trunk_gradient_checkpointing=True))
    params = jit_init(base, jax.random.PRNGKey(0), batch["views"], geom)

    def loss(model):
        def f(p):
            preds = model.apply(p, batch["views"], geom)
            total, _ = overall_loss(batch["gt"], preds, OverallLossConfig())
            return total
        return f

    g_base = jax.jit(jax.grad(loss(base)))(params)
    sparams = {"params": stack_scan_params(params["params"])}
    g_scan = jax.jit(jax.grad(loss(scan)))(sparams)
    g_scan_unrolled = {"params": unstack_scan_params(g_scan["params"])}

    leaves_a = jax.tree_util.tree_leaves_with_path(g_base)
    leaves_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_scan_unrolled))
    for k, a in leaves_a:
        b = leaves_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad diverged at {jax.tree_util.keystr(k)}")
