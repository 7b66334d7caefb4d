"""Analytic FLOP counts of the flagship architecture.

Used by the A100 baseline measurement (scripts/measure_reference_baseline.py)
and by bench.py's MFU / kernel-telemetry extras, so the numerator of every
efficiency claim comes from ONE model, not per-script arithmetic.

Multiply-accumulate is counted as 2 FLOPs throughout. Reference
architecture: mapanything/models/mapanything/model.py (DINOv2 ViT-L/14
encoder, 24-layer alternating-attention trunk, DPT heads).
"""

from __future__ import annotations

# v5e (TPU v5 lite) bf16 peak, one chip. Public spec: 197 TFLOP/s.
V5E_BF16_PEAK_FLOPS = 197e12


def vit_layer_flops(tokens: int, dim: int) -> int:
    """One pre-LN transformer block: fused qkv+proj, qk^T + att*v, MLP x4."""
    attn_lin = 2 * tokens * 4 * dim * dim        # qkv + out projections
    attn_mm = 2 * 2 * tokens * tokens * dim      # qk^T and att @ v
    mlp = 2 * tokens * 2 * 4 * dim * dim         # fc1 + fc2 (ratio 4)
    return attn_lin + attn_mm + mlp


def attention_matmul_flops(n: int, dim: int) -> int:
    """Just the two score/value matmuls of one attention over n tokens —
    the part a flash kernel executes (qk^T + att @ v)."""
    return 2 * 2 * n * n * dim


def analytic_flops(res_h: int, views: int, res_w: int | None = None) -> dict:
    """Forward FLOPs of the flagship at (res_h, res_w) per-view resolution.

    Returns a dict with encoder / trunk / dpt / total / per_view entries,
    matching the decomposition BASELINE.md's analytic row was derived from.
    """
    if res_w is None:
        res_w = res_h
    p = 14
    gh, gw = res_h // p, res_w // p
    g2 = gh * gw
    n = g2 + 1  # patches + cls
    dim = 1024

    # DINOv2 ViT-L/14: 24 layers, frame attention per view, + patch embed
    enc = views * (24 * vit_layer_flops(n, dim) + 2 * n * (p * p * 3) * dim)
    # trunk: 24 alternating layers — 12 frame (per-view tokens) + 12 global
    # (all views' tokens together, + scale token)
    frame = 12 * views * vit_layer_flops(n, dim)
    glob = 12 * vit_layer_flops(views * n + 1, dim)
    trunk = frame + glob + views * 2 * n * dim * dim  # input projection
    # DPT: 4 hook projections + fusion refinement pyramid + full-res tail
    f = 256
    dpt = views * (
        4 * 2 * g2 * dim * f                              # hook 1x1 convs
        + sum(2 * g2 * (k * k) * f * f * 9 * 2 for k in (1, 2, 4, 8))
        + 2 * res_h * res_w * f * (f // 2) * 9            # output_conv1 3x3
        + 2 * res_h * res_w * (f // 2) * 32 * 9           # regressor 3x3
    )
    total = enc + trunk + dpt
    return {"encoder": enc, "trunk": trunk, "dpt": dpt, "total": total,
            "per_view": total / views}


def train_step_flops(res_h: int, views: int, res_w: int | None = None) -> int:
    """Model FLOPs of one fwd+bwd at the given shape, PaLM convention:
    backward costs 2x forward, rematerialization recompute NOT counted
    (so the derived utilization is model-FLOPs utilization, comparable
    across remat policies)."""
    return 3 * analytic_flops(res_h, views, res_w)["total"]


def global_attention_tokens(res_h: int, views: int,
                            res_w: int | None = None) -> int:
    """Token count one trunk GLOBAL attention layer sees at this shape."""
    if res_w is None:
        res_w = res_h
    p = 14
    n = (res_h // p) * (res_w // p) + 1
    return views * n + 1
