"""Multi-frame 2D point tracking, pure jax (coarse-to-fine NCC).

TPU-native replacement for the reference's VGGSfM track predictor
(third_party/track_predict.py:23, used by scripts/demo_colmap.py:449). The
reference notes any tracker can supply `pred_tracks` (demo_colmap.py:446
"You can also change the pred_tracks to tracks from any other methods");
here a batched pyramid normalized-cross-correlation tracker runs the whole
search on device:

  * grayscale pyramid by 2x average pooling (static levels),
  * per level: extract a (K, K) patch around the current estimate in the
    query frame, correlate against a (K+2R, K+2R) search window in the
    target frame (unrolled static shifts -> VPU work, no gathers),
  * argmax + quadratic subpixel refinement, estimate carried to the next
    finer level,
  * visibility score = final-level NCC peak value.

Everything is vmapped over points and scanned over frames — one jit, no
host loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def to_gray(images: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, H, W) luma."""
    w = jnp.asarray([0.299, 0.587, 0.114], images.dtype)
    return jnp.einsum("...c,c->...", images, w)


def build_pyramid(gray: jnp.ndarray, levels: int) -> list:
    """List of (N, H/2^l, W/2^l), fine -> coarse."""
    pyr = [gray]
    x = gray
    for _ in range(levels - 1):
        n, h, w = x.shape
        x = x[:, : h // 2 * 2, : w // 2 * 2]
        x = x.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        pyr.append(x)
    return pyr


def _extract_patch(img: jnp.ndarray, center: jnp.ndarray, size: int):
    """(size, size) patch around center (y, x) with bilinear sampling.

    Static shapes: offsets are a constant grid; sampling uses one
    dynamic_slice-free gather expressed as integer indexing on a padded
    image (clamped)."""
    h, w = img.shape
    half = (size - 1) / 2.0
    dy = jnp.arange(size, dtype=jnp.float32) - half
    yy = center[0] + dy  # (size,)
    xx = center[1] + dy
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 2)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    p00 = img[y0[:, None], x0[None, :]]
    p01 = img[y0[:, None], x0[None, :] + 1]
    p10 = img[y0[:, None] + 1, x0[None, :]]
    p11 = img[y0[:, None] + 1, x0[None, :] + 1]
    top = p00 * (1 - fx)[None, :] + p01 * fx[None, :]
    bot = p10 * (1 - fx)[None, :] + p11 * fx[None, :]
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def _ncc_search(ref_patch: jnp.ndarray, win: jnp.ndarray, radius: int):
    """NCC of ref_patch (K,K) against every integer shift in win
    (K+2R, K+2R); returns (best dy, best dx, peak ncc) with subpixel fit."""
    k = ref_patch.shape[0]
    rp = ref_patch - ref_patch.mean()
    rn = jnp.sqrt(jnp.sum(rp * rp) + 1e-8)

    n = 2 * radius + 1
    # stack shifted windows: (n*n, K, K) via static slices
    cands = jnp.stack([
        win[dy : dy + k, dx : dx + k]
        for dy in range(n) for dx in range(n)
    ])
    cm = cands.mean(axis=(1, 2), keepdims=True)
    cz = cands - cm
    cn = jnp.sqrt(jnp.sum(cz * cz, axis=(1, 2)) + 1e-8)
    ncc = jnp.sum(cz * rp[None], axis=(1, 2)) / (cn * rn)  # (n*n,)
    grid = ncc.reshape(n, n)
    idx = jnp.argmax(ncc)
    iy, ix = idx // n, idx % n

    # quadratic subpixel refinement on the 3x3 neighborhood (clamped)
    iy_c = jnp.clip(iy, 1, n - 2)
    ix_c = jnp.clip(ix, 1, n - 2)
    c = grid[iy_c, ix_c]
    dyp = grid[iy_c + 1, ix_c]
    dym = grid[iy_c - 1, ix_c]
    dxp = grid[iy_c, ix_c + 1]
    dxm = grid[iy_c, ix_c - 1]
    denom_y = dym - 2 * c + dyp
    denom_x = dxm - 2 * c + dxp
    sub_y = jnp.where(jnp.abs(denom_y) > 1e-6,
                      0.5 * (dym - dyp) / denom_y, 0.0)
    sub_x = jnp.where(jnp.abs(denom_x) > 1e-6,
                      0.5 * (dxm - dxp) / denom_x, 0.0)
    sub_y = jnp.clip(sub_y, -1.0, 1.0)
    sub_x = jnp.clip(sub_x, -1.0, 1.0)
    best_dy = iy_c.astype(jnp.float32) + sub_y - radius
    best_dx = ix_c.astype(jnp.float32) + sub_x - radius
    return best_dy, best_dx, grid[iy_c, ix_c]


@functools.partial(jax.jit, static_argnames=("patch", "radius", "levels"))
def track_points(
    images: jnp.ndarray,
    query_yx: jnp.ndarray,
    query_frame: int = 0,
    patch: int = 11,
    radius: int = 4,
    levels: int = 3,
):
    """Track query points from one frame into every frame.

    Args:
        images: (F, H, W, 3) in [0, 1].
        query_yx: (P, 2) float (y, x) pixel coords in the query frame.
        query_frame: index of the frame the queries live in.
        patch: NCC patch size (odd).
        radius: per-level search radius in pixels (at that level's scale).
        levels: pyramid levels.

    Returns:
        tracks_yx: (F, P, 2) float (y, x) per frame,
        vis: (F, P) NCC peak score in [-1, 1] (1 at the query frame).
    """
    gray = to_gray(images.astype(jnp.float32))
    pyr = build_pyramid(gray, levels)  # fine -> coarse

    def track_one_frame(f_idx):
        def per_point(q):
            # init at the coarsest level with the query position scaled down
            est = q / (2 ** (levels - 1))
            score = jnp.asarray(0.0)
            for lvl in range(levels - 1, -1, -1):
                ref_img = pyr[lvl][query_frame]
                tgt_img = pyr[lvl][f_idx]
                q_lvl = q / (2**lvl)
                ref_patch = _extract_patch(ref_img, q_lvl, patch)
                win = _extract_patch(tgt_img, est,
                                     patch + 2 * radius)
                dy, dx, score = _ncc_search(ref_patch, win, radius)
                est = est + jnp.stack([dy, dx])
                if lvl > 0:
                    est = est * 2.0
            return est, score

        return jax.vmap(per_point)(query_yx)

    tracks, vis = jax.lax.map(track_one_frame, jnp.arange(images.shape[0]))
    return tracks, vis


def select_query_points(
    conf: jnp.ndarray,
    gray: jnp.ndarray,
    num_points: int,
    border: int = 8,
    cell: int = 16,
):
    """Confidence x gradient-magnitude corner selection on a grid.

    One point per (cell x cell) bucket, ranked by conf * |grad|, top
    `num_points` kept — spreads queries across the image like the
    reference's keypoint extractor stage (aliked+sp) without its weights.

    Args:
        conf: (H, W) confidence.
        gray: (H, W) luma.
    Returns:
        (num_points, 2) float (y, x), (num_points,) score.
    """
    h, w = gray.shape
    gy = jnp.abs(jnp.diff(gray, axis=0, prepend=gray[:1]))
    gx = jnp.abs(jnp.diff(gray, axis=1, prepend=gray[:, :1]))
    grad = gy + gx
    score = conf * grad
    # zero the border
    mask = jnp.zeros((h, w), bool).at[border:-border, border:-border].set(True)
    score = jnp.where(mask, score, 0.0)

    gh, gw = h // cell, w // cell
    sc = score[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    sc = sc.transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    best = jnp.argmax(sc, axis=-1)  # (gh, gw)
    best_val = jnp.max(sc, axis=-1)
    by = best // cell
    bx = best % cell
    ys = (jnp.arange(gh)[:, None] * cell + by).reshape(-1)
    xs = (jnp.arange(gw)[None, :] * cell + bx).reshape(-1)
    vals = best_val.reshape(-1)
    top = jnp.argsort(-vals)[:num_points]
    pts = jnp.stack([ys[top], xs[top]], axis=-1).astype(jnp.float32)
    return pts, vals[top]


def rank_query_frames(frame_feats: jnp.ndarray, num_frames: int) -> list:
    """Rank frames for multi-query tracking: most-central first, then
    farthest-point sampling over feature distance.

    Contract parity with the reference's DINO frame ranking
    (third_party/vggsfm_utils.py:52 generate_rank_by_dino + its
    farthest_point_sampling): build the cosine-similarity matrix of
    per-frame features, start from the frame with the highest total
    similarity (the most "representative" view), then greedily add the
    frame farthest (in 100 - sim distance) from everything selected so
    far. The reference runs a separately-downloaded dinov2_vitb14_reg for
    the features; here the caller passes any (F, D) per-frame features —
    ``frame_features_from_encoder`` derives them from the model's own
    DINOv2 encoder, so no extra weights are needed.

    Args:
        frame_feats: (F, D) per-frame descriptors.
        num_frames: how many query frames to select.

    Returns:
        list of int frame indices, length min(num_frames, F).
    """
    import numpy as np

    f = np.asarray(frame_feats, np.float32)
    f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
    sim = f @ f.T  # (F, F)
    dist = 100.0 - sim
    np.fill_diagonal(sim, -100.0)
    start = int(np.argmax(sim.sum(axis=1)))

    selected = [start]
    num = min(num_frames, len(f))
    while len(selected) < num:
        # distance of every frame to its nearest selected frame
        d = dist[:, selected].min(axis=1)
        d[selected] = -np.inf
        selected.append(int(np.argmax(d)))
    return selected


def frame_features_from_encoder(encoder_apply, images: jnp.ndarray,
                                batch: int = 8) -> jnp.ndarray:
    """Mean-pooled, L2-normalized encoder patch tokens per frame.

    ``encoder_apply``: callable (F', H, W, 3) -> patch tokens, either
    (F', N, D) or grid-shaped (F', gh, gw, D) — DinoViT returns the grid
    layout (e.g. the MapAnything model's own encoder bound to its params).
    Frames are processed in chunks of ``batch`` to bound activation memory.
    """
    feats = []
    for i in range(0, images.shape[0], batch):
        tok = encoder_apply(images[i:i + batch])
        tok = tok.reshape(tok.shape[0], -1, tok.shape[-1])  # (F', N, D)
        feats.append(tok.mean(axis=1))
    f = jnp.concatenate(feats, axis=0)
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
