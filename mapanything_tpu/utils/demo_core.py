"""UI-agnostic core of the interactive demo app.

Everything the reference's HF-Spaces demo computes lives here as pure
functions over the `infer()` per-view output contract — the gradio UI
is just widgets around these (reference `scripts/gradio_app.py`:
run_model:88, process_predictions_for_visualization:653,
colorize_depth:600, colorize_normal:633, measure:366;
`utils/hf_utils/viz.py`: predictions_to_glb:155, segment_sky:614).
`scripts/demo_app.py` drives them headless; gradio (absent from this
environment) plugs in on top when installed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..geometry import points_to_normals
from . import mesh as _mesh
from .viz import write_glb_scene


# ---------------------------------------------------------------------------
# Prediction packing (run_model's output contract)


def pack_predictions(outputs: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    """Stack infer()'s per-view dicts into the demo's prediction arrays
    (reference gradio_app.py:135-204): extrinsic (S,4,4), intrinsic
    (S,3,3), world_points (S,H,W,3), depth (S,H,W,1), conf (S,H,W),
    images (S,H,W,3), final_mask (S,H,W)."""
    def grab(key, required=True):
        rows = []
        for i, p in enumerate(outputs):
            if key not in p:
                if required:
                    raise KeyError(
                        f"pipeline output for view {i} is missing {key!r} — "
                        "pack_predictions needs the full infer() key set "
                        f"(got {sorted(p)})")
                return None
            rows.append(np.asarray(p[key][0], np.float32))
        return np.stack(rows)

    world = grab("pts3d")
    depth = grab("depth_z")
    imgs = grab("img_no_norm")
    conf = grab("conf", required=False)
    if conf is not None and conf.ndim == 4:
        conf = conf[..., 0]
    masks = []
    for p in outputs:
        if "mask" in p:
            m = np.asarray(p["mask"][0]).astype(bool)
            masks.append(m[..., 0] if m.ndim == 3 else m)
        else:
            masks.append(np.ones(depth.shape[1:3], bool))
    # valid-depth requirement matches the reference's depthmap_to_world_frame
    # valid_mask & per-view mask combination (gradio_app.py:152-167)
    final_mask = np.stack(masks) & (depth[..., 0] > 0)
    preds = {
        "extrinsic": grab("camera_poses"),
        "intrinsic": grab("intrinsics"),
        "world_points": world,
        "depth": depth,
        "images": imgs,
        "final_mask": final_mask,
    }
    if conf is not None:
        preds["conf"] = conf
    return preds


def run_model(
    pipeline,
    views: List[Dict[str, Any]],
    apply_mask: bool = True,
    mask_edges: bool = True,
    filter_black_bg: bool = False,
    filter_white_bg: bool = False,
    **infer_flags,
) -> Tuple[Dict[str, np.ndarray], Dict[int, Dict[str, Any]]]:
    """Inference + demo packing: the reference run_model
    (gradio_app.py:88) minus the UI. ``pipeline`` is anything with the
    `.infer(views, **flags)` contract (InferencePipeline, serve client).
    Returns (predictions, per-view visualization data)."""
    outputs = pipeline.infer(
        views, apply_mask=apply_mask, mask_edges=mask_edges, **infer_flags)
    predictions = pack_predictions(outputs)
    processed = process_for_visualization(
        predictions, filter_black_bg=filter_black_bg,
        filter_white_bg=filter_white_bg)
    return predictions, processed


# ---------------------------------------------------------------------------
# Per-view visualization data (depth / normal / measure tabs)


def background_mask(
    image01: np.ndarray, filter_black: bool = False, filter_white: bool = False
) -> np.ndarray:
    """(H, W) bool keep-mask from background filters on a [0,1] RGB
    image: black = RGB sum < 16/255, white = all channels > 240/255
    (reference thresholds, gradio_app.py:680-698)."""
    keep = np.ones(image01.shape[:2], bool)
    u8 = image01 * 255.0 if image01.max() <= 1.0 else image01
    if filter_black:
        keep &= u8.sum(axis=2) >= 16
    if filter_white:
        keep &= ~((u8[..., 0] > 240) & (u8[..., 1] > 240)
                  & (u8[..., 2] > 240))
    return keep


def process_for_visualization(
    predictions: Dict[str, np.ndarray],
    filter_black_bg: bool = False,
    filter_white_bg: bool = False,
) -> Dict[int, Dict[str, Any]]:
    """Per-view image/points3d/depth/normal/mask dicts for the demo tabs
    (reference process_predictions_for_visualization,
    gradio_app.py:653). Normals batch once on device instead of the
    reference's per-view host loop."""
    imgs = predictions["images"]
    masks = predictions["final_mask"].copy()
    for i in range(len(imgs)):
        masks[i] &= background_mask(
            imgs[i], filter_black_bg, filter_white_bg)
    normals, _ = points_to_normals(
        predictions["world_points"], masks)
    normals = np.asarray(normals)
    return {
        i: {
            "image": imgs[i],
            "points3d": predictions["world_points"][i],
            "depth": predictions["depth"][i, ..., 0],
            "normal": normals[i],
            "mask": masks[i],
        }
        for i in range(len(imgs))
    }


def colorize_depth(
    depth: np.ndarray, mask: Optional[np.ndarray] = None
) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8, turbo_r over the [p5, p95] valid
    range, invalid pixels white (reference colorize_depth,
    gradio_app.py:600)."""
    import matplotlib

    valid = depth > 0
    if mask is not None:
        valid = valid & mask
    norm = depth.astype(np.float64).copy()
    if valid.any():
        p5, p95 = np.percentile(norm[valid], [5, 95])
        norm[valid] = (norm[valid] - p5) / max(p95 - p5, 1e-12)
    colored = matplotlib.colormaps["turbo_r"](norm)[..., :3]
    colored = (colored * 255).astype(np.uint8)
    colored[~valid] = 255
    return colored


def colorize_normal(
    normal: np.ndarray, mask: Optional[np.ndarray] = None
) -> np.ndarray:
    """(H, W, 3) unit normals -> uint8 RGB, masked pixels at the [0,0,0]
    grey midpoint (reference colorize_normal, gradio_app.py:633)."""
    vis = normal.copy()
    if mask is not None:
        vis[~mask] = 0.0
    return (np.clip((vis + 1.0) / 2.0, 0, 1) * 255).astype(np.uint8)


def measure(
    view_data: Dict[str, Any],
    point1: Sequence[int],
    point2: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """The measure-tab math (reference measure, gradio_app.py:366):
    points are (x, y) pixel clicks. Returns per-point depth and, with
    two points, the metric 3-D distance. ``valid`` is False when a
    click lands on a masked pixel (the UI rejects it)."""
    pts3d, depth, mask = (
        view_data["points3d"], view_data["depth"], view_data["mask"])
    result: Dict[str, Any] = {"valid": True, "points": []}
    for p in (point1, point2):
        if p is None:
            continue
        x, y = int(p[0]), int(p[1])
        if not (0 <= y < depth.shape[0] and 0 <= x < depth.shape[1]):
            result["valid"] = False
            break
        if mask is not None and not mask[y, x]:
            result["valid"] = False
            break
        result["points"].append(
            {"xy": (x, y), "depth": float(depth[y, x]),
             "xyz": pts3d[y, x].tolist()})
    if result["valid"] and len(result["points"]) == 2:
        a = np.asarray(result["points"][0]["xyz"])
        b = np.asarray(result["points"][1]["xyz"])
        result["distance"] = float(np.linalg.norm(a - b))
    return result


# ---------------------------------------------------------------------------
# GLB scene export (mesh mode)


def predictions_to_glb_scene(
    path: str,
    predictions: Dict[str, np.ndarray],
    as_mesh: bool = True,
    frame: Optional[int] = None,
    conf_percentile: Optional[float] = None,
    mask_black_bg: bool = False,
    mask_white_bg: bool = False,
    mask_ambiguous: bool = True,
    show_cam: bool = True,
    align_to_first_camera: bool = True,
) -> int:
    """Demo GLB export (reference predictions_to_glb,
    hf_utils/viz.py:155): per-frame triangle meshes from the pixel
    lattice (masked quads dropped, shorter-diagonal split) or a point
    cloud, camera pyramids colored by frame, scene aligned to camera 0's
    OpenGL view. Returns the number of vertices written."""
    world = predictions["world_points"]
    imgs = predictions["images"]
    extr = predictions["extrinsic"]
    s, h, w = world.shape[:3]
    frames = range(s) if frame is None else [frame]

    align = (_mesh.alignment_transform(extr)
             if align_to_first_camera else np.eye(4))

    def frame_mask(i: int) -> np.ndarray:
        m = np.ones((h, w), bool)
        if mask_ambiguous:
            m &= predictions["final_mask"][i]
        m &= background_mask(imgs[i], mask_black_bg, mask_white_bg)
        if conf_percentile is not None and "conf" in predictions:
            c = predictions["conf"][i]
            m &= c >= np.percentile(c, conf_percentile)
        return m

    # camera markers, gist_rainbow by frame index (hf_utils/viz.py:436)
    markers = []
    if show_cam:
        import matplotlib

        cmap = matplotlib.colormaps["gist_rainbow"]
        # percentiles over the MASKED points only (reference viz.py:257-270
        # masks before computing scene_scale) — postprocess zeroes masked
        # pixels, which would otherwise drag the 5th/95th percentiles to 0
        # in sky-heavy scenes and shrink the markers to invisibility
        kept = np.concatenate(
            [world[i].reshape(-1, 3)[frame_mask(i).reshape(-1)]
             for i in frames]) if len(list(frames)) else np.zeros((0, 3))
        if len(kept) == 0:
            span = 1.0
        else:
            span = float(np.linalg.norm(
                np.percentile(kept, 95, axis=0)
                - np.percentile(kept, 5, axis=0)))
        for i in range(s):
            v, f = _mesh.camera_marker_mesh(
                extr[i], scale=0.03 * max(span, 1e-6))
            v = _mesh.transform_points(align, v).astype(np.float32)
            color = (np.array(cmap(i / max(s, 1))[:3]) * 255).astype(np.uint8)
            markers.append((v, f, color))

    if as_mesh:
        all_v, all_f, all_c = [], [], []
        base = 0
        for i in frames:
            faces, verts, cols = _mesh.image_mesh(
                world[i], imgs[i], mask=frame_mask(i), tri=True,
                diagonal_attr=0)
            all_v.append(verts)
            all_f.append(faces + base)
            all_c.append(cols)
            base += len(verts)
        verts = (np.concatenate(all_v) if all_v
                 else np.zeros((0, 3), np.float32))
        verts = _mesh.transform_points(align, verts).astype(np.float32)
        faces = (np.concatenate(all_f) if all_f
                 else np.zeros((0, 3), np.int32))
        cols = np.concatenate(all_c) if all_c else np.zeros((0, 3))
        _mesh.write_glb_mesh(path, verts, faces, vertex_colors=cols,
                             extra_meshes=markers)
        return len(verts)

    pts, cols = [], []
    for i in frames:
        m = frame_mask(i).reshape(-1)
        pts.append(world[i].reshape(-1, 3)[m])
        cols.append(imgs[i].reshape(-1, 3)[m])
    pts = np.concatenate(pts) if pts else np.zeros((0, 3), np.float32)
    cols = np.concatenate(cols) if cols else np.zeros((0, 3))
    pts = _mesh.transform_points(align, pts).astype(np.float32)
    poses = np.einsum("ij,vjk->vik", align, extr) if show_cam else None
    write_glb_scene(
        path, pts, cols, camera_poses=poses,
        intrinsics=predictions.get("intrinsic") if show_cam else None,
        image_wh=(w, h))
    return len(pts)


# ---------------------------------------------------------------------------
# Sky segmentation


def run_skyseg(onnx_session, input_size: Sequence[int],
               image_bgr: np.ndarray) -> np.ndarray:
    """Run a sky-segmentation ONNX model (the reference's protocol,
    hf_utils/viz.py:645): resize, BGR->RGB, imagenet-normalize, NCHW,
    then min-max rescale the logits to uint8."""
    import cv2

    x = cv2.resize(image_bgr, dsize=(input_size[0], input_size[1]))
    x = cv2.cvtColor(x, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    x = x.transpose(2, 0, 1)[None].astype(np.float32)
    name_in = onnx_session.get_inputs()[0].name
    name_out = onnx_session.get_outputs()[0].name
    out = np.asarray(
        onnx_session.run([name_out], {name_in: x})).squeeze()
    lo, hi = out.min(), out.max()
    return ((out - lo) / max(hi - lo, 1e-12) * 255).astype(np.uint8)


def sky_mask_heuristic(image_rgb01: np.ndarray) -> np.ndarray:
    """Offline sky mask (255 = non-sky) when the ONNX model is
    unavailable: sky = bright, low-texture pixels connected to the top
    border. Not learned — a documented fallback for this environment."""
    from scipy import ndimage

    img = image_rgb01.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    lum = img.mean(axis=2)
    gy, gx = np.gradient(ndimage.gaussian_filter(lum, 1.5))
    texture = np.hypot(gx, gy)
    blueish = img[..., 2] >= img[..., 0] - 0.05
    candidate = (lum > 0.45) & (texture < 0.02) & blueish
    labels, n = ndimage.label(candidate)
    top_labels = np.unique(labels[0])
    sky = np.isin(labels, top_labels[top_labels > 0])
    return np.where(sky, 0, 255).astype(np.uint8)


def segment_sky(
    image_rgb: np.ndarray, onnx_session=None
) -> np.ndarray:
    """(H, W) uint8 mask, 255 = non-sky, 0 = sky (the reference's
    documented convention, hf_utils/viz.py:614 — its code sets 255 on
    the low-logit side, contradicting its own docstring; this follows
    the docstring so both paths here agree). Uses the ONNX model when a
    session is given; otherwise the heuristic fallback."""
    if onnx_session is None:
        return sky_mask_heuristic(image_rgb)
    import cv2

    bgr = cv2.cvtColor(
        (np.clip(image_rgb, 0, 1) * 255).astype(np.uint8)
        if image_rgb.dtype != np.uint8 else image_rgb,
        cv2.COLOR_RGB2BGR)
    logits = run_skyseg(onnx_session, [320, 320], bgr)
    resized = cv2.resize(logits, (image_rgb.shape[1], image_rgb.shape[0]))
    # low rescaled logits = sky (reference comment, hf_utils/viz.py:636)
    return np.where(resized < 32, 0, 255).astype(np.uint8)
