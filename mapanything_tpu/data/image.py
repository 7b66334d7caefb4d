"""Host-side image loading + fixed-resolution bucketing (L1 input pipeline).

Rebuild of mapanything/utils/image.py (RESOLUTION_MAPPINGS:40,
find_closest_aspect_ratio:73, rgb:93, load_images:134, preprocess_inputs:335)
and mapanything/utils/cropping.py (rescale:188, camera_matrix_of_crop:283,
crop:320, bbox_from_intrinsics_in_out:363, crop_resize_if_necessary:385).

The 10-bucket aspect-ratio table is the enabler of static XLA shapes: every
input maps to one of 10 (H, W) pairs per resolution set, so the jit cache has
at most 10 x num-view-counts entries. Decode/EXIF/Lanczos stay on host (PIL);
tensors leave this module channel-last (B, H, W, 3) float32, normalized —
ready for the (B, V, ...) stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import PIL.Image
from PIL.ImageOps import exif_transpose

from ..nn.dinov2 import IMAGE_NORMALIZATION_DICT

# Fixed resolution mappings (width, height) keyed by aspect ratio
# (reference image.py:40-65 — the same table, it is protocol data).
RESOLUTION_MAPPINGS = {
    518: {
        1.000: (518, 518),
        1.321: (518, 392),
        1.542: (518, 336),
        1.762: (518, 294),
        2.056: (518, 252),
        3.083: (518, 168),
        0.757: (392, 518),
        0.649: (336, 518),
        0.567: (294, 518),
        0.486: (252, 518),
    },
    512: {
        1.000: (512, 512),
        1.333: (512, 384),
        1.524: (512, 336),
        1.778: (512, 288),
        2.000: (512, 256),
        3.200: (512, 160),
        0.750: (384, 512),
        0.656: (336, 512),
        0.562: (288, 512),
        0.500: (256, 512),
    },
}

SUPPORTED_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".heic")


def find_closest_aspect_ratio(aspect_ratio: float, resolution_set: int = 518):
    """Closest bucket (width, height) for an aspect ratio. Ref image.py:73."""
    table = RESOLUTION_MAPPINGS[resolution_set]
    key = min(table.keys(), key=lambda k: abs(k - aspect_ratio))
    return table[key]


def rgb(img: np.ndarray, norm_type: str = "dinov2") -> np.ndarray:
    """Denormalize to [0, 1] RGB (reference image.py:93). Accepts HWC/NHWC
    float (normalized) or uint8; also NCHW/CHW which get transposed."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] == 3:
        img = img.transpose(1, 2, 0)
    elif img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
        img = img.transpose(0, 2, 3, 1)
    if img.dtype == np.uint8:
        return np.float32(img) / 255.0
    mean, std = IMAGE_NORMALIZATION_DICT[norm_type]
    return np.clip(img * std + mean, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Cropping / rescaling with intrinsics bookkeeping (cropping.py)
# ---------------------------------------------------------------------------


def _colmap_shift(K: np.ndarray, sign: float) -> np.ndarray:
    K = K.copy()
    K[0, 2] += 0.5 * sign
    K[1, 2] += 0.5 * sign
    return K


def camera_matrix_of_crop(
    input_camera_matrix: np.ndarray,
    input_resolution,
    output_resolution,
    scaling: float = 1.0,
    offset_factor: float = 0.5,
    offset=None,
) -> np.ndarray:
    """Intrinsics after scale+crop (reference cropping.py:283): work in COLMAP
    pixel-center convention, scale focal/principal, shift by the crop offset."""
    margins = np.asarray(input_resolution) * scaling - np.asarray(output_resolution)
    assert np.all(margins >= 0.0), f"crop larger than image: margins {margins}"
    if offset is None:
        offset = offset_factor * margins
    K = _colmap_shift(input_camera_matrix, +1)  # opencv -> colmap
    K[:2, :] *= scaling
    K[:2, 2] -= offset
    return _colmap_shift(K, -1)  # colmap -> opencv


def bbox_from_intrinsics_in_out(
    input_camera_matrix, output_camera_matrix, output_resolution
):
    """Crop bbox from principal-point shift (reference cropping.py:363)."""
    out_width, out_height = output_resolution
    left, top = np.int32(
        np.round(input_camera_matrix[:2, 2] - output_camera_matrix[:2, 2])
    )
    return (left, top, left + out_width, top + out_height)


def rescale_image_and_other_optional_info(
    image: PIL.Image.Image,
    output_resolution,
    depthmap: Optional[np.ndarray] = None,
    camera_intrinsics: Optional[np.ndarray] = None,
    force: bool = True,
    additional_quantities: Optional[List[np.ndarray]] = None,
):
    """Scale so the image covers the target box (reference cropping.py:188):
    Lanczos when downscaling, bicubic when upscaling, nearest for depth."""
    input_resolution = np.array(image.size)  # (W, H)
    output_resolution = np.array(output_resolution)
    scale_final = max(output_resolution / image.size) + 1e-8
    if scale_final >= 1 and not force:
        return image, depthmap, camera_intrinsics, additional_quantities
    target = np.floor(input_resolution * scale_final).astype(int)

    resample = PIL.Image.LANCZOS if scale_final < 1 else PIL.Image.BICUBIC
    image = image.resize(tuple(target), resample=resample)

    def _nearest(arr):
        import cv2

        return cv2.resize(arr, tuple(target), interpolation=cv2.INTER_NEAREST)

    if depthmap is not None:
        depthmap = _nearest(depthmap)
    if additional_quantities is not None:
        additional_quantities = [_nearest(q) for q in additional_quantities]
    if camera_intrinsics is not None:
        camera_intrinsics = camera_matrix_of_crop(
            camera_intrinsics, input_resolution, target, scaling=scale_final
        )
    return image, depthmap, camera_intrinsics, additional_quantities


def crop_image_and_other_optional_info(
    image, crop_bbox, depthmap=None, camera_intrinsics=None,
    additional_quantities=None,
):
    """Crop image/depth/extras + shift principal point (cropping.py:320)."""
    left, top, right, bottom = crop_bbox
    image = image.crop((left, top, right, bottom))
    if depthmap is not None:
        depthmap = depthmap[top:bottom, left:right]
    if additional_quantities is not None:
        additional_quantities = [q[top:bottom, left:right] for q in additional_quantities]
    if camera_intrinsics is not None:
        camera_intrinsics = camera_intrinsics.copy()
        camera_intrinsics[0, 2] -= left
        camera_intrinsics[1, 2] -= top
    return image, depthmap, camera_intrinsics, additional_quantities


def crop_resize_if_necessary(
    image,
    resolution,
    depthmap: Optional[np.ndarray] = None,
    intrinsics: Optional[np.ndarray] = None,
    additional_quantities: Optional[List[np.ndarray]] = None,
):
    """Lanczos downscale -> principal-point-preserving crop (cropping.py:385)."""
    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(image)

    image, depthmap, intrinsics, additional_quantities = (
        rescale_image_and_other_optional_info(
            image, np.array(resolution), depthmap, intrinsics,
            additional_quantities=additional_quantities,
        )
    )

    if intrinsics is not None:
        new_intrinsics = camera_matrix_of_crop(
            intrinsics, image.size, resolution, offset_factor=0.5
        )
        crop_bbox = bbox_from_intrinsics_in_out(intrinsics, new_intrinsics, resolution)
    else:
        w, h = image.size
        tw, th = resolution
        left, top = (w - tw) // 2, (h - th) // 2
        crop_bbox = (left, top, left + tw, top + th)

    image, depthmap, intrinsics, additional_quantities = (
        crop_image_and_other_optional_info(
            image, crop_bbox, depthmap, intrinsics, additional_quantities
        )
    )
    out = (image,)
    if depthmap is not None:
        out += (depthmap,)
    if intrinsics is not None:
        out += (intrinsics,)
    if additional_quantities is not None:
        out += (additional_quantities,)
    return out if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# load_images / preprocess_inputs
# ---------------------------------------------------------------------------


def _normalize(img: PIL.Image.Image, norm_type: str) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    mean, std = IMAGE_NORMALIZATION_DICT[norm_type]
    return (arr - mean.astype(np.float32)) / std.astype(np.float32)


def load_images(
    folder_or_list: Union[str, Sequence],
    norm_type: str = "dinov2",
    resolution_set: int = 518,
    stride: int = 1,
    verbose: bool = False,
) -> List[Dict[str, Any]]:
    """Load a folder/list of images into per-view dicts (reference
    image.py:134): EXIF transpose, average aspect ratio over all frames ->
    one bucket resolution, Lanczos resize + center crop, normalize.

    Returns view dicts with 'img' (1, H, W, 3) float32 normalized (NHWC — our
    native layout; the reference uses NCHW), 'true_shape', 'idx', 'instance',
    'data_norm_type'.
    """
    if isinstance(folder_or_list, str):
        entries = sorted(
            os.path.join(folder_or_list, f)
            for f in os.listdir(folder_or_list)
            if f.lower().endswith(SUPPORTED_EXTENSIONS)
        )
    else:
        entries = list(folder_or_list)
    entries = entries[::stride]
    if not entries:
        raise ValueError("no images found")

    pil_images = []
    for e in entries:
        img = e if isinstance(e, PIL.Image.Image) else PIL.Image.open(e)
        img = exif_transpose(img).convert("RGB")
        pil_images.append(img)

    # One bucket for the whole set, chosen by the average aspect ratio
    # (image.py:249-263) — keeps the stacked batch a single static shape.
    avg_ar = float(np.mean([im.size[0] / im.size[1] for im in pil_images]))
    target_w, target_h = find_closest_aspect_ratio(avg_ar, resolution_set)
    if verbose:
        print(f"load_images: {len(pil_images)} frames -> bucket "
              f"({target_w}x{target_h}) for avg AR {avg_ar:.3f}")

    views = []
    for idx, im in enumerate(pil_images):
        im = crop_resize_if_necessary(im, (target_w, target_h))
        arr = _normalize(im, norm_type)[None]  # (1, H, W, 3)
        views.append(
            {
                "img": arr,
                "true_shape": [(target_h, target_w)],
                "idx": [idx],
                "instance": [str(entries[idx]) if not isinstance(entries[idx], PIL.Image.Image) else str(idx)],
                "data_norm_type": [norm_type],
            }
        )
    return views


def preprocess_inputs(
    views: List[Dict[str, Any]],
    norm_type: str = "dinov2",
    resolution_set: int = 518,
) -> List[Dict[str, Any]]:
    """Multimodal twin of load_images (reference image.py:335): resize images
    + jointly resize depth (nearest) and rescale intrinsics to the bucket.

    Input views carry 'img' as HWC uint8/float arrays or PIL images, and
    optionally 'depth_z' (H, W), 'intrinsics' (3, 3), 'camera_poses' (4, 4),
    'is_metric_scale'. Output matches the inference API contract.
    """
    pil_images = []
    for v in views:
        img = v["img"]
        if isinstance(img, PIL.Image.Image):
            pil_images.append(img.convert("RGB"))
        else:
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            pil_images.append(PIL.Image.fromarray(arr))

    avg_ar = float(np.mean([im.size[0] / im.size[1] for im in pil_images]))
    target_w, target_h = find_closest_aspect_ratio(avg_ar, resolution_set)

    out_views = []
    for idx, (v, im) in enumerate(zip(views, pil_images)):
        depth = v.get("depth_z")
        if depth is not None:
            depth = np.asarray(depth, np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
        K = v.get("intrinsics")
        if K is not None:
            K = np.asarray(K, np.float32).copy()

        result = crop_resize_if_necessary(
            im, (target_w, target_h), depthmap=depth, intrinsics=K
        )
        if depth is not None and K is not None:
            im2, depth2, K2 = result
        elif K is not None:
            im2, K2 = result
            depth2 = None
        elif depth is not None:
            im2, depth2 = result
            K2 = None
        else:
            im2, depth2, K2 = result, None, None

        out = {
            "img": _normalize(im2, norm_type)[None],
            "true_shape": [(target_h, target_w)],
            "idx": [idx],
            "instance": [str(idx)],
            "data_norm_type": [norm_type],
        }
        if depth2 is not None:
            out["depth_z"] = depth2[None, ..., None]
        if K2 is not None:
            out["intrinsics"] = K2[None]
        if "camera_poses" in v:
            poses = np.asarray(v["camera_poses"], np.float32)
            out["camera_poses"] = poses[None] if poses.ndim == 2 else poses
        if "is_metric_scale" in v:
            # (1,) bool array: keeps batch merging (serve.py) and
            # stack_views treating it like every other per-view array
            out["is_metric_scale"] = np.atleast_1d(
                np.asarray(v["is_metric_scale"], bool))
        out_views.append(out)
    return out_views
