"""The 14 WAI training/eval datasets, table-driven.

The reference implements 14 near-identical classes (datasets/wai/*.py, each
150-360 LoC differing only in metadata filename, modality names and
metric/synthetic flags — SURVEY.md §2.1). Here one WAIDataset class +
a registry row per dataset covers the same surface:

    ASE, BlendedMVS, DL3DV, DynamicReplica, ETH3D, MegaDepth, MPSD,
    MVS-Synth, ParallelDomain4D, SAILVOS3D, ScanNetPP, Spring,
    TartanAirV2-WB, UnrealStereo4K
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

from .base_dataset import BaseDataset
from .wai import load_covisibility_mmap, load_frame, load_scene_meta


@dataclasses.dataclass(frozen=True)
class WAIDatasetSpec:
    name: str  # registry key, also used in dataset mix strings
    metadata_stem: str  # scene list file: {stem}_scene_list_{split}.npy
    depth_modality: str = "depth"
    image_modality: str = "image"
    is_metric_scale: bool = True
    is_synthetic: bool = False
    mask_modality: Optional[str] = None  # optional non-ambiguous mask


# Registry: flags per the reference dataset files (is_metric_scale /
# is_synthetic assignments in datasets/wai/<name>.py).
WAI_DATASET_SPECS = {
    "ase": WAIDatasetSpec("ase", "ase", is_synthetic=True),
    "blendedmvs": WAIDatasetSpec("blendedmvs", "blendedmvs",
                                 is_metric_scale=False),
    "dl3dv": WAIDatasetSpec("dl3dv", "dl3dv", is_metric_scale=False),
    "dynamicreplica": WAIDatasetSpec("dynamicreplica", "dynamicreplica",
                                     is_synthetic=True),
    "eth3d": WAIDatasetSpec("eth3d", "eth3d"),
    "megadepth": WAIDatasetSpec("megadepth", "megadepth",
                                is_metric_scale=False),
    "mpsd": WAIDatasetSpec("mpsd", "mpsd"),
    "mvs_synth": WAIDatasetSpec("mvs_synth", "mvs_synth", is_synthetic=True),
    "paralleldomain4d": WAIDatasetSpec("paralleldomain4d", "paralleldomain4d",
                                       is_synthetic=True),
    "sailvos3d": WAIDatasetSpec("sailvos3d", "sailvos3d", is_synthetic=True),
    "scannetpp": WAIDatasetSpec("scannetpp", "scannetppv2",
                                depth_modality="rendered_depth"),
    "spring": WAIDatasetSpec("spring", "spring", is_synthetic=True),
    "tav2_wb": WAIDatasetSpec("tav2_wb", "tav2_wb", is_synthetic=True),
    "unrealstereo4k": WAIDatasetSpec("unrealstereo4k", "unrealstereo4k",
                                     is_synthetic=True),
}


class WAIDataset(BaseDataset):
    """One multi-view dataset over a WAI-format scene tree."""

    def __init__(
        self,
        *args,
        ROOT: str,
        dataset_metadata_dir: Optional[str] = None,
        split: str = "train",
        spec: WAIDatasetSpec | str = "scannetpp",
        overfit_num_sets: Optional[int] = None,
        sample_specific_scene: bool = False,
        specific_scene_name: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(*args, split=split, **kwargs)
        if isinstance(spec, str):
            spec = WAI_DATASET_SPECS[spec]
        self.spec = spec
        self.ROOT = ROOT
        self.dataset_metadata_dir = dataset_metadata_dir
        self.overfit_num_sets = overfit_num_sets
        self.sample_specific_scene = sample_specific_scene
        self.specific_scene_name = specific_scene_name
        self.is_metric_scale = spec.is_metric_scale
        self.is_synthetic = spec.is_synthetic
        self._load_scene_list()

    def _load_scene_list(self):
        if self.sample_specific_scene:
            self.scenes = [self.specific_scene_name]
        elif self.dataset_metadata_dir is not None:
            path = os.path.join(
                self.dataset_metadata_dir, self.split,
                f"{self.spec.metadata_stem}_scene_list_{self.split}.npy",
            )
            self.scenes = list(np.load(path, allow_pickle=True))
        else:
            # no metadata dir: every subdirectory with a scene_meta.json
            self.scenes = sorted(
                d for d in os.listdir(self.ROOT)
                if os.path.isfile(os.path.join(self.ROOT, d, "scene_meta.json"))
            )
        if self.overfit_num_sets is not None:
            self.scenes = self.scenes[: self.overfit_num_sets]
        self.num_of_scenes = len(self.scenes)

    def _get_views(self, sampled_idx, num_views_to_sample, resolution):
        scene_name = self.scenes[sampled_idx]
        scene_root = os.path.join(self.ROOT, scene_name)
        scene_meta = load_scene_meta(os.path.join(scene_root, "scene_meta.json"))
        frame_names = list(scene_meta["frame_names"].keys())

        covis = load_covisibility_mmap(scene_root)
        view_indices = self._sample_view_indices(
            num_views_to_sample, len(frame_names), covis
        )

        modalities = [self.spec.image_modality, self.spec.depth_modality]
        if self.spec.mask_modality:
            modalities.append(self.spec.mask_modality)

        views = []
        for vi in view_indices:
            data = load_frame(scene_root, frame_names[int(vi)],
                              modalities=modalities, scene_meta=scene_meta)
            image = data[self.spec.image_modality]
            depth = data[self.spec.depth_modality].astype(np.float32)
            intrinsics = data["intrinsics"].astype(np.float32)
            pose = data["extrinsics"].astype(np.float32)
            # clean non-finite depth (matches per-dataset handling)
            depth = np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)

            image, depth, intrinsics = self._crop_resize_if_necessary(
                image, resolution, depth, intrinsics
            )
            view = dict(
                img=image,
                depthmap=depth,
                camera_intrinsics=intrinsics,
                camera_pose=pose,
                dataset=self.spec.name,
                label=scene_name,
                instance=os.path.join("images", str(data["frame_name"])),
            )
            if self.spec.mask_modality:
                # mask was not resized jointly; recompute cheaply if same size
                m = data[self.spec.mask_modality]
                if m.shape[:2] == depth.shape[:2]:
                    view["non_ambiguous_mask"] = m
            views.append(view)
        return views


def make_wai_dataset(name: str, **kwargs) -> WAIDataset:
    """Factory: make_wai_dataset('eth3d', ROOT=..., num_views=4, ...)."""
    return WAIDataset(spec=WAI_DATASET_SPECS[name], **kwargs)
