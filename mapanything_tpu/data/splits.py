"""Train/val/test scene-split rules + scene-list materialization.

The reference ships 1,734 lines of materialized split tables
(reference mapanything/datasets/utils/data_splits.py) that its
preprocessing uses to write the `{stem}_scene_list_{split}.npy` files the
datasets load. The tables decompose into three kinds of rule, which this
module keeps PROCEDURAL so they apply to whatever scene inventory exists
on disk:

  * hash rules — BlendedMVS: scene names are `{seqh:08x}{seql:016x}`; val
    is `seql % 10 == 0`, train the rest (the DUSt3R split logic quoted at
    data_splits.py:18-32 — the 1,500-line literal list is just this rule
    materialized);
  * named lists — small published protocol constants (TartanAir V2 val/
    test environments, MegaDepth + Spring DUSt3R val scenes,
    data_splits.py:1559-1602; ETH3D is all-test :1725-1734);
  * fraction rules — MPSD's 95/5 and the curated ScanNetPP/DL3DV
    benchmark lists (data_splits.py:1603-1723; the latter load external
    CSVs). Reproduced as a deterministic name-hash fraction so any subset
    of the corpus splits consistently; drop curated lists in as
    `val_scenes` overrides when available.

`build_scene_lists` writes the same `.npy` files `data/wai_datasets.py`
reads, so splits materialize per-corpus exactly like the reference's
preprocessing step.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

SPLITS = ("train", "val", "test")


def _name_hash_unit(name: str) -> float:
    """Deterministic [0, 1) hash of a scene name (stable across runs and
    machines, unlike Python's salted hash())."""
    h = hashlib.sha1(name.encode()).digest()
    return int.from_bytes(h[:8], "big") / 2**64


@dataclass(frozen=True)
class SplitRule:
    """Per-dataset split assignment.

    Priority: explicit `test_scenes`/`val_scenes` membership, then
    `all_test`, then the BlendedMVS hex rule, then the hash fraction.
    """

    val_scenes: tuple = ()
    test_scenes: tuple = ()
    all_test: bool = False
    blendedmvs_hex: bool = False
    val_fraction: float = 0.1

    def assign(self, scene: str) -> str:
        if scene in self.test_scenes:
            return "test"
        if scene in self.val_scenes:
            return "val"
        if self.all_test:
            return "test"
        if self.blendedmvs_hex:
            try:
                seql = int(scene[8:], 16)
                return "val" if seql % 10 == 0 else "train"
            except ValueError:
                pass  # non-conforming name: fall through to the hash rule
        if self.val_scenes or self.test_scenes:
            return "train"  # named-list datasets: everything else trains
        return ("val" if _name_hash_unit(scene) < self.val_fraction
                else "train")


# Registry keyed like data/wai_datasets.WAI_DATASETS. Published constants
# cited to the reference lines they reproduce.
SPLIT_RULES: Dict[str, SplitRule] = {
    "blendedmvs": SplitRule(blendedmvs_hex=True),  # data_splits.py:18-32
    "tav2_wb": SplitRule(  # data_splits.py:1559-1580
        val_scenes=("EndofTheWorld", "HongKong", "WesternDesertTown"),
        test_scenes=("DesertGasStation", "OldScandinavia", "PolarSciFi",
                     "Sewerage", "Supermarket"),
    ),
    "megadepth": SplitRule(  # data_splits.py:1582-1592 (DUSt3R val)
        val_scenes=("0015_0", "0015_1", "0022_0"),
    ),
    "spring": SplitRule(val_scenes=("0013", "0023", "0037")),  # :1594-1601
    "mpsd": SplitRule(val_fraction=0.05),  # :1603-1616 (95/5)
    "eth3d": SplitRule(all_test=True),  # :1725-1734
    # ScanNetPP / DL3DV use curated benchmark lists in the reference
    # (:1618-1723, loaded from external CSVs); reproduced as a 10% hash
    # fraction — pass val_scenes overrides to pin the curated lists.
}
DEFAULT_RULE = SplitRule()


def assign_split(dataset: str, scene: str,
                 rule: Optional[SplitRule] = None) -> str:
    """Split name ("train"/"val"/"test") for one scene."""
    rule = rule or SPLIT_RULES.get(dataset, DEFAULT_RULE)
    return rule.assign(scene)


def split_scenes(dataset: str, scenes: Iterable[str],
                 rule: Optional[SplitRule] = None) -> Dict[str, List[str]]:
    """Partition a scene inventory into the three splits."""
    out: Dict[str, List[str]] = {s: [] for s in SPLITS}
    for scene in scenes:
        out[assign_split(dataset, scene, rule)].append(scene)
    return out


def build_scene_lists(
    dataset: str,
    scenes: Sequence[str],
    metadata_dir: str,
    metadata_stem: Optional[str] = None,
    rule: Optional[SplitRule] = None,
) -> Dict[str, str]:
    """Materialize `{stem}_scene_list_{split}.npy` files under
    `{metadata_dir}/{split}/` — the exact layout `WAIDataset._load_scene_list`
    reads. Returns {split: path} for non-empty splits."""
    stem = metadata_stem or dataset
    parts = split_scenes(dataset, scenes, rule)
    paths = {}
    for split, names in parts.items():
        if not names:
            continue
        d = os.path.join(metadata_dir, split)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{stem}_scene_list_{split}.npy")
        np.save(path, np.asarray(sorted(names)))
        paths[split] = path
    return paths
