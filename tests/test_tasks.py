"""Task presets match the reference's configs/model/task/*.yaml values.

The yaml tree is the oracle: each file is parsed here (flat key: value lines,
no yaml dependency needed) and compared field-for-field against
``task_config(stem)``.
"""

import pathlib

import pytest

from mapanything_tpu.models import TASK_NAMES, task_config

REF_TASK_DIR = pathlib.Path("/root/reference/configs/model/task")

_FIELDS = (
    "overall_prob",
    "dropout_prob",
    "ray_dirs_prob",
    "depth_prob",
    "cam_prob",
    "sparse_depth_prob",
    "sparsification_removal_percent",
    "depth_scale_norm_all_prob",
    "pose_scale_norm_all_prob",
)


def _parse_flat_yaml(path):
    out = {}
    for line in path.read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if ":" not in line or line.startswith("-"):
            continue
        key, _, val = line.partition(":")
        val = val.strip()
        if not val:
            continue
        try:
            out[key.strip()] = float(val)
        except ValueError:
            pass
    return out


needs_ref = pytest.mark.skipif(
    not REF_TASK_DIR.is_dir(), reason="reference yaml tree not present"
)


@needs_ref
def test_every_reference_task_yaml_has_a_preset():
    stems = {p.stem for p in REF_TASK_DIR.glob("*.yaml")} - {"default"}
    assert stems == set(TASK_NAMES)


@needs_ref
@pytest.mark.parametrize(
    "name",
    sorted(p.stem for p in REF_TASK_DIR.glob("*.yaml") if p.stem != "default"),
)
def test_preset_matches_yaml(name):
    want = _parse_flat_yaml(REF_TASK_DIR / f"{name}.yaml")
    got = task_config(name)
    for field in _FIELDS:
        assert getattr(got, field) == pytest.approx(want[field]), (
            f"{name}.{field}: preset={getattr(got, field)} yaml={want[field]}"
        )


def test_unknown_preset_raises():
    with pytest.raises(ValueError, match="unknown task preset"):
        task_config("no_such_task")


def test_inference_presets_are_deterministic():
    for name in TASK_NAMES:
        if name.endswith("_training"):
            assert not task_config(name).deterministic()
        else:
            assert task_config(name).deterministic()


def test_infer_rejects_stochastic_preset():
    import numpy as np

    from mapanything_tpu.models import model_factory
    from mapanything_tpu.utils.inference import InferencePipeline

    model = model_factory()
    pipe = InferencePipeline(model, params=None)
    views = [
        {"img": np.zeros((1, 28, 28, 3), np.float32),
         "data_norm_type": "dinov2"}
        for _ in range(2)
    ]
    with pytest.raises(ValueError, match="stochastic"):
        pipe.infer(views, task="aug_training")
