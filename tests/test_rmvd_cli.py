"""benchmark_rmvd.py external-harness wiring, driven by a FAKE `rmvd`
package (round-3 VERDICT item 10): the CLI must call the package with the
reference call shape (benchmark.py:63-117) and hand it an adaptor that
satisfies the RMVD model contract when the harness drives it."""

import json
import sys
import types

import numpy as np
import pytest


@pytest.fixture()
def fake_rmvd(monkeypatch):
    """A minimal rmvd stand-in recording calls and driving the adaptor the
    way the real mvd evaluation does (input_adapter -> model -> output)."""
    calls = {}

    def create_dataset(name, task, input_size=None, root=None):
        calls["dataset"] = dict(name=name, task=task,
                                input_size=input_size, root=root)
        rng = np.random.default_rng(0)
        h, w = input_size
        sample = {
            "images": [rng.integers(0, 255, size=(1, 3, h, w)).astype(
                np.uint8) for _ in range(2)],
            "keyview_idx": 0,
            "poses": [np.eye(4, dtype=np.float32)[None]] * 2,
            "intrinsics": [np.array(
                [[[w / 2.0, 0, w / 2], [0, w / 2.0, h / 2],
                  [0, 0, 1]]], np.float32)] * 2,
            "gt": rng.uniform(1, 4, size=(h, w)).astype(np.float32),
        }
        return [sample]

    def create_evaluation(evaluation_type, out_dir, inputs=(),
                          alignment=None, eval_uncertainty=False,
                          max_source_views=None):
        calls["evaluation"] = dict(
            evaluation_type=evaluation_type, out_dir=out_dir,
            inputs=list(inputs), alignment=alignment,
            eval_uncertainty=eval_uncertainty,
            max_source_views=max_source_views)

        def evaluation(dataset, model):
            assert hasattr(model, "name")
            absrels = []
            for s in dataset:
                views = model.input_adapter(
                    s["images"], s["keyview_idx"],
                    poses=s["poses"] if "poses" in calls["evaluation"][
                        "inputs"] else None,
                    intrinsics=s["intrinsics"] if "intrinsics" in calls[
                        "evaluation"]["inputs"] else None,
                    depth_range=None)
                pred, aux = model.output_adapter(model(views))
                assert pred["depth"].shape == (1, 1, *s["gt"].shape)
                assert np.isfinite(pred["depth"]).all()
                assert "depth_uncertainty" in pred
                valid = s["gt"] > 0
                absrels.append(float(np.abs(
                    pred["depth"][0, 0][valid] - s["gt"][valid]).mean()))
            calls["ran"] = len(absrels)
            return {"abs_err": float(np.mean(absrels))}

        return evaluation

    mod = types.ModuleType("rmvd")
    mod.create_dataset = create_dataset
    mod.create_evaluation = create_evaluation
    monkeypatch.setitem(sys.modules, "rmvd", mod)
    return calls


def test_external_harness_wiring(fake_rmvd, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/scripts")
    import benchmark_rmvd

    rc = benchmark_rmvd.main([
        "--dataset", "eth3d", "--data-root", str(tmp_path),
        "--conditioning", "image+intrinsics+pose",
        "--resolution", "56", "56", "--out", str(tmp_path / "out"),
    ])
    assert rc == 0
    # reference call shape (benchmark.py:63-88)
    assert fake_rmvd["dataset"]["task"] == "mvd"
    assert fake_rmvd["dataset"]["input_size"] == (56, 56)
    ev = fake_rmvd["evaluation"]
    assert ev["evaluation_type"] == "mvd"
    assert ev["inputs"] == ["intrinsics", "poses"]
    assert ev["max_source_views"] == 7
    assert fake_rmvd["ran"] == 1
    # setting.json dumped like the reference (benchmark.py:119-121)
    with open(tmp_path / "out" / "setting.json") as f:
        setting = json.load(f)
    assert setting["conditioning"] == "image+intrinsics+pose"


def test_missing_package_is_a_clean_error(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo/scripts")
    import benchmark_rmvd

    monkeypatch.setitem(sys.modules, "rmvd", None)  # import -> ImportError
    rc = benchmark_rmvd.main(["--out", str(tmp_path / "o")])
    assert rc == 2


def test_selftest_runs_without_rmvd(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    import benchmark_rmvd

    rc = benchmark_rmvd.main(["--selftest", "--selftest-res", "56"])
    assert rc == 0
