"""Native C++ kernel tests: build, parity with numpy, speedup sanity."""

import time

import numpy as np
import pytest

from mapanything_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestNative:
    def test_normalize_parity(self, lib, rng):
        img = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        out = native.normalize_u8(img, mean, std)
        ref = (img.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_resize_normalize_shapes_and_range(self, lib, rng):
        img = rng.integers(0, 255, size=(100, 140, 3), dtype=np.uint8)
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        out = native.resize_normalize_u8(img, (50, 70), mean, std)
        assert out.shape == (50, 70, 3)
        assert 0.0 <= out.min() and out.max() <= 1.0
        # constant image stays constant through bilinear resize
        const = np.full((64, 64, 3), 128, np.uint8)
        out2 = native.resize_normalize_u8(const, (30, 40), mean, std)
        np.testing.assert_allclose(out2, 128 / 255.0, atol=1e-6)

    def test_covis_walk_connected(self, lib, rng):
        n = 40
        # ring graph: i covisible with i+-1 only
        covis = np.zeros((n, n), np.float32)
        for i in range(n):
            covis[i, i] = 1.0
            covis[i, (i + 1) % n] = 0.8
            covis[i, (i - 1) % n] = 0.8
        out = native.covis_random_walk(covis, 10, 0.25, seed=0)
        assert len(out) == 10
        assert len(set(out.tolist())) == 10
        # walk must be a connected chain on the ring
        s = sorted(out.tolist())
        gaps = [(b - a) % n for a, b in zip(s, s[1:])]
        assert max(gaps, default=1) <= n - 9  # contiguous segment on the ring

    def test_covis_walk_respects_threshold(self, lib):
        # two disconnected cliques: the walk cannot bridge them
        n = 10
        covis = np.zeros((n, n), np.float32)
        covis[:5, :5] = 1.0
        covis[5:, 5:] = 1.0
        out = native.covis_random_walk(covis, 8, 0.5, seed=1)
        groups = {i < 5 for i in out.tolist()}
        assert len(groups) == 1  # stayed on one component
        assert len(out) == 5  # best walk = whole component

    def test_native_matches_python_dataset_path(self, lib, rng):
        """The dataset sampling still produces valid connected sets when the
        native path is active (semantic equivalence, not bit-equality —
        different RNG streams)."""
        from mapanything_tpu.data.base_dataset import BaseDataset

        ds = BaseDataset.__new__(BaseDataset)
        ds.covisibility_thres = 0.25
        ds._rng = np.random.default_rng(0)
        n = 30
        covis = np.zeros((n, n), np.float32)
        for i in range(n):
            covis[i, i] = 1.0
            if i + 1 < n:
                covis[i, i + 1] = covis[i + 1, i] = 0.9
        out = ds._random_walk_sampling(covis, 8)
        assert len(out) == 8
        s = sorted(out.tolist())
        assert all(b - a == 1 for a, b in zip(s, s[1:]))  # connected chain

    def test_speedup(self, lib, rng):
        img = rng.integers(0, 255, size=(1024, 1365, 3), dtype=np.uint8)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        native.normalize_u8(img, mean, std)  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            native.normalize_u8(img, mean, std)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            _ = (img.astype(np.float32) / 255.0 - mean) / std
        t_numpy = time.perf_counter() - t0
        print(f"normalize: native {t_native:.3f}s vs numpy {t_numpy:.3f}s")
        assert t_native < t_numpy * 1.5  # at least not slower
