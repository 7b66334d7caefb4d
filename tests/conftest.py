"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
attached in CI. Real-chip benchmarking happens via bench.py, not tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The baked axon sitecustomize overrides JAX_PLATFORMS via
# jax.config.update("jax_platforms", "axon,cpu") — override it back BEFORE
# any backend initialization, or tests silently run through the TPU tunnel.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

jax.config.update("jax_enable_x64", False)

# Persistent compile cache: repeat test runs skip recompiles of the heavy
# train-step/model graphs (fresh runs still pay them once).
try:
    _cache = os.path.expanduser("~/.cache/mapanything_tpu_xla_tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    # 0.5 s threshold: the suite is hundreds of 0.5-2 s tiny-model compiles
    # on a 1-core box — caching them is where most of the repeat-run win is
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

import gc  # noqa: E402
import pathlib  # noqa: E402
import sys  # noqa: E402

import pytest  # noqa: E402

# The suite holds hundreds of compiled executables + traced graphs alive;
# default gen-0 GC (threshold 700) then scans that growing heap thousands
# of times over a run. Raise the thresholds — jax/numpy buffers are
# refcounted, cycles are rare, and full collections still happen.
gc.set_threshold(100_000, 100, 100)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_geometry():
    """The PyTorch reference geometry module, loaded for golden-parity tests.

    Used as an oracle only (we call it and compare outputs); no code is copied.
    """
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REFERENCE_ROOT))
    import importlib

    mod = importlib.import_module("mapanything.utils.geometry")
    return mod


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
