"""2-process x 4-device jax.distributed smoke (round-2 VERDICT weak #6).

Exercises the code path the pod launch docs promise but the single-process
dryrun cannot reach: `jax.distributed.initialize` via
parallel/distributed.init_distributed, then
loop._global_batch -> host_local_array_to_global_array assembling per-process
local batch slices into one global array, and a jitted step over the global
mesh. Loss and updated params must agree across processes AND with a
single-process run on the full batch.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "_mp_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_batch_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", coordinator],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=str(WORKER.parent.parent),
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = [float(x) for x in parts[2:]]
    assert set(results) == {0, 1}
    # both processes computed the same global loss + update
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process oracle on the full batch
    rng = np.random.default_rng(0)
    gx = rng.standard_normal((8, 4, 3)).astype(np.float32)
    gy = rng.standard_normal((8, 4)).astype(np.float32)
    w = np.full((3,), 0.5, np.float32)
    pred = gx @ w
    loss = float(np.mean((pred - gy) ** 2))
    np.testing.assert_allclose(results[0][0], loss, rtol=1e-5)
