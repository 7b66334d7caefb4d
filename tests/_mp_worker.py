"""Worker for the 2-process x 4-CPU-device jax.distributed smoke test.

Run as: python _mp_worker.py <process_id> <num_processes> <coordinator>

Covers the multi-process branch of the training loop
(loop.py `_global_batch` -> host_local_array_to_global_array) that the
single-process 8-device dryrun cannot reach: each process holds its LOCAL
slice of the global batch, the slices are assembled into one global array,
and one jitted train step runs over the global ("data",) mesh. The loss is
printed for the parent to compare across processes and against the
single-process value.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]

    sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

    from mapanything_tpu.parallel.distributed import init_distributed

    info = init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert info["num_processes"] == num_processes

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mapanything_tpu.train.loop import _global_batch

    devices = np.array(jax.devices())  # all 8 global devices
    mesh = Mesh(devices, ("data",))

    # Each process builds only ITS slice of the deterministic global batch
    # (global B = 8; local B = 4) — the multi-host loader contract.
    rng = np.random.default_rng(0)
    gx = rng.standard_normal((8, 4, 3)).astype(np.float32)
    gy = rng.standard_normal((8, 4)).astype(np.float32)
    lo = process_id * 4
    local = {
        "views": {"img": jnp.asarray(gx[lo:lo + 4])},
        "gt": {"y": jnp.asarray(gy[lo:lo + 4])},
    }
    with mesh:
        gbatch = _global_batch(local, mesh)
    assert gbatch["views"]["img"].shape == (8, 4, 3)

    w = jnp.full((3,), 0.5, jnp.float32)

    @jax.jit
    def step(w, batch):
        pred = batch["views"]["img"] @ w
        loss = jnp.mean((pred - batch["gt"]["y"]) ** 2)
        return w - 0.1 * jax.grad(
            lambda w: jnp.mean((batch["views"]["img"] @ w
                                - batch["gt"]["y"]) ** 2)
        )(w), loss

    with mesh:
        new_w, loss = step(w, gbatch)
    # loss and w are replicated outputs -> fully addressable on every process
    loss_val = float(loss)
    w_val = np.asarray(new_w)
    print(f"RESULT {process_id} {loss_val:.8f} "
          + " ".join(f"{v:.8f}" for v in w_val))


if __name__ == "__main__":
    main()
