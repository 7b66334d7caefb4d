"""Compile-time + runtime probe: scan_layers vs unrolled at FULL size.

Round-4 bench burned ~1240s of its 1500s budget in XLA compiles of the
unrolled 24-layer model (one compile per sweep config). This measures, on
the real chip at the released architecture size:

  * trace+lower+compile wall time of the forward at (b, v) configs,
  * steady-state runtime (pipelined, fetch-at-end),

for scan_layers False/True, so bench.py can adopt the scan path with
numbers, not hope. Run each mode in its own process (the XLA compile
cache would otherwise leak between modes):

  python scripts/perf/scan_compile_probe.py unrolled
  python scripts/perf/scan_compile_probe.py scan
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

# fresh-compile measurements: do NOT attach the persistent XLA cache
import jax
import jax.numpy as jnp
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scan"
    configs = sys.argv[2] if len(sys.argv) > 2 else "2view"
    from mapanything_tpu.models import (MapAnything, MapAnythingConfig,
                                        images_only_config, jit_init)

    print(f"device: {jax.devices()[0]}  mode={mode}")
    cfg = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True,
                            scan_layers=(mode == "scan"))
    model = MapAnything(cfg=cfg)
    geom = images_only_config()
    rng = np.random.default_rng(0)

    sweep = {
        "2view": [(4, 2, False)],
        "many": [(1, 32, True), (1, 8, False)],
        "all": [(4, 2, False), (1, 1, False), (1, 32, True)],
    }[configs]

    params = None
    for b, v, mem_eff in sweep:
        views = {"img": jnp.asarray(
            rng.standard_normal(size=(b, v, 518, 518, 3),
                                dtype=np.float32) * 0.3)}
        if params is None:
            t0 = time.time()
            params = jit_init(model, jax.random.PRNGKey(0), views, geom)
            print(f"init: {time.time() - t0:.1f}s")
        fwd = jax.jit(lambda p, vw: model.apply(
            p, vw, geom, memory_efficient=mem_eff))
        t0 = time.time()
        lowered = fwd.lower(params, views)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        print(f"({b},{v}v,mem={mem_eff}): trace+lower {t_lower:.1f}s, "
              f"compile {t_compile:.1f}s", flush=True)
        out = compiled(params, views)
        _ = float(jnp.asarray(out["metric_scaling_factor"][0]))
        iters = 6 if v <= 4 else 3
        t0 = time.time()
        for _i in range(iters):
            out = compiled(params, views)
        _ = float(jnp.asarray(out["metric_scaling_factor"][0]))
        dt = (time.time() - t0) / iters
        print(f"  runtime: {dt * 1000:.1f} ms/call "
              f"({b * v / dt:.1f} views/s)", flush=True)
        del out


if __name__ == "__main__":
    main()
