"""Benchmark: the BASELINE.md measurement surface on one TPU chip.

Primary metric (unchanged across rounds): views/sec for batched 2-view
518x518 images-only inference with full on-device postprocess (confidence
percentile + edge masks — BASELINE config 2 semantics). Measured as
STEADY-STATE serving throughput (pipelined dispatch, one fetch at the end,
so device compute overlaps the ~35 ms axon-tunnel RTT); the per-request
p50 latency (fetch every call) is reported in extras. If the host is
dispatch-starved (sustained measurably worse than p50 — seen on 1-CPU
VMs), the headline falls back to the p50 measurement; extras
["headline_source"] records which one produced the value.

Extras (BASELINE.md configs 1-5, round-1 VERDICT item 5): p50 end-to-end
latency for 1-view (monocular), 2-view, multimodal 4-view (intrinsics+pose
conditioning), 32-view dense, and 100-view memory_efficient inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
vs_baseline divides by the MEASURED A100 baseline bound (BASELINE.md round-3
row: reference-shaped torch forward measured on CPU + analytic 2.576
TFLOP/view, A100 bf16 at the 20%-MFU lower bound = 24.2 views/s; the 55%-MFU
upper bound is reported as extras["vs_baseline_high_bound"]).

A soft deadline (BENCH_DEADLINE_S, default 1500s) skips remaining extras if
compiles run long; the primary metric always prints.

Compile starvation fix (round-4 VERDICT item 2): every sweep config is
AOT-compiled (jit(...).lower().compile()) on its own WORKER THREAD up
front. Compilation runs in the remote compile-helper pool (not on the
TPU), so the configs' compiles overlap each other — total compile wall
time is the slowest config (~4 min for 100-view), not the ~20-minute sum
that deleted four protocol metrics in round 4. Measurements start as soon
as their config's executable is ready.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

# MEASURED A100 baseline bound (BASELINE.md "Measured reference row",
# scripts/measure_reference_baseline.py): the reference-shaped torch model
# (636M params) measured at 63.2 s / 2-view @518 on this CPU validates an
# analytic 2.576 TFLOP/view; A100 bf16 (312 TFLOP/s peak) then bounds the
# torch baseline to [24.2 @20% MFU, 66.6 @55% MFU] views/s. vs_baseline uses
# the 20%-MFU bound — conservative FOR US (an e2e torch pipeline with its
# memory-bound full-res DPT and host sync is unlikely to exceed it).
A100_BASELINE_VIEWS_PER_SEC = 24.2
A100_BASELINE_HIGH_BOUND = 66.6

DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
_T0 = time.time()


def _left() -> float:
    return DEADLINE_S - (time.time() - _T0)


def _probe_device(timeout_s: float = 300.0) -> None:
    """Fail FAST with a diagnostic if the TPU tunnel is down.

    Backend init over the axon tunnel HANGS indefinitely when the remote
    worker is dead (observed: a worker crash left jax.devices() blocked for
    hours) — without this guard the bench would sit silent until the
    driver's timeout and record nothing actionable. A healthy tunnel
    completes first contact in well under 300 s.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((64, 64)); "
            "print(float((x @ x).sum()))")
    for attempt in (1, 2):
        try:
            subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           check=True, capture_output=True)
            return
        except subprocess.TimeoutExpired:
            msg = (f"TPU backend init timed out after {timeout_s:.0f}s — "
                   "the axon tunnel / remote worker is down")
        except subprocess.CalledProcessError as e:
            msg = f"TPU probe failed: {e.stderr.decode(errors='replace')[-400:]}"
        if attempt == 1:
            # a worker mid-restart often comes back within a few minutes —
            # one bounded retry before declaring the round unmeasurable
            print(f"# {msg}; retrying once in 120s", flush=True)
            time.sleep(120)
    print(f"# FATAL: {msg}; no metric can be measured", flush=True)
    sys.exit(2)


def main():
    _probe_device()
    # persistent XLA compile cache: repeat bench runs skip the long compiles
    try:
        cache_dir = os.path.expanduser("~/.cache/mapanything_tpu_xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from mapanything_tpu.models import (
        GeometricInputConfig,
        MapAnything,
        MapAnythingConfig,
        images_only_config,
        jit_init,
        resolve_memory_policy,
    )
    from mapanything_tpu.utils.inference import postprocess_outputs

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    cfg = MapAnythingConfig(dtype=jnp.bfloat16, fold_layerscale=True)
    model = MapAnything(cfg=cfg)
    rng = np.random.default_rng(0)

    def make_views(b, v, h, w, multimodal=False):
        # standard_normal(dtype=float32): rng.normal would materialize a
        # float64 intermediate (~640 MB at 100 views) on the 1-CPU host
        views = {
            "img": jnp.asarray(
                rng.standard_normal(size=(b, v, h, w, 3),
                                    dtype=np.float32) * np.float32(0.3)
            )
        }
        if multimodal:
            rays = rng.standard_normal(size=(b, v, h, w, 3),
                                       dtype=np.float32)
            rays[..., 2] = np.abs(rays[..., 2]) + 1.0
            rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
            q = rng.normal(size=(b, v, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            views["ray_directions_cam"] = jnp.asarray(rays)
            views["camera_pose_quats"] = jnp.asarray(q)
            views["camera_pose_trans"] = jnp.asarray(
                rng.normal(size=(b, v, 3)).astype(np.float32)
            )
            views["is_metric_scale"] = jnp.ones((b, v), dtype=bool)
        return views

    images_only = images_only_config()
    multimodal_cfg = GeometricInputConfig(
        overall_prob=1.0, dropout_prob=0.0, ray_dirs_prob=1.0,
        depth_prob=0.0, cam_prob=1.0,
    )

    # Params: init once abstractly per input signature family. The prior
    # encoders only materialize when conditioning inputs are present, so
    # init with the multimodal signature (superset) and reuse everywhere.
    # numpy-filled from the abstract init (instant; values don't change
    # timing — every hot op is data-independent, incl. the fixed-iteration
    # percentile bisection) instead of a device jit_init whose init program
    # costs its own ~minute compile before the AOT pool can start.
    sig_views = make_views(1, 2, 210, 518, multimodal=True)
    params_sds = jax.eval_shape(
        lambda: jit_init(model, jax.random.PRNGKey(0), sig_views,
                         multimodal_cfg))
    _prng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            _prng.standard_normal(s.shape, dtype=np.float32) * 0.02, s.dtype),
        params_sds)
    del sig_views

    def views_sds(b, v, hh, ww, multimodal=False):
        """ShapeDtypeStruct mirror of make_views (no host arrays built)."""
        sds = {"img": jax.ShapeDtypeStruct((b, v, hh, ww, 3), jnp.float32)}
        if multimodal:
            sds["ray_directions_cam"] = jax.ShapeDtypeStruct(
                (b, v, hh, ww, 3), jnp.float32)
            sds["camera_pose_quats"] = jax.ShapeDtypeStruct(
                (b, v, 4), jnp.float32)
            sds["camera_pose_trans"] = jax.ShapeDtypeStruct(
                (b, v, 3), jnp.float32)
            sds["is_metric_scale"] = jax.ShapeDtypeStruct((b, v), jnp.bool_)
        return sds

    def build(geom, b, v, hh=None, ww=None, multimodal=False):
        """AOT-compile one sweep config; runs on a worker thread.

        Memory-efficiency knobs resolved per shape (round-4 VERDICT item
        1a): small view counts run fully dense; larger ones get exactly
        the chunking HBM needs (models.resolve_memory_policy, calibrated
        by scripts/perf/manyview_policy_probe.py).
        """
        hh, ww = hh or h, ww or w
        pol = resolve_memory_policy(cfg, b, v, hh, ww)
        run_model = (model if pol.cfg == cfg else MapAnything(cfg=pol.cfg))
        # Forward and postprocess stay SEPARATELY jitted — fusing them into
        # one program makes XLA's optimization passes superlinear (~490s
        # compile vs ~50s split, see utils/inference.py). Both dispatches
        # are async, so the sustained (pipelined) measurement overlaps them.
        vw_sds = views_sds(b, v, hh, ww, multimodal)
        fwd_jit = jax.jit(
            lambda p, vw: run_model.apply(
                p, vw, geom, memory_efficient=pol.memory_efficient)
        )
        preds_sds = jax.eval_shape(fwd_jit, params, vw_sds)
        fwd = fwd_jit.lower(params, vw_sds).compile()
        if pol.memory_efficient:
            # chunked postprocess + donated preds: fp32 intermediates exist
            # only at chunk width and XLA reuses the forward's output
            # buffers, which is what lets 100+ views fit 16 GB
            post_c = jax.jit(
                lambda preds, imgs: postprocess_outputs(
                    preds, imgs, apply_mask=True, mask_edges=True,
                    apply_confidence_mask=True,
                    view_chunk=pol.post_view_chunk,
                ),
                donate_argnums=(0,),
            ).lower(preds_sds, vw_sds["img"]).compile()
        else:
            post_c = jax.jit(
                lambda preds, imgs: postprocess_outputs(
                    preds, imgs, apply_mask=True, mask_edges=True,
                    apply_confidence_mask=True,
                )
            ).lower(preds_sds, vw_sds["img"]).compile()

        def infer_fn(p, vw):
            return post_c(fwd(p, vw), vw["img"])

        return infer_fn

    # NOTE: jax.block_until_ready is a no-op over the axon TPU tunnel — the
    # only honest completion barrier is a host value fetch.
    def timed(fn, p, v, iters):
        out = fn(p, v)
        _ = float(out["metric_scaling_factor"][0])  # compile + warmup
        lat = []
        for _i in range(iters):
            t0 = time.time()
            out = fn(p, v)
            _ = float(out["metric_scaling_factor"][0])
            lat.append(time.time() - t0)
        return float(np.median(lat))

    def timed_sustained(fn, p, v, iters):
        """Steady-state serving throughput: dispatch `iters` forwards
        back-to-back and fetch once at the end, so device compute overlaps
        the per-call tunnel RTT (~35 ms) exactly as a serving pipeline with
        in-flight requests does. The per-call `timed` p50 (one fetch per
        call) is reported alongside as the request LATENCY."""
        out = fn(p, v)
        _ = float(out["metric_scaling_factor"][0])  # warm
        t0 = time.time()
        for _i in range(iters):
            out = fn(p, v)
        _ = float(out["metric_scaling_factor"][0])
        return (time.time() - t0) / iters

    extras = {}

    # ---- AOT compile pool: all sweep configs concurrently ----------------
    # Submitted longest-first so the critical path starts immediately; the
    # helper pool compiles them in parallel while measurements proceed in
    # protocol order as each executable lands.
    b, v, h, w = 4, 2, 518, 518
    def build_logged(tag, *a, **kw):
        t0 = time.time()
        r = build(*a, **kw)
        print(f"# compile[{tag}] ready after {time.time() - t0:.0f}s "
              f"(elapsed {time.time() - _T0:.0f}s)", flush=True)
        return r

    # Submission order matters when the remote helper pool has few slots:
    # the HEADLINE config goes first so its measurement starts as early as
    # possible, then the big many-view compiles (the critical path), then
    # the cheap configs that can slot into any gap.
    pool = ThreadPoolExecutor(max_workers=7)
    futs = {
        "2v": pool.submit(build_logged, "2v", images_only, b, v),
        "100v": pool.submit(build_logged, "100v", images_only, 1, 100),
        "32v": pool.submit(build_logged, "32v", images_only, 1, 32),
        "mm4v": pool.submit(build_logged, "mm4v", multimodal_cfg, 1, 4,
                            None, None, True),
        "1v": pool.submit(build_logged, "1v", images_only, 1, 1),
    }

    # Warm the persistent cache for the end-of-run view-ceiling probe NOW,
    # in a concurrent subprocess (see view_ceiling_probe.py --compile-only):
    # its ~400s fresh compile otherwise lands inside the end-of-budget
    # timeout window and times out (observed in the first full-protocol
    # round-5 run). Fire-and-forget; the real probe checks the cache.
    import subprocess
    import sys

    probe_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "view_ceiling_probe.py")
    probe_warm = subprocess.Popen(
        [sys.executable, probe_path, "192", "--compile-only"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    # Train-step compiles ride the same pool. Only the COMPILE runs here
    # (against ShapeDtypeStructs): the real TrainState (params + ~5 GB of
    # AdamW moments) is built at measurement time so it never overlaps the
    # 32/100-view sweeps' HBM.
    from mapanything_tpu.data.synthetic import make_synthetic_batch
    from mapanything_tpu.models import aug_training_config
    from mapanything_tpu.train import (
        OptimConfig,
        OverallLossConfig,
        create_train_state,
        make_train_step,
    )

    tgeom = aug_training_config()

    def lower_train(tb, tv, th, tw, remat):
        tcfg = MapAnythingConfig(
            dtype=jnp.bfloat16,
            encoder_gradient_checkpointing=remat,
            trunk_gradient_checkpointing=remat,
        )
        tmodel = MapAnything(cfg=tcfg)
        batch = make_synthetic_batch(tb, tv, th, tw, seed=0)
        batch_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
            batch)
        tparams_sds = jax.eval_shape(
            lambda: jit_init(tmodel, jax.random.PRNGKey(0), batch["views"],
                             tgeom, rng=jax.random.PRNGKey(1)))
        state_sds = jax.eval_shape(
            lambda p: create_train_state(tmodel, p, OptimConfig()),
            tparams_sds)
        step = jax.jit(
            make_train_step(tmodel, tgeom, OverallLossConfig()),
            donate_argnums=(0,),
        ).lower(state_sds, batch_sds, jax.random.PRNGKey(2)).compile()
        return step, state_sds, batch

    # (tb, tv, th, tw, key, want_mfu, need_s, remat): the small shape is the
    # cross-round comparison point (remat ON, matching rounds 3-4); the 518
    # shape is where train MFU is reported — its activations fit 16 GB
    # WITHOUT gradient checkpointing, so the tuned remat policy is OFF
    # (the same trace-time auto-policy argument as resolve_memory_policy);
    # MFU counts model FLOPs only, so this is also the honest number (no
    # hidden recompute).
    train_shapes = [
        (2, 4, 196, 252, "train_step_ms_2x4v_196x252", False, 240, True),
        (1, 4, 518, 518, "train_step_ms_1x4v_518", True, 420, False),
    ]
    train_futs = {
        key: pool.submit(lower_train, tb, tv, th, tw, remat)
        for tb, tv, th, tw, key, _mfu, _need, remat in train_shapes
    }

    # ---- primary: batched 2-view throughput (BASELINE config 2) ----------
    infer2 = futs["2v"].result()
    views2 = make_views(b, v, h, w)
    t0 = time.time()
    p50_2 = timed(infer2, params, views2, iters=10)
    sus_2 = timed_sustained(infer2, params, views2, iters=12)
    print(f"# 2-view batch4: p50 {p50_2 * 1000:.0f} ms, sustained "
          f"{sus_2 * 1000:.0f} ms/call "
          f"(incl. compile {time.time() - _T0:.0f}s total)", flush=True)
    # The headline is the steady-state sustained throughput. On a
    # dispatch-starved host (1-CPU VM) the Python dispatch loop itself can
    # become the bottleneck and sustained comes out WORSE than the
    # fetch-per-call p50; only in that detected case fall back to p50
    # (ADVICE r3: gate the fallback and record which measurement produced
    # the headline instead of a silent min()).
    if sus_2 > p50_2 * 1.02:  # starved: sustained lost its RTT advantage
        headline_t, extras["headline_source"] = p50_2, "p50_dispatch_starved"
    else:
        headline_t, extras["headline_source"] = sus_2, "sustained"
    views_per_sec = (b * v) / headline_t
    extras["p50_e2e_latency_2view_b4_ms"] = round(p50_2 * 1000, 1)
    extras["sustained_ms_per_call_2view_b4"] = round(sus_2 * 1000, 1)
    # e2e MFU at the headline config (analytic forward FLOPs over the full
    # end-to-end time, so postprocess/RTT overheads count against it)
    from mapanything_tpu.utils.flops import (
        V5E_BF16_PEAK_FLOPS,
        analytic_flops,
        attention_matmul_flops,
        global_attention_tokens,
        train_step_flops,
    )

    fwd_flops_2v = analytic_flops(518, 2)["total"]
    extras["e2e_mfu_pct"] = round(
        100 * b * fwd_flops_2v / headline_t / V5E_BF16_PEAK_FLOPS, 1)

    # ---- extras: BASELINE configs 1, 3, 4, 5 ------------------------------
    sweeps = [
        # (key, fut, b, v, iters, multimodal)
        ("p50_e2e_latency_1view_ms", "1v", 1, 1, 5, False),
        ("p50_e2e_latency_multimodal_4view_ms", "mm4v", 1, 4, 5, True),
        ("p50_e2e_latency_32view_ms", "32v", 1, 32, 3, False),
        ("p50_e2e_latency_100view_ms", "100v", 1, 100, 2, False),
    ]
    for key, fut, bb, vv, iters, mm in sweeps:
        if _left() < 120:
            print(f"# deadline: skipping {key}", flush=True)
            continue
        try:
            t_build = time.time()
            fn = futs[fut].result()
            vws = make_views(bb, vv, h, w, multimodal=mm)
            p50 = timed(fn, params, vws, iters=iters)
            extras[key] = round(p50 * 1000, 1)
            extras[key.replace("p50_e2e_latency_", "views_per_sec_").replace(
                "_ms", "")] = round(bb * vv / p50, 2)
            print(f"# {key}: {p50 * 1000:.0f} ms "
                  f"(phase {time.time() - t_build:.0f}s, "
                  f"elapsed {time.time() - _T0:.0f}s)", flush=True)
            if vv <= 4:
                # small configs: the fetch-per-call p50 is dominated by the
                # ~25-30 ms axon-tunnel RTT that a local serving host would
                # not pay; report the pipelined sustained rate alongside
                # (same steady-state semantics as the headline config)
                sus = timed_sustained(fn, params, vws, iters=10)
                skey = key.replace("p50_e2e_latency_", "sustained_")
                extras[skey] = round(sus * 1000, 1)
                if vv == 1:
                    extras["breakdown_1view"] = (
                        f"{sus * 1000:.0f}ms device compute (sustained) + "
                        f"{(p50 - sus) * 1000:.0f}ms tunnel RTT/fetch")
                print(f"#   sustained: {sus * 1000:.0f} ms/call", flush=True)
            del vws
            if vv >= 32:
                # per-config A100 bracket: attention is quadratic in views,
                # so the 2-view-derived headline baseline (2.576 TFLOP/view)
                # understates the reference's cost here. Same analytic FLOPs
                # + A100 bf16 peak (312 TF/s) at the same [20%, 55%] MFU
                # bracket as BASELINE.md's measured reference row.
                per_view_tf = analytic_flops(518, vv)["total"] / vv
                lo = 312e12 * 0.20 / per_view_tf
                hi = 312e12 * 0.55 / per_view_tf
                extras[f"vs_a100_{vv}view"] = round((bb * vv / p50) / lo, 2)
                extras[f"vs_a100_{vv}view_high_bound"] = round(
                    (bb * vv / p50) / hi, 2)
        except Exception as e:  # keep the primary metric printable
            print(f"# {key} failed: {type(e).__name__}: {e}", flush=True)
    pool.shutdown(wait=False)

    # ---- extra: training-step throughput (flash bwd + remat policy) ------
    if _left() > 240:
        try:
            import optax  # noqa: F401

            for tb, tv, th, tw, key, want_mfu, need_s, remat in train_shapes:
                if _left() < need_s:
                    print(f"# deadline: skipping {key}", flush=True)
                    continue
                step, state_sds, batch = train_futs[key].result()
                # numpy-fill the WHOLE TrainState from the abstract state the
                # step was lowered against (identical pytree metadata — a
                # fresh create_train_state would embed different optax
                # closures and fail the executable's pytree check). Values
                # don't change step timing; int leaves (step counter) fill
                # as 0, moment noise is as AdamW-shaped as zeros.
                _rng = np.random.default_rng(0)
                state = jax.tree.map(
                    lambda s: jnp.asarray(
                        _rng.standard_normal(s.shape, dtype=np.float32)
                        * 0.02, s.dtype),
                    state_sds)
                state, m = step(state, batch, jax.random.PRNGKey(2))
                _ = float(m["loss"])  # warm
                # Sustained: the real training loop dispatches steps
                # back-to-back (donated state) and fetches each iteration's
                # metrics one step LATE (train/loop.py pipelined tripwire),
                # so steady-state throughput overlaps the tunnel RTT
                # exactly like the loop does.
                n_steps = 6 if th < 300 else 4
                t0 = time.time()
                for i in range(n_steps):
                    state, m = step(state, batch, jax.random.PRNGKey(3 + i))
                _ = float(m["loss"])
                st = (time.time() - t0) / n_steps
                extras[key] = round(st * 1000, 1)
                msg = (f"# train step {tb}x{tv}v@{th}x{tw} remat={remat}: "
                       f"{st * 1000:.0f} ms sustained "
                       f"({tb * tv / st:.1f} imgs/s)")
                if want_mfu:
                    mfu = (tb * train_step_flops(th, tv, tw) / st
                           / V5E_BF16_PEAK_FLOPS)
                    extras["train_mfu_pct"] = round(100 * mfu, 1)
                    msg += f", MFU {100 * mfu:.1f}%"
                else:
                    extras["train_imgs_per_sec"] = round(tb * tv / st, 2)
                print(msg, flush=True)
                # Free the optimizer state between shapes and before the
                # view-ceiling ladder: the AdamW moments alone hold ~5 GB
                # (2x fp32 params) and poisoned every ceiling probe down to
                # 128 views when left alive.
                del state, m, step, batch
        except Exception as e:
            print(f"# train-step extra failed: {type(e).__name__}: {e}",
                  flush=True)
    else:
        print("# deadline: skipping train-step extra", flush=True)
    import gc

    gc.collect()

    # ---- view-count ceiling demo (round-2 VERDICT item 2) -----------------
    # The reference claims ~2000 views on a 140 GB GPU (README.md:132),
    # pro-rating to ~230 on this 16 GB chip; 192 fits (XLA memory analysis
    # 14.6 GiB), 256 needs 16.4 GiB and CRASHES the TPU worker, so the
    # ladder tops out at 192. Each probe runs in a SUBPROCESS
    # (scripts/view_ceiling_probe.py): in-process, the executables already
    # loaded by the sweeps above pin enough device scratch that even 128
    # views OOMs, and a fresh client also shields this process from
    # allocator poisoning if a probe fails.
    import subprocess
    import sys

    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "view_ceiling_probe.py")
    # reap the start-of-run cache-warming subprocess; give it a bounded
    # grace period so the 192 probe below doesn't duplicate its compile
    try:
        probe_warm.wait(timeout=max(0.0, min(120.0, _left() - 200.0)))
    except Exception:
        probe_warm.kill()
    ladder = (192, 160, 128)
    for vv in ladder:
        if _left() < 150:
            print(f"# deadline: skipping {vv}-view ceiling probe", flush=True)
            break
        try:
            r = subprocess.run(
                [sys.executable, probe, str(vv)],
                capture_output=True, text=True,
                timeout=min(900.0, max(_left(), 150.0)),
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            res = json.loads(line) if line.startswith("{") else {}
            if r.returncode == 0 and res.get("ok"):
                extras[f"p50_e2e_latency_{vv}view_ms"] = res["ms"]
                extras["view_ceiling_per_chip"] = vv
                print(f"# view ceiling: {vv} views, {res['ms']:.0f} ms",
                      flush=True)
                break
            err = (r.stderr.strip().splitlines()[-1][:160]
                   if r.stderr.strip() else "")
            print(f"# {vv}-view probe failed (rc={r.returncode}): {err}",
                  flush=True)
            # scan the FULL stderr+stdout for crash markers (ADVICE r3:
            # the marker is often on an earlier line than the truncated
            # last one), and skip the restart wait after the final rung —
            # there is no next probe to protect
            full = (r.stderr or "") + (r.stdout or "")
            if vv != ladder[-1] and (
                    "UNAVAILABLE" in full or "crashed" in full):
                # a probe that crashed the remote TPU worker leaves it
                # restarting; give it time before the next rung or that
                # rung fails on connection, not memory
                wait = min(45.0, max(_left() - 150.0, 0.0))
                print(f"# waiting {wait:.0f}s for TPU worker restart",
                      flush=True)
                time.sleep(wait)
        except Exception as e:
            print(f"# {vv}-view probe failed: {type(e).__name__}", flush=True)

    # ---- extra: achieved flash TF/s at the global-attention shapes -------
    # (round-3 VERDICT item 8: the "kernel sustains its plateau across the
    # view sweep" claim, measured per round instead of asserted.) Times the
    # production multi-block kernel at exactly the (tokens, heads, d) the
    # trunk's global layers see at 32/100/192 views @518.
    if _left() > 200:
        from mapanything_tpu.ops.flash_attention import flash_attention

        for vv in (32, 100, 192):
            if _left() < 120:
                print(f"# deadline: skipping flash telemetry {vv}v",
                      flush=True)
                break
            qkv = out = None
            try:
                ntok = global_attention_tokens(518, vv)
                # build directly in float32 (standard_normal dtype arg) —
                # rng.normal materializes float64 (~2.2 GB x3 at 192v) on
                # a dispatch-starved 1-CPU host (ADVICE r4)
                qkv = [
                    jnp.asarray(
                        rng.standard_normal(
                            size=(1, ntok, 16, 64),
                            dtype=np.float32) * np.float32(0.2),
                        jnp.bfloat16)
                    for _ in range(3)
                ]
                fl = jax.jit(flash_attention)
                out = fl(*qkv)
                _ = float(jnp.asarray(out[0, 0, 0, 0]))  # compile + warm
                iters = 3 if vv < 150 else 2
                t0 = time.time()
                for _i in range(iters):
                    out = fl(*qkv)
                _ = float(jnp.asarray(out[0, 0, 0, 0]))
                dt = (time.time() - t0) / iters
                tfs = attention_matmul_flops(ntok, 1024) / dt / 1e12
                extras[f"flash_tflops_{vv}view"] = round(tfs, 1)
                print(f"# flash global-attn {vv}v ({ntok} tok): "
                      f"{dt * 1000:.0f} ms, {tfs:.1f} TF/s", flush=True)
            except Exception as e:
                print(f"# flash telemetry {vv}v failed: "
                      f"{type(e).__name__}: {e}", flush=True)
            finally:
                # always free the ~GB-scale device buffers — a failed shape
                # must not poison the train-step / view-ceiling HBM budget
                del qkv, out

    print(
        json.dumps(
            {
                "metric": "views_per_sec_per_chip_518",
                "value": round(views_per_sec, 3),
                "unit": "views/s",
                "vs_baseline": round(
                    views_per_sec / A100_BASELINE_VIEWS_PER_SEC, 3
                ),
                "extras": dict(
                    extras,
                    vs_baseline_high_bound=round(
                        views_per_sec / A100_BASELINE_HIGH_BOUND, 3
                    ),
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
