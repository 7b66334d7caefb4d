"""Serving subsystem: request batching + the HTTP surface.

The engine must (1) merge concurrent same-signature scenes into ONE
batched forward, (2) return each scene the same numbers a solo request
gets, (3) keep distinct signatures apart, and the HTTP layer must round-
trip npz scenes end to end (the reference's serving surface is the gradio
demo, gradio_app.py; this is its TPU-native batching replacement)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapanything_tpu.models import (
    MapAnything,
    MapAnythingConfig,
    images_only_config,
    jit_init,
)
from mapanything_tpu.serve import BatchingEngine, InferenceServer
from mapanything_tpu.utils.inference import InferencePipeline

TINY = MapAnythingConfig(
    encoder_size="test",
    trunk_dim=64,
    trunk_depth=2,
    trunk_num_heads=2,
    trunk_indices=(0, 1),
    dpt_feature_dim=32,
    dpt_out_channels=(32, 32, 32, 32),
    dpt_hidden_dims=(16, 8),
    dense_head_chunk=2,
    dtype=jnp.float32,
)
H, W = 28, 42


def _scene(seed, h=H, w=W):
    rng = np.random.default_rng(seed)
    return [
        {"img": rng.normal(size=(1, h, w, 3)).astype(np.float32) * 0.3,
         "data_norm_type": ["dinov2"]}
        for _ in range(2)
    ]


@pytest.fixture(scope="module")
def engine():
    model = MapAnything(cfg=TINY)
    views = {"img": jnp.zeros((1, 2, H, W, 3), jnp.float32)}
    params = jit_init(model, jax.random.PRNGKey(0), views,
                      images_only_config())
    eng = BatchingEngine(InferencePipeline(model, params), max_batch=4,
                         max_wait_ms=200.0).start()
    yield eng
    eng.stop()


class TestBatchingEngine:
    def test_concurrent_scenes_batch_into_one_call(self, engine):
        scenes = [_scene(i) for i in range(3)]
        solo = engine.infer(scenes[0])  # also warms the compile cache
        calls_before = engine.stats.batched_calls

        futs = [engine.submit(s) for s in scenes]
        outs = [f.result(timeout=120) for f in futs]

        # 3 concurrent same-signature scenes -> fewer forwards than scenes
        calls = engine.stats.batched_calls - calls_before
        assert calls < 3, f"no batching happened ({calls} calls)"

        # batched result == solo result for the same scene (tolerance:
        # B=1 and B=4 are different XLA programs with different reduction
        # orders — a few 1e-6-level ulps on near-zero masked values)
        np.testing.assert_allclose(
            outs[0][0]["pts3d"], solo[0]["pts3d"], rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            outs[0][1]["depth_z"], solo[1]["depth_z"], rtol=1e-4, atol=1e-5,
        )
        # different scenes produce different outputs (no cross-talk)
        assert not np.allclose(outs[0][0]["pts3d"], outs[1][0]["pts3d"])
        for out in outs:
            assert len(out) == 2
            for ov in out:
                assert np.isfinite(ov["pts3d"]).all()

    def test_distinct_flags_never_merge(self, engine):
        f1 = engine.submit(_scene(10), apply_confidence_mask=True)
        f2 = engine.submit(_scene(11), apply_confidence_mask=False)
        o1, o2 = f1.result(timeout=300), f2.result(timeout=300)
        assert o1[0]["pts3d"].shape == o2[0]["pts3d"].shape
        assert engine.stats.errors == 0

    def test_unknown_flag_rejected(self, engine):
        with pytest.raises(ValueError, match="unknown request flags"):
            engine.submit(_scene(12), bogus=True)

    def test_error_propagates_without_killing_worker(self, engine):
        bad = [{"img": np.zeros((1, H, W, 3), np.float32)}]  # missing norm
        with pytest.raises(ValueError):
            engine.submit(bad).result(timeout=60)
        # engine still alive
        ok = engine.infer(_scene(13))
        assert np.isfinite(ok[0]["pts3d"]).all()


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def server(self, engine):
        # 518-bucket preprocessing would upscale the tiny test images to a
        # full-size bucket; serve the raw resolution instead by monkeying
        # the bucket tables is out of scope — the tiny model accepts any
        # multiple of its patch size, and preprocess picks the 518 bucket,
        # so use a tiny custom resolution_set entry.
        from mapanything_tpu.data import image as image_mod

        image_mod.RESOLUTION_MAPPINGS[42] = {1.5: (42, 28)}
        srv = InferenceServer(engine, host="127.0.0.1", port=0,
                              resolution_set=42).start(warmup_views=0)
        yield srv
        srv.stop()
        del image_mod.RESOLUTION_MAPPINGS[42]

    def _url(self, server, path):
        return f"http://{server.host}:{server.port}{path}"

    def test_healthz_and_stats(self, server):
        with urllib.request.urlopen(self._url(server, "/healthz")) as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(self._url(server, "/v1/stats")) as r:
            stats = json.loads(r.read())
        assert "requests" in stats and "batched_calls" in stats

    def test_infer_roundtrip(self, server):
        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, size=(2, H, W, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, images=imgs)
        req = urllib.request.Request(
            self._url(server, "/v1/infer"), data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            out = dict(np.load(io.BytesIO(r.read())))
        assert out["pts3d"].shape == (2, H, W, 3)
        assert np.isfinite(out["pts3d"]).all()
        assert out["intrinsics"].shape == (2, 3, 3)

    def test_concurrent_http_requests(self, server):
        rng = np.random.default_rng(1)
        results, errors = [], []

        def post(seed):
            try:
                imgs = rng.uniform(0, 1, size=(2, H, W, 3)).astype(
                    np.float32)
                buf = io.BytesIO()
                np.savez(buf, images=imgs)
                req = urllib.request.Request(
                    self._url(server, "/v1/infer"), data=buf.getvalue(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    results.append(dict(np.load(io.BytesIO(r.read()))))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        assert not errors, errors
        assert len(results) == 3

    def test_bad_request_is_400(self, server):
        req = urllib.request.Request(
            self._url(server, "/v1/infer"), data=b"not an npz",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400


class TestShardedServing:
    """Multi-chip serving: the engine runs unchanged with tensor-parallel
    sharded params on a device mesh (virtual 8-CPU mesh here), and the
    batched outputs match the unsharded single-device result."""

    def test_tp_sharded_engine_matches_unsharded(self):
        from mapanything_tpu.parallel import make_mesh, shard_params

        model = MapAnything(cfg=TINY)
        views = {"img": jnp.zeros((1, 2, H, W, 3), jnp.float32)}
        params = jit_init(model, jax.random.PRNGKey(0), views,
                          images_only_config())
        scene = _scene(21)

        plain = BatchingEngine(InferencePipeline(model, params),
                               max_batch=2).start()
        try:
            ref = plain.infer(scene)
        finally:
            plain.stop()

        mesh = make_mesh(n_data=4, n_model=2)
        sharded_params = shard_params(params, mesh)
        with mesh:
            eng = BatchingEngine(InferencePipeline(model, sharded_params),
                                 max_batch=2).start()
            try:
                out = eng.infer(scene)
            finally:
                eng.stop()

        np.testing.assert_allclose(
            out[0]["pts3d"], ref[0]["pts3d"], rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            out[1]["depth_z"], ref[1]["depth_z"], rtol=1e-4, atol=1e-5,
        )


class TestMetricScaleRequests:
    def test_metric_scale_scenes_batch_and_key_separately(self, engine):
        """is_metric_scale is a batchable per-view array AND part of the
        signature key, so flagged scenes never merge behind flagless ones
        (previously: np.concatenate over 0-d bools crashed the group)."""
        scene_plain = _scene(30)
        scene_metric = _scene(31)
        for view in scene_metric:
            view["is_metric_scale"] = np.asarray([True])

        errors_before = engine.stats.errors  # fixture is module-shared
        f1 = engine.submit(scene_plain)
        f2 = engine.submit(scene_metric)
        o1, o2 = f1.result(timeout=300), f2.result(timeout=300)
        assert engine.stats.errors == errors_before
        assert np.isfinite(o1[0]["pts3d"]).all()
        assert np.isfinite(o2[0]["pts3d"]).all()

    def test_http_is_metric_scale_roundtrip(self, engine):
        """The documented npz field works end to end."""
        from mapanything_tpu.data import image as image_mod
        from mapanything_tpu.serve import InferenceServer

        image_mod.RESOLUTION_MAPPINGS[43] = {1.5: (42, 28)}
        srv = InferenceServer(engine, host="127.0.0.1", port=0,
                              resolution_set=43).start(warmup_views=0)
        try:
            rng = np.random.default_rng(2)
            imgs = rng.uniform(0, 1, size=(2, H, W, 3)).astype(np.float32)
            buf = io.BytesIO()
            np.savez(buf, images=imgs,
                     is_metric_scale=np.asarray([True, True]))
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}/v1/infer",
                data=buf.getvalue(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                out = dict(np.load(io.BytesIO(r.read())))
            assert np.isfinite(out["pts3d"]).all()
        finally:
            srv.stop()
            del image_mod.RESOLUTION_MAPPINGS[43]


class TestCheckpointServing:
    def test_orbax_checkpoint_path(self, tmp_path):
        """The scripts/serve.py --checkpoint recipe: save params, load via
        from_pretrained (model+params built CONSISTENTLY — regression:
        serve.py imported a nonexistent models.pretrained.load_params and
        separately enabled fold_layerscale over unfolded params, silently
        dropping every LayerScale gamma)."""
        import pathlib

        src = pathlib.Path("scripts/serve.py").read_text()
        assert "from mapanything_tpu.models.pretrained import load_params" \
            not in src
        assert "fold_layerscale=args.checkpoint" not in src

        import jax

        from mapanything_tpu.models import images_only_config, jit_init
        from mapanything_tpu.models.pretrained import from_pretrained
        from mapanything_tpu.train.checkpoints import save_params

        model = MapAnything(cfg=TINY)
        views = {"img": jnp.zeros((1, 2, H, W, 3), jnp.float32)}
        params = jit_init(model, jax.random.PRNGKey(0), views,
                          images_only_config())
        ckpt = tmp_path / "params_ckpt"
        save_params(str(ckpt), params)

        m2, p2 = from_pretrained(
            str(ckpt), dtype=jnp.float32,
            config_overrides={
                f: getattr(TINY, f)
                for f in ("encoder_size", "trunk_dim", "trunk_depth",
                          "trunk_num_heads", "trunk_indices",
                          "dpt_feature_dim", "dpt_out_channels",
                          "dpt_hidden_dims")
            })
        out = jax.jit(lambda p, v: m2.apply(p, v, images_only_config()))(
            p2, views)
        ref = jax.jit(lambda p, v: model.apply(p, v, images_only_config()))(
            params, views)
        np.testing.assert_allclose(np.asarray(out["pts3d"]),
                                   np.asarray(ref["pts3d"]), atol=0)
