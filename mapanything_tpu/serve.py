"""Production serving: shape-bucketed request batching over one device.

The reference's serving surface is an interactive gradio demo
(reference gradio_app.py / mapanything/utils/hf_utils/*, absent from this
environment); a TPU deployment wants a different shape anyway. Three facts
drive this design:

  * one compiled program per static (batch, views, resolution, flags)
    signature — so the server must funnel traffic into a bounded signature
    set (resolution buckets x nice batch sizes) or compile forever;
  * device dispatch is async — a single device-owner thread can keep the
    chip busy while HTTP threads only serialize/deserialize;
  * per-call host->device round-trips are expensive over a remote tunnel
    (~35 ms here) — batching concurrent requests into one forward amortizes
    them.

`BatchingEngine` owns the device: HTTP (or library) callers `submit()`
scenes and get a Future; the engine groups compatible scenes — same view
count, resolution bucket, modality set and flag set — into one batched
forward, padding the batch up to a "nice" size (1/2/4/8) by replicating
the last scene so the compile cache stays bounded, then splits results.

`InferenceServer` is a stdlib ThreadingHTTPServer speaking numpy-npz:

    POST /v1/infer   body: .npz with "images" (V, H, W, 3) float in [0, 1]
                     (or uint8), optional "intrinsics" (V, 3, 3),
                     "depth_z" (V, H, W), "camera_poses" (V, 4, 4),
                     "is_metric_scale" (V,); query params map to
                     InferencePipeline.infer flags (e.g. ?task=mvs,
                     &apply_confidence_mask=1).
                     response: .npz with the per-view stacked outputs
                     (pts3d (V, H, W, 3), depth_z, conf, mask, intrinsics,
                     camera_poses, ...).
    GET  /healthz    liveness (200 once the warmup forward finished).
    GET  /v1/stats   JSON counters (requests, batched calls, bucket keys).

No third-party server deps; `scripts/serve.py` is the CLI entry.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .data.image import find_closest_aspect_ratio, preprocess_inputs

# infer() flags a request may override; everything else is fixed at engine
# construction so it cannot fragment the compile cache.
_REQUEST_FLAGS = (
    "apply_mask",
    "mask_edges",
    "apply_confidence_mask",
    "confidence_percentile",
    "task",
    "memory_efficient_inference",
)

# Per-view output keys worth shipping to clients (host-fetch cost scales
# with this set; pointmaps dominate).
_RESPONSE_KEYS = (
    "pts3d",
    "pts3d_cam",
    "depth_z",
    "conf",
    "mask",
    "non_ambiguous_mask",
    "intrinsics",
    "camera_poses",
    "metric_scaling_factor",
)


@dataclass
class ServeStats:
    requests: int = 0
    batched_calls: int = 0
    scenes_padded: int = 0
    errors: int = 0
    buckets: Dict[str, int] = field(default_factory=dict)

    def as_dict(self) -> Dict[str, Any]:
        return {
            "requests": self.requests,
            "batched_calls": self.batched_calls,
            "scenes_padded": self.scenes_padded,
            "errors": self.errors,
            "buckets": dict(self.buckets),
        }


class _Request:
    __slots__ = ("views", "flags", "future", "key")

    def __init__(self, views, flags, future, key):
        self.views = views
        self.flags = flags
        self.future = future
        self.key = key


def _scene_key(views: List[Dict[str, Any]], flags: Dict[str, Any]):
    """Batchability key: view count + shape + per-view modalities + flags."""
    mods = tuple(
        tuple(sorted(
            k for k in v
            if k in ("intrinsics", "ray_directions", "depth_z",
                     "camera_poses", "is_metric_scale")
        ))
        for v in views
    )
    img = np.asarray(views[0]["img"])
    return (len(views), img.shape, mods, tuple(sorted(flags.items())))


class BatchingEngine:
    """Device-owner thread batching compatible scenes into one forward.

    Args:
        pipeline: `utils.inference.InferencePipeline` (model + params).
        max_batch: largest scene count merged into one forward.
        max_wait_ms: how long the head-of-line request waits for company
            before dispatching (latency <-> throughput knob).
        nice_batches: batch sizes the engine pads up to; bounds the number
            of compiled programs per bucket to len(nice_batches).
    """

    def __init__(self, pipeline, max_batch: int = 4,
                 max_wait_ms: float = 10.0,
                 nice_batches=(1, 2, 4, 8)):
        import concurrent.futures  # stdlib; imported here to keep jax-only deps

        self._futures_mod = concurrent.futures
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # always include max_batch so any group has a nice size >= its own
        self.nice_batches = tuple(sorted(
            {b for b in nice_batches if b <= max_batch} | {max_batch}))
        self.stats = ServeStats()
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    # -- lifecycle ---------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._worker,
                                        name="serve-device-owner",
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0):
        self._stop.set()
        self._q.put(None)  # wake the worker
        if self._thread is not None:
            self._thread.join(timeout)

    # -- client API ----------------------------------------------------------
    def submit(self, views: List[Dict[str, Any]], **flags):
        """Enqueue one scene (list of per-view dicts); returns a Future of
        the per-view output list."""
        unknown = set(flags) - set(_REQUEST_FLAGS)
        if unknown:
            raise ValueError(f"unknown request flags {sorted(unknown)}; "
                             f"allowed: {_REQUEST_FLAGS}")
        fut = self._futures_mod.Future()
        req = _Request(views, flags, fut, _scene_key(views, flags))
        with self._lock:
            self.stats.requests += 1
        self._q.put(req)
        return fut

    def infer(self, views: List[Dict[str, Any]], **flags):
        """Blocking convenience wrapper around submit()."""
        return self.submit(views, **flags).result()

    # -- device owner ----------------------------------------------------------
    def _worker(self):
        # Spilled (different-signature) requests wait here and are served
        # BEFORE the shared queue: re-queuing them at the queue tail would
        # let a sustained stream of one signature starve a minority
        # signature indefinitely. With the deque, a spilled request is the
        # head of the very next round.
        pending: List[_Request] = []
        while not self._stop.is_set():
            if pending:
                head = pending.pop(0)
            else:
                try:
                    head = self._q.get(timeout=0.25)
                except queue.Empty:
                    continue
                if head is None:
                    continue
            group = [head]
            deadline = time.time() + self.max_wait_s
            i = 0
            while i < len(pending) and len(group) < self.max_batch:
                if pending[i].key == head.key:
                    group.append(pending.pop(i))
                else:
                    i += 1
            while len(group) < self.max_batch:
                left = deadline - time.time()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    continue
                if nxt.key == head.key:
                    group.append(nxt)
                else:
                    pending.append(nxt)  # different signature: next round
            self._dispatch(group)

    def _dispatch(self, group: List[_Request]):
        try:
            n_real = len(group)
            n_nice = next((b for b in self.nice_batches if b >= n_real),
                          self.nice_batches[-1])
            padded = group + [group[-1]] * (n_nice - n_real)

            num_views = len(group[0].views)
            merged = []
            for j in range(num_views):
                view = {}
                for k, v0 in group[0].views[j].items():
                    if k == "data_norm_type":
                        view[k] = v0
                    elif isinstance(v0, list):  # metadata (idx/instance/...)
                        view[k] = sum((list(r.views[j][k]) for r in padded),
                                      [])
                    else:
                        view[k] = np.concatenate(
                            [np.asarray(r.views[j][k]) for r in padded],
                            axis=0)
                merged.append(view)

            out_views = self.pipeline.infer(merged, **dict(group[0].flags))

            with self._lock:
                self.stats.batched_calls += 1
                self.stats.scenes_padded += n_nice - n_real
                bkey = str(group[0].key[:2])
                self.stats.buckets[bkey] = self.stats.buckets.get(bkey, 0) + 1

            for i, req in enumerate(group):
                res = [
                    {k: np.asarray(v[i]) for k, v in ov.items()
                     if k in _RESPONSE_KEYS}
                    for ov in out_views
                ]
                req.future.set_result(res)
        except Exception as e:  # noqa: BLE001 — serving must not die
            with self._lock:
                self.stats.errors += 1
            for req in group:
                if not req.future.done():
                    req.future.set_exception(e)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

def _views_from_npz(arrays: Dict[str, np.ndarray], norm_type: str,
                    resolution_set: int) -> List[Dict[str, Any]]:
    """Decode a client npz into preprocessed per-view dicts (bucketed,
    normalized) via data/image.preprocess_inputs."""
    if "images" not in arrays:
        raise ValueError("npz must contain 'images' (V, H, W, 3)")
    imgs = np.asarray(arrays["images"])
    if imgs.ndim != 4 or imgs.shape[-1] != 3:
        raise ValueError(f"'images' must be (V, H, W, 3), got {imgs.shape}")
    v = imgs.shape[0]
    raw_views = []
    for i in range(v):
        view: Dict[str, Any] = {"img": imgs[i]}
        if "intrinsics" in arrays:
            view["intrinsics"] = np.asarray(arrays["intrinsics"])[i]
        if "depth_z" in arrays:
            view["depth_z"] = np.asarray(arrays["depth_z"])[i]
        if "camera_poses" in arrays:
            view["camera_poses"] = np.asarray(arrays["camera_poses"])[i]
        if "is_metric_scale" in arrays:
            view["is_metric_scale"] = bool(
                np.asarray(arrays["is_metric_scale"])[i])
        raw_views.append(view)
    return preprocess_inputs(raw_views, norm_type=norm_type,
                             resolution_set=resolution_set)


def _npz_bytes(per_view: List[Dict[str, np.ndarray]]) -> bytes:
    """Stack per-view outputs along a leading V axis and serialize."""
    out = {}
    for k in per_view[0]:
        out[k] = np.stack([np.asarray(v[k]) for v in per_view], axis=0)
    buf = io.BytesIO()
    np.savez(buf, **out)
    return buf.getvalue()


class InferenceServer:
    """stdlib HTTP front-end over a BatchingEngine."""

    def __init__(self, engine: BatchingEngine, host: str = "127.0.0.1",
                 port: int = 8000, norm_type: str = "dinov2",
                 resolution_set: int = 518):
        self.engine = engine
        self.host = host
        self.port = port
        self.norm_type = norm_type
        self.resolution_set = resolution_set
        self._httpd = None
        self._thread = None
        self.ready = threading.Event()

    def warmup(self, num_views: int = 2):
        """Compile the most common signature before taking traffic: the
        chosen resolution bucket at AR 1.0, images-only."""
        w, h = find_closest_aspect_ratio(1.0, self.resolution_set)
        views = [{"img": np.zeros((h, w, 3), np.float32)}
                 for _ in range(num_views)]
        views = preprocess_inputs(views, norm_type=self.norm_type,
                                  resolution_set=self.resolution_set)
        self.engine.infer(views)
        self.ready.set()

    # -- lifecycle -----------------------------------------------------------
    def start(self, warmup_views: int = 0):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet default stderr access logging
            def log_message(self, fmt, *args):  # noqa: A003
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                if self.path == "/healthz":
                    ok = server.ready.is_set()
                    self._json(200 if ok else 503, {"ok": ok})
                elif self.path == "/v1/stats":
                    self._json(200, server.engine.stats.as_dict())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                if parsed.path != "/v1/infer":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    arrays = dict(np.load(io.BytesIO(self.rfile.read(length)),
                                          allow_pickle=False))
                    qs = {k: vs[-1] for k, vs in
                          parse_qs(parsed.query).items()}
                    flags: Dict[str, Any] = {}
                    for k in _REQUEST_FLAGS:
                        if k not in qs:
                            continue
                        val = qs[k]
                        if k == "task":
                            flags[k] = val
                        elif k == "confidence_percentile":
                            flags[k] = float(val)
                        else:
                            flags[k] = val.lower() in ("1", "true", "yes")
                    views = _views_from_npz(arrays, server.norm_type,
                                            server.resolution_set)
                    per_view = server.engine.infer(views, **flags)
                    body = _npz_bytes(per_view)
                    self.send_response(200)
                    self.send_header("Content-Type", "application/x-npz")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:  # noqa: BLE001
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="serve-http", daemon=True)
        self._thread.start()
        if warmup_views:
            self.warmup(warmup_views)
        else:
            self.ready.set()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(5.0)
