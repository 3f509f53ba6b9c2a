"""HTTP serving layer: the query engine behind a JSON API.

The reference is batch scripts only; this is the production-serving shim
the framework is meant to power (stdlib-only, no server dependency):

  GET  /healthz          -> {"ok": true, "rows": N, "dim": D}
  GET  /v1/stats         -> per-stage serving counters (StageStats: total
                            seconds, item counts, items/s per endpoint
                            stage — the cascade's stage-timer observability
                            (union_clip_llava2.py:263-268) for the server)
  POST /v1/search        -> {"hits": [[{path, score, rank, cls}, ...], ...]}
        body: {"text": "a photo of lychee", "k": 10}
           or {"image_b64": "<base64 jpeg/png>", "k": 10}
           or {"texts": [...]} / {"images_b64": [...]} for batched queries
  POST /v1/verify        -> {"results": [{gate_score, gate_passed,
                                          verified}, ...]}
        body: {"image_b64": ... | "images_b64": [...],
               "category": "lychee", "threshold": 27.63,
               "prompt": "a photo of {category}"?}
        The cascade's serving form (union_clip_llava2.py's gate->VLM flow
        as an endpoint): CLIP-score each image against the category
        prompt, threshold, and — when the service was built with a
        verifier — run the VLM yes/no on the gate survivors only.
        `verified` is null for images the gate rejected (never sent to
        the VLM) and for all images when no verifier is attached.

Concurrency model: ThreadingHTTPServer + the engine's jitted top-k.
JAX dispatch is thread-safe and the gallery scan is a single fused kernel,
so concurrent requests pipeline on the device queue — the measured
serving numbers (43.5k QPS at Q=64 over 1M rows, COVERAGE.md) come from
exactly this batched-dispatch path. For strict tail-latency SLOs put a
micro-batcher in front; each request here dispatches as its own batch.

Start via `mmrs serve --index DIR --port 8080 [--merges bpe.txt]`.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


class SearchService:
    """Engine + towers behind simple text / image-bytes query methods.

    `verifier` (optional) is any cascade Verifier (cascade/verifier.py) —
    a TPULLaVAVerifier, an HTTP-backed CallableVerifier, or a stub; it
    powers /v1/verify's VLM stage. `verify_batch` is the FIXED compiled
    batch for batched verifiers: survivors go to the VLM in packs of this
    size (padded), so a TPU-hosted 7B compiles exactly one decode shape
    instead of one per distinct survivor count. `logit_scale` is the gate
    score multiplier (the reference's 100·cosine; keep it equal to
    config.search.logit_scale so CLI and HTTP thresholds agree)."""

    def __init__(self, engine, towers, image_size: int = 224, verifier=None,
                 verify_batch: int = 8, logit_scale: float = 100.0):
        self.engine = engine
        self.towers = towers
        self.image_size = image_size
        self.verifier = verifier
        self.verify_batch = verify_batch
        self.logit_scale = logit_scale
        # per-stage serving counters (GET /v1/stats). Updates are a few
        # GIL-atomic float adds; good enough for observability.
        from mmrs_tpu.utils.stats import StageStats

        self.stats = StageStats()
        # ONE in-flight device operation (encode/query/VLM) at a time:
        # on a single chip the device serializes them anyway, and
        # concurrent result fetches from multiple server threads can
        # deadlock remote-runtime transports (observed through this
        # environment's tunneled TPU). HTTP parse/JSON/decode still
        # overlap across threads.
        self._device_lock = threading.Lock()

    def healthz(self) -> dict:
        return {"ok": True, "rows": len(self.engine.index),
                "dim": self.engine.index.dim}

    def search_texts(self, texts: List[str], k: Optional[int]) -> list:
        if self.towers.text_encode is None:
            raise ValueError("server started without a tokenizer; "
                             "text search unavailable")
        with self._device_lock:
            with self.stats.timed("text_encode", count=len(texts)):
                vecs = self.towers.text_encode(texts)
            with self.stats.timed("query", count=len(texts)):
                hits = self.engine.query_text(vecs, top_k=k)
        return self._hits(hits)

    def search_images(self, blobs: List[bytes], k: Optional[int]) -> list:
        from mmrs_tpu.io.images import pil_loader
        from mmrs_tpu.ops.preprocess import resize_center_crop

        with self.stats.timed("decode", count=len(blobs)):
            pixels = np.stack([
                resize_center_crop(pil_loader(b), self.image_size)
                for b in blobs
            ])
        with self._device_lock:
            with self.stats.timed("image_encode", count=len(blobs)):
                vecs = self.towers.image_encode(pixels)
            with self.stats.timed("query", count=len(blobs)):
                hits = self.engine.query_image(vecs, top_k=k)
        return self._hits(hits)

    @staticmethod
    def _hits(per_query) -> list:
        return [[{"path": h.path, "score": h.score, "rank": h.rank,
                  "cls": h.cls} for h in hits] for hits in per_query]

    def verify_images(self, blobs: List[bytes], category: str,
                      threshold: float,
                      prompt: str = "a photo of {category}") -> list:
        """The cascade as a request/response flow: CLIP gate (100·cosine vs
        the category prompt, the reference's logit-scaled score) then the
        VLM yes/no on gate survivors only (union_clip_llava2.py:189-194)."""
        import os
        import tempfile

        from mmrs_tpu.io.images import pil_loader
        from mmrs_tpu.ops.preprocess import resize_center_crop

        if self.towers.text_encode is None:
            raise ValueError("server started without a tokenizer; "
                             "verify unavailable")
        with self.stats.timed("decode", count=len(blobs)):
            pixels = np.stack([
                resize_center_crop(pil_loader(b), self.image_size)
                for b in blobs
            ])
        with self.stats.timed("gate", count=len(blobs)), self._device_lock:
            img = self.towers.image_encode(pixels)                  # [N, D]
            txt = self.towers.text_encode([prompt.format(category=category)])
        scores = self.logit_scale * (img @ np.asarray(txt)[0])
        passed = scores >= threshold
        verified: List[Optional[bool]] = [None] * len(blobs)
        if self.verifier is not None and passed.any():
            survivors = [i for i in range(len(blobs)) if passed[i]]
            # the Verifier protocol takes paths (the cascade's unit of
            # work); uploaded bytes go through short-lived temp files
            tmps = []
            try:
                for i in survivors:
                    f = tempfile.NamedTemporaryFile(suffix=".jpg",
                                                    delete=False)
                    f.write(blobs[i])
                    f.close()
                    tmps.append(f.name)
                with self.stats.timed("verifier", count=len(tmps)), \
                        self._device_lock:
                    if hasattr(self.verifier, "verify_batch"):
                        # FIXED-size packs: one compiled VLM decode shape
                        # for any survivor count (a fresh 7B compile per
                        # distinct batch takes minutes through a remote
                        # compiler)
                        vb = self.verify_batch
                        answers = []
                        for j in range(0, len(tmps), vb):
                            answers.extend(self.verifier.verify_batch(
                                tmps[j:j + vb], category, fixed_batch=vb))
                    else:
                        answers = [self.verifier.verify(p, category)
                                   for p in tmps]
                for i, ok in zip(survivors, answers):
                    verified[i] = bool(ok)
            finally:
                for p in tmps:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
        return [{"gate_score": float(s), "gate_passed": bool(p),
                 "verified": v}
                for s, p, v in zip(scores, passed, verified)]


def _make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging, not stderr
            from mmrs_tpu.utils.logging import get_logger

            get_logger("serve").debug(fmt % args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, service.healthz())
            if self.path == "/v1/stats":
                return self._reply(200, {"stages": service.stats.as_dict()})
            return self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/v1/search", "/v1/verify"):
                return self._reply(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/v1/verify":
                    blobs = [base64.b64decode(s) for s in
                             (req.get("images_b64") or [req["image_b64"]])]
                    results = service.verify_images(
                        blobs, req["category"],
                        float(req.get("threshold", 0.0)),
                        prompt=req.get("prompt", "a photo of {category}"))
                    return self._reply(200, {"results": results})
                k = req.get("k")
                if "text" in req or "texts" in req:
                    texts = req.get("texts") or [req["text"]]
                    hits = service.search_texts(list(texts), k)
                elif "image_b64" in req or "images_b64" in req:
                    blobs = [base64.b64decode(s) for s in
                             (req.get("images_b64") or [req["image_b64"]])]
                    hits = service.search_images(blobs, k)
                else:
                    return self._reply(
                        400, {"error": "need text(s) or image(s)_b64"})
                return self._reply(200, {"hits": hits})
            except Exception as e:  # noqa: BLE001 — surface as 400, keep serving
                return self._reply(400, {"error": repr(e)})

    return Handler


def make_server(service: SearchService, host: str = "127.0.0.1",
                port: int = 8080) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call .serve_forever() to run."""
    return ThreadingHTTPServer((host, port), _make_handler(service))
