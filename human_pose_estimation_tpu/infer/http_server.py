"""Minimal HTTP serving front-end over the BatchingPredictor.

Stdlib-only (http.server + threading): a production deployment would put
its own RPC layer here; this server makes the serving stack usable
out-of-the-box and is the pattern reference for integrating
`BatchingPredictor` behind any front-end. (The reference's only serving
surface is a local webcam loop, ref preview.py:70-123.)

Endpoints:
  POST /predict   body = encoded JPEG/PNG image bytes.
                  Response: .npz archive (generated_verts, generated_cams,
                  generated_joints, theta, kp2d) — compact and lossless;
                  or JSON (cams/joints only) with Accept: application/json.
                  Query params (single-client latency knobs — zlib on the
                  80 KB float mesh dominates response encoding time):
                    ?format=raw   uncompressed .npz (no zlib pass)
                    ?format=json  JSON body (same as the Accept header)
                    ?outputs=generated_joints,generated_cams
                                  restrict response keys per-request
                                  (server-side filter; the predictor may
                                  additionally be built with outputs=...)
  GET  /healthz   liveness + microbatcher stats (requests/batches/padding).

Requests from concurrent clients coalesce into fixed-size device batches
via BatchingPredictor; each connection runs on its own thread
(ThreadingHTTPServer) and blocks only on its own future.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .serving import BatchingPredictor


def make_server(
    batcher: BatchingPredictor,
    host: str = "127.0.0.1",
    port: int = 8000,
    decode_size: Optional[int] = None,
    request_timeout: float = 120.0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; caller runs serve_forever().

    decode_size: optionally scale-and-crop inputs host-side to this
    square size (utils.image.preprocess_for_inference) so arbitrary
    uploads hit the predictor's compiled shape.
    """

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._send(404, b'{"error": "not found"}', "application/json")
            body = json.dumps(
                {"status": "ok", "batch_size": batcher.batch_size, **batcher.stats}
            ).encode()
            self._send(200, body, "application/json")

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path != "/predict":
                return self._send(404, b'{"error": "not found"}', "application/json")
            query = parse_qs(url.query)
            fmt = (query.get("format") or ["npz"])[0]
            keys = (query.get("outputs") or [""])[0]
            try:
                if fmt not in ("npz", "raw", "json"):
                    raise ValueError(f"unknown format {fmt!r} (npz|raw|json)")
                import cv2

                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("could not decode image")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if decode_size:
                    from ..utils.image import preprocess_for_inference

                    img, _, _ = preprocess_for_inference(img, decode_size)
                    img = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
                result = batcher.submit(img).result(timeout=request_timeout)
                if keys:
                    wanted = [k.strip() for k in keys.split(",") if k.strip()]
                    missing = [k for k in wanted if k not in result]
                    if missing:
                        raise ValueError(
                            f"unknown outputs {missing}; have {sorted(result)}"
                        )
                    result = {k: result[k] for k in wanted}
            except Exception as exc:
                return self._send(
                    400,
                    json.dumps({"error": str(exc)}).encode(),
                    "application/json",
                )
            if fmt == "json" or "application/json" in (self.headers.get("Accept") or ""):
                json_keys = (
                    list(result)
                    if keys
                    else [
                        k
                        for k in ("generated_cams", "generated_joints", "theta")
                        if k in result
                    ]
                )
                body = json.dumps(
                    {k: np.asarray(result[k]).tolist() for k in json_keys}
                ).encode()
                return self._send(200, body, "application/json")
            buf = io.BytesIO()
            if fmt == "raw":
                np.savez(buf, **result)
            else:
                np.savez_compressed(buf, **result)
            self._send(200, buf.getvalue(), "application/x-npz")

    return ThreadingHTTPServer((host, port), Handler)


def serve(batcher, host="127.0.0.1", port=8000, decode_size=None,
          request_timeout=120.0) -> None:
    """Blocking serve loop (Ctrl-C to stop)."""
    httpd = make_server(batcher, host, port, decode_size, request_timeout)
    print(f"serving on http://{host}:{httpd.server_address[1]} "
          f"(batch {batcher.batch_size})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batcher.close()
