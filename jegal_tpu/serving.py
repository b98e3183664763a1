"""Minimal production serving endpoint for JegalEngine.

The reference has no serving story (SURVEY.md: no server, no RPC — file
pipeline only); this closes the deployment loop: a stdlib HTTP server in
front of the bucketed, precompiled engine. One device -> requests serialize
through a lock around the jitted forwards; the (combo, bucket) jit cache +
`warmup_all` keep steady-state latency at the graph's 13 ms/clip.

Wire protocol (JSON; arrays as base64-encoded .npy):

  GET  /healthz           -> {"ok": true, "combos": [...], "graphs": N}
  POST /extract           body: {
      "modalities": "vta" | ... | "a",
      "text": str | null,
      "word_boundaries": [[word, start_frame, end_frame], ...] | null,
      "wav": b64(.npy float32 (S,)) | null,
      "visual_feats": b64(.npy float32 (T, 1024)) | null,
      "frames": b64(.npy uint8 (T, 270, 480, 3)) | null,   # alternative to
      "fname": str | null                                  # visual_feats
  }
  -> {"gesture_emb": b64(.npy) | null, "content_emb": b64(.npy) | null,
      "info": {...}}  |  {"error": "..."} (HTTP 400/422/500)

422 mirrors the engine's None result (sample invalid under reference
rules) so clients can distinguish bad samples from server faults.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def encode_array(arr) -> str | None:
    if arr is None:
        return None
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr))
    return base64.b64encode(buf.getvalue()).decode()


def decode_array(b64: str | None):
    if b64 is None:
        return None
    return np.load(io.BytesIO(base64.b64decode(b64)), allow_pickle=False)


def _make_handler(engine, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        server_version = "jegal_tpu"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "ok": True,
                "graphs": len(engine.cached_graphs),
            })

        def do_POST(self):
            if self.path != "/extract":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            try:
                visual_feats = decode_array(req.get("visual_feats"))
                frames = decode_array(req.get("frames"))
                wav = decode_array(req.get("wav"))
            except (ValueError, OSError) as e:
                return self._reply(400, {"error": f"bad array: {e}"})
            modalities = req.get("modalities", "vta")
            try:
                with lock:  # one device: serialize the jitted forwards
                    if visual_feats is None and frames is not None:
                        visual_feats = engine.gestsync_features_from_raw(
                            np.asarray(frames, np.uint8))
                    out = engine.extract(
                        modalities=modalities,
                        visual_feats=visual_feats,
                        text=req.get("text"),
                        word_boundaries=req.get("word_boundaries"),
                        wav=None if wav is None
                        else np.asarray(wav, np.float32),
                        fname=req.get("fname"),
                    )
            except (ValueError, RuntimeError) as e:
                return self._reply(400, {"error": str(e)})
            except Exception as e:  # genuine server fault
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            if out is None:
                return self._reply(422, {
                    "error": "sample rejected (invalid words/tokenization "
                             "under reference rules)"})
            self._reply(200, {
                "gesture_emb": encode_array(out["gesture_emb"]),
                "content_emb": encode_array(out["content_emb"]),
                "info": out["info"],
            })

    return Handler


def create_server(engine, host: str = "0.0.0.0",
                  port: int = 8000) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; `.serve_forever()` runs it.
    Port 0 binds an ephemeral port (tests)."""
    return ThreadingHTTPServer((host, port),
                               _make_handler(engine, threading.Lock()))


def serve(engine, host: str = "0.0.0.0", port: int = 8000,
          warmup_combos=()) -> None:
    for combo in warmup_combos:
        engine.warmup(modalities=combo)
    server = create_server(engine, host, port)
    print(json.dumps({"serving": f"http://{host}:{server.server_address[1]}",
                      "warmed": list(warmup_combos)}))
    server.serve_forever()
