"""Minimal production serving endpoint for JegalEngine.

The reference has no serving story (SURVEY.md: no server, no RPC — file
pipeline only); this closes the deployment loop: a stdlib HTTP server in
front of the bucketed, precompiled engine. One device -> requests serialize
through a lock around the jitted forwards; the (combo, bucket) jit cache +
`warmup_all` keep steady-state latency at the graph's 13 ms/clip.

Wire protocol (JSON; arrays as base64-encoded .npy):

  GET  /healthz           -> {"ok": true, "graphs": N}   # N compiled graphs
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

Large payloads (raw frames) should use the BINARY protocol instead:
POST /extract with `Content-Type: application/octet-stream` and an
encode_binary()-framed body (JSON header + uncompressed npz — no base64
inflation, no monolithic json.loads); add `Accept:
application/octet-stream` for a binary response. See encode_binary/
decode_binary below and docs/DEPLOYMENT.md.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import subprocess
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from jegal_tpu.api import ClientError


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


# ---------------------------------------------------------------------------
# Binary wire protocol (Content-Type: application/octet-stream)
#
# Raw-frames requests as base64-in-JSON are ~1.33x the array bytes AND must
# be json.loads'ed in one gulp (65 MB per 125-frame request); the binary
# framing below ships arrays as an UNCOMPRESSED npz (a straight memcpy on
# both ends) with a small JSON header for the scalar fields:
#
#   b"JGL1" | uint32_be header_len | header JSON | npz(arrays)
#
# header: {"modalities", "text", "word_boundaries", "fname"}; npz arrays
# among {"visual_feats", "frames", "wav"}. Responses use the same framing
# (header {"info": ...}; arrays among {"gesture_emb", "content_emb"}) when
# the client sends `Accept: application/octet-stream`.
# ---------------------------------------------------------------------------

BINARY_MAGIC = b"JGL1"
BINARY_CONTENT_TYPE = "application/octet-stream"


def encode_binary(meta: dict, arrays: dict) -> bytes:
    """Frame a request/response: JSON-able meta + numpy arrays."""
    hdr = json.dumps(meta).encode()
    buf = io.BytesIO()
    present = {k: np.asarray(v) for k, v in arrays.items() if v is not None}
    if present:
        np.savez(buf, **present)  # ZIP_STORED: no compression pass
    return BINARY_MAGIC + len(hdr).to_bytes(4, "big") + hdr + buf.getvalue()


def decode_binary(body: bytes) -> tuple[dict, dict]:
    """-> (meta dict, arrays dict). Raises ValueError on malformed framing
    (the handler maps it to HTTP 400)."""
    if body[:4] != BINARY_MAGIC:
        raise ValueError(f"bad magic {body[:4]!r} (expected "
                         f"{BINARY_MAGIC.decode()} framing)")
    if len(body) < 8:
        raise ValueError("truncated header length")
    n = int.from_bytes(body[4:8], "big")
    if 8 + n > len(body):
        raise ValueError(f"header length {n} exceeds body")
    meta = json.loads(body[8 : 8 + n])
    if not isinstance(meta, dict):
        raise ValueError("header must be a JSON object")
    rest = body[8 + n :]
    arrays: dict = {}
    if rest:
        with np.load(io.BytesIO(rest), allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
    return meta, arrays


class _Batcher:
    """Cross-request batching: concurrent /extract requests within a small
    window run as ONE engine.extract_many dispatch (same-bucket samples
    share a graph launch — the serving counterpart of the driver's
    cross-video batching). Per-sample semantics are identical to
    engine.extract (batch padding is exactly neutral, tested)."""

    # generous: first-hit compiles on the axon runtime take 1-4 min; warmed
    # graphs answer in ~100 ms
    SUBMIT_TIMEOUT_S = 600.0

    def __init__(self, engine, window_ms: float, max_batch: int,
                 lock: threading.Lock, mesh=None):
        self.engine = engine
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.lock = lock        # shared with the raw-frames tower path
        self.mesh = mesh        # optional: data-parallel extract_many
        self.q: queue.Queue = queue.Queue()
        self.dead: BaseException | None = None
        self._inflight: list = []   # items dequeued but not yet answered
        threading.Thread(target=self._run, daemon=True).start()

    def submit(self, modalities: str, sample: dict):
        """Blocking; -> result dict | None (rejected) | raises the
        batch's engine error. Raises RuntimeError if the worker thread
        died or the request timed out (a 500, never a silent hang)."""
        if self.dead is not None:
            raise RuntimeError(f"batcher worker died: {self.dead!r}")
        ev = threading.Event()
        slot: dict = {}
        self.q.put((modalities, sample, ev, slot))
        # re-check AFTER the put: if the worker died between the check
        # above and the enqueue, its one-shot drain may already have run
        # and nothing will ever consume this item — fail it here instead
        # of stalling the client for the full timeout
        if self.dead is not None and not ev.is_set():
            slot.setdefault("error",
                            RuntimeError(f"batcher worker died: "
                                         f"{self.dead!r}"))
            ev.set()
        if not ev.wait(self.SUBMIT_TIMEOUT_S):
            raise RuntimeError(
                f"batcher timeout after {self.SUBMIT_TIMEOUT_S:.0f}s "
                f"(worker {'dead: ' + repr(self.dead) if self.dead else 'busy'})")
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _run(self):
        # the whole loop body is guarded: anything that escapes the
        # per-batch handling below (including non-Exception BaseExceptions)
        # marks the batcher dead and errors out every waiting request
        # instead of leaving clients blocked forever
        try:
            self._run_loop()
        except BaseException as e:  # noqa: BLE001 — deliberate backstop
            self.dead = e
            err = RuntimeError(f"batcher worker died: {e!r}")
            # in-flight items were already dequeued — error them first,
            # then drain whatever is still queued
            for _, _, ev, slot in self._inflight:
                if not ev.is_set():
                    slot["error"] = err
                    ev.set()
            while True:
                try:
                    _, _, ev, slot = self.q.get_nowait()
                except queue.Empty:
                    break
                slot["error"] = err
                ev.set()

    def _run_loop(self):
        while True:
            items = [self.q.get()]
            self._inflight = items
            deadline = time.monotonic() + self.window
            while len(items) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    items.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            by_mod: dict = {}
            for it in items:
                by_mod.setdefault(it[0], []).append(it)
            for mod, group in by_mod.items():
                try:
                    with self.lock:  # one device: shared with /frames path
                        results = self.engine.extract_many(
                            [g[1] for g in group], modalities=mod,
                            batch_size=self.max_batch, mesh=self.mesh,
                            # every live dispatch pads to max_batch: the
                            # ONE graph serve() warmed. The pow-2 ladder
                            # would compile a fresh (combo, sig, b) graph
                            # inside a request (1-4 min first hit)
                            ladder=False)
                except Exception:
                    # per-request isolation: one malformed batchmate must
                    # not fail the others — retry each sample alone and
                    # attribute errors individually
                    for _, sample, ev, slot in group:
                        try:
                            with self.lock:
                                slot["result"] = self.engine.extract(
                                    modalities=mod, **sample)
                        except Exception as e:
                            slot["error"] = e
                        ev.set()
                    continue
                for (_, sample, ev, slot), res in zip(group, results):
                    if res is None:
                        # extract_many maps malformed batchmates to None
                        # (batch-corpus contract); re-run the host-side
                        # validation alone to classify: engine ClientError
                        # -> 400, genuinely-invalid-under-reference-
                        # semantics -> 422 (None result). Rare path, no
                        # device work. Frames-carrying samples validate
                        # the frames shape, then the content modalities —
                        # 'v' is satisfied by the frames themselves.
                        try:
                            check_mod, vf = mod, sample.get("visual_feats")
                            if sample.get("frames") is not None:
                                self.engine._frames_kind(
                                    np.asarray(sample["frames"]))
                                check_mod, vf = mod.replace("v", ""), None
                            if check_mod:
                                self.engine._prepare_sample(
                                    check_mod, vf,
                                    sample.get("text"),
                                    sample.get("word_boundaries"),
                                    sample.get("wav"))
                        except ClientError as e:
                            slot["error"] = e
                    slot["result"] = res
                    ev.set()
            # all groups answered: drop the references so a burst's large
            # sample arrays don't stay pinned while the worker idles in
            # q.get() (placed after the group loop — clearing earlier would
            # hide still-unanswered groups from the death backstop)
            self._inflight = []


def _make_handler(engine, lock: threading.Lock, batcher: _Batcher | None,
                  max_body_bytes: int):
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

        def _reply_binary(self, out: dict):
            body = encode_binary({"info": out["info"]},
                                 {"gesture_emb": out["gesture_emb"],
                                  "content_emb": out["content_emb"]})
            self.send_response(200)
            self.send_header("Content-Type", BINARY_CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            ok = batcher is None or batcher.dead is None
            payload = {
                "ok": ok,
                "graphs": len(engine.cached_graphs),
            }
            if batcher is not None:
                payload["queue_depth"] = batcher.q.qsize()
            if not ok:
                # surface deadness at the HTTP level: load balancers and
                # k8s probes key on the status code, not the body
                payload["error"] = f"batcher worker died: {batcher.dead!r}"
                return self._reply(503, payload)
            self._reply(200, payload)

        def do_POST(self):
            if self.path != "/extract":
                return self._reply(404, {"error": "unknown path"})
            binary = ((self.headers.get("Content-Type") or "")
                      .split(";")[0].strip() == BINARY_CONTENT_TYPE)
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    return self._reply(413, {
                        "error": f"request body {n} bytes exceeds the "
                                 f"{max_body_bytes}-byte limit"})
                body = self.rfile.read(n)
                if binary:
                    req, bin_arrays = decode_binary(body)
                else:
                    req = json.loads(body)
            except (ValueError, json.JSONDecodeError, KeyError) as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            if not isinstance(req, dict):
                return self._reply(400, {"error": "body must be a JSON "
                                                  "object"})
            try:
                if binary:
                    visual_feats = bin_arrays.get("visual_feats")
                    frames = bin_arrays.get("frames")
                    wav = bin_arrays.get("wav")
                else:
                    visual_feats = decode_array(req.get("visual_feats"))
                    frames = decode_array(req.get("frames"))
                    wav = decode_array(req.get("wav"))
            except (ValueError, OSError, TypeError) as e:
                return self._reply(400, {"error": f"bad array: {e}"})
            modalities = req.get("modalities", "vta")
            try:
                if visual_feats is None and frames is not None:
                    # repack+mask into the stem layout in C++ on THIS
                    # request thread (outside the device lock; the
                    # fallback cut matches from_raw(chin=None) semantics —
                    # bit-identical, tested); the device work then runs as
                    # ONE fused dispatch (tower + JEGAL forward) inside
                    # engine.extract / the batcher's extract_many —
                    # features never leave the device between stages
                    # (VERDICT r3 item 1)
                    frames = np.asarray(frames, np.uint8)
                    # validate BEFORE the native repack: malformed client
                    # shapes must surface as 400 (ClientError), not as a
                    # repack AssertionError mapped to a 500 server fault
                    if frames.ndim != 4 or (
                            frames.shape[1:] not in ((270, 480, 3),
                                                     (90, 27, 160))):
                        raise ClientError(
                            "frames must be (T, 270, 480, 3) uint8 "
                            "decoder-resized RGB or (T, 90, 27, 160) "
                            f"host-repacked planar, got {frames.shape}")
                    if frames.shape[1:] == (270, 480, 3):
                        try:
                            from jegal_tpu.host import media
                            from jegal_tpu.ops.video import FALLBACK_ROWS

                            frames = media.s2d_repack(
                                frames, np.full((frames.shape[0],),
                                                FALLBACK_ROWS, np.int32))
                        except (OSError, subprocess.CalledProcessError):
                            pass  # no native lib: raw-frames fused graph
                sample = dict(
                    visual_feats=visual_feats,
                    text=req.get("text"),
                    word_boundaries=req.get("word_boundaries"),
                    wav=None if wav is None
                    else np.asarray(wav, np.float32),
                    fname=req.get("fname"),
                )
                if visual_feats is None and frames is not None:
                    sample["frames"] = frames
                if batcher is not None:
                    out = batcher.submit(modalities, sample)
                else:
                    with lock:  # one device: serialize the forwards
                        out = engine.extract(modalities=modalities, **sample)
            except ClientError as e:  # engine-validated client data problem
                return self._reply(400, {"error": str(e)})
            except Exception as e:
                # server fault — including RuntimeError subclasses like
                # jaxlib's XlaRuntimeError (device OOM / compile failure),
                # engine misconfiguration, AND internal ValueErrors (shape
                # bugs are not the client's fault — only the engine's
                # explicit ClientError maps to 400)
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            if out is None:
                return self._reply(422, {
                    "error": "sample rejected (invalid words/tokenization "
                             "under reference rules)"})
            if BINARY_CONTENT_TYPE in (self.headers.get("Accept") or ""):
                return self._reply_binary(out)
            self._reply(200, {
                "gesture_emb": encode_array(out["gesture_emb"]),
                "content_emb": encode_array(out["content_emb"]),
                "info": out["info"],
            })

    return Handler


DEFAULT_MAX_BODY = 512 * 1024 * 1024  # raw-frames payloads are large
                                      # (125 frames uint8 ~ 65 MB as b64)


def create_server(engine, host: str = "127.0.0.1", port: int = 8000,
                  batch_window_ms: float = 0.0,
                  max_batch: int = 8, mesh=None,
                  max_body_bytes: int = DEFAULT_MAX_BODY
                  ) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; `.serve_forever()` runs it.
    Port 0 binds an ephemeral port (tests). batch_window_ms > 0 batches
    concurrent requests into one device dispatch (_Batcher). mesh: a
    jax.sharding.Mesh with a 'data' axis — batched extracts shard over it
    (data-parallel serving).

    The endpoint has NO authentication and binds loopback by default;
    exposing it beyond localhost requires a fronting proxy / auth layer
    (pass host='0.0.0.0' explicitly, see docs/DEPLOYMENT.md). Bodies over
    max_body_bytes are rejected with 413 before being read."""
    lock = threading.Lock()
    batcher = (_Batcher(engine, batch_window_ms, max_batch, lock, mesh=mesh)
               if batch_window_ms > 0 else None)
    return ThreadingHTTPServer(
        (host, port), _make_handler(engine, lock, batcher, max_body_bytes))


def serve(engine, host: str = "127.0.0.1", port: int = 8000,
          warmup_combos=(), batch_window_ms: float = 0.0,
          max_batch: int = 16, mesh=None,
          max_body_bytes: int = DEFAULT_MAX_BODY,
          warmup_frames: str | None = None) -> None:
    if mesh is not None and batch_window_ms <= 0:
        # without a batching window every request runs engine.extract on
        # unsharded batch-1 arrays: the mesh would only steer warmup into
        # compiling sharded executables no live request ever runs —
        # a silent no-op for --data_parallel. Fail loudly instead.
        raise ValueError("data-parallel serving (mesh=...) requires "
                         "batch_window_ms > 0 — requests run data-parallel "
                         "only through the cross-request batcher")
    # warm the graphs the traffic will actually hit: the batcher dispatches
    # fixed max_batch batches via extract_many (with 'data'-sharded inputs
    # when a mesh is configured — jit executables are keyed by sharding,
    # so warming replicated graphs would leave the sharded compile for the
    # first live request), not batch-1 forwards
    warm_batch = max_batch if batch_window_ms > 0 else 1
    for combo in warmup_combos:
        engine.warmup(modalities=combo, batch=warm_batch, mesh=mesh)
        if warmup_frames and "v" in combo:
            # frames traffic runs the FUSED tower+forward graph — a
            # different executable from the two-stage forward; warm it for
            # the kind the deployment expects ('planar' when clients or a
            # fronting decoder repack in C++, 'raw' for RGB uint8)
            engine.warmup(modalities=combo, batch=warm_batch, mesh=mesh,
                          frames_kind=warmup_frames)
    server = create_server(engine, host, port,
                           batch_window_ms=batch_window_ms,
                           max_batch=max_batch, mesh=mesh,
                           max_body_bytes=max_body_bytes)
    print(json.dumps({"serving": f"http://{host}:{server.server_address[1]}",
                      "warmed": list(warmup_combos),
                      "batch_window_ms": batch_window_ms}))
    server.serve_forever()
