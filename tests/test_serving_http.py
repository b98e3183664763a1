"""HTTP serving endpoint: wire protocol, sample-rejected status, faults."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from jegal_tpu.api import JegalEngine
from jegal_tpu.models import jegal as J
from jegal_tpu.serving import create_server, decode_array, encode_array

from tok_util import make_word_tokenizer


@pytest.fixture(scope="module")
def server_url():
    import torch

    from jegal_tpu.models import roberta as R
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    engine = JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg,
        tokenizer=make_word_tokenizer(),
    )
    server = create_server(engine, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/extract", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["ok"]


def test_extract_ta_roundtrip(server_url):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 500).astype(np.float32)
    status, body = _post(server_url, {
        "modalities": "ta",
        "text": "hello world abc",
        "word_boundaries": [["hello", 2, 7], ["world", 8, 12],
                            ["abc", 13, 18]],
        "wav": encode_array(wav),
        "fname": "clip0",
    })
    assert status == 200
    assert body["gesture_emb"] is None
    content = decode_array(body["content_emb"])
    assert content.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(content, axis=-1), 1.0,
                               rtol=1e-4)
    assert body["info"]["fname"] == "clip0"


def test_extract_visual_feats(server_url):
    rng = np.random.default_rng(1)
    status, body = _post(server_url, {
        "modalities": "v",
        "visual_feats": encode_array(
            rng.standard_normal((17, 1024)).astype(np.float32)),
    })
    assert status == 200
    assert decode_array(body["gesture_emb"]).shape == (17, 512)
    assert body["content_emb"] is None


def test_invalid_sample_is_422(server_url):
    """Mismatched text/audio word counts reject per reference rules."""
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000) * 500).astype(np.float32)
    try:
        _post(server_url, {
            "modalities": "ta",
            "text": "one two",
            "word_boundaries": [["one", 1, 5]],  # 1 boundary vs 2 words
            "wav": encode_array(wav),
        })
        raise AssertionError("expected HTTP 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422
        assert "rejected" in json.loads(e.read())["error"]


def test_bad_request_is_400(server_url):
    try:
        _post(server_url, {"modalities": "v"})  # 'v' without any visual
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_batched_server_matches_unbatched(server_url):
    """Concurrent requests through a batch_window server produce the same
    embeddings as the serialized server (cross-request batching is exactly
    neutral), and per-request errors stay per-request."""
    from concurrent.futures import ThreadPoolExecutor

    import torch

    from jegal_tpu.models import roberta as R
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    engine = JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg, tokenizer=make_word_tokenizer())
    server = create_server(engine, host="127.0.0.1", port=0,
                           batch_window_ms=100, max_batch=4)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    burl = f"http://127.0.0.1:{server.server_address[1]}"

    rng = np.random.default_rng(3)
    payloads = []
    for i in range(4):
        wav = (rng.standard_normal(16000 + 800 * i) * 500).astype(np.float32)
        payloads.append({
            "modalities": "ta",
            "text": "hello world abc",
            "word_boundaries": [["hello", 2, 7], ["world", 8, 12],
                                ["abc", 13, 18]],
            "wav": encode_array(wav), "fname": f"r{i}"})

    with ThreadPoolExecutor(4) as ex:
        batched = list(ex.map(lambda p: _post(burl, p), payloads))
    for i, (status, body) in enumerate(batched):
        assert status == 200
        ref_status, ref_body = _post(server_url, payloads[i])  # unbatched
        assert ref_status == 200
        np.testing.assert_allclose(
            decode_array(body["content_emb"]),
            decode_array(ref_body["content_emb"]), rtol=2e-5, atol=2e-5)
        assert body["info"]["fname"] == f"r{i}"

    # per-request error isolation: a malformed batchmate (ta without
    # word_boundaries) must 400 alone; the concurrent valid request
    # still succeeds
    def post_either(p):
        try:
            return _post(burl, p)
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    bad = dict(payloads[0])
    bad.pop("word_boundaries")
    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(post_either, payloads[0]),
                ex.submit(post_either, bad)]
        (s_ok, b_ok), (s_bad, b_bad) = [f.result() for f in futs]
    assert s_ok == 200 and b_ok["content_emb"] is not None
    assert s_bad == 400 and "word_boundaries" in b_bad["error"]
    server.shutdown()


def test_data_parallel_server_matches_unbatched(server_url):
    """serve --data_parallel: a batch-window server with the 8-device
    'data' mesh produces the same embeddings as the serialized single
    device server (VERDICT r2 item 6: serving drives all devices)."""
    from concurrent.futures import ThreadPoolExecutor

    import torch

    from jegal_tpu.models import roberta as R
    from jegal_tpu.parallel.mesh import make_mesh
    from transformers import XLMRobertaConfig, XLMRobertaModel

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    engine = JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg, tokenizer=make_word_tokenizer())
    server = create_server(engine, host="127.0.0.1", port=0,
                           batch_window_ms=100, max_batch=8,
                           mesh=make_mesh(8, model_parallel=1))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    murl = f"http://127.0.0.1:{server.server_address[1]}"

    rng = np.random.default_rng(5)
    payloads = []
    for i in range(5):  # ragged: the mesh path rounds B up to the axis
        wav = (rng.standard_normal(16000 + 800 * i) * 500).astype(np.float32)
        payloads.append({
            "modalities": "ta",
            "text": "hello world abc",
            "word_boundaries": [["hello", 2, 7], ["world", 8, 12],
                                ["abc", 13, 18]],
            "wav": encode_array(wav), "fname": f"m{i}"})

    with ThreadPoolExecutor(5) as ex:
        meshed = list(ex.map(lambda p: _post(murl, p), payloads))
    for i, (status, body) in enumerate(meshed):
        assert status == 200
        ref_status, ref_body = _post(server_url, payloads[i])
        assert ref_status == 200
        np.testing.assert_allclose(
            decode_array(body["content_emb"]),
            decode_array(ref_body["content_emb"]), rtol=2e-5, atol=2e-5)
        assert body["info"]["fname"] == f"m{i}"
    server.shutdown()


def test_unknown_path_404(server_url):
    try:
        urllib.request.urlopen(server_url + "/nope")
        raise AssertionError("expected HTTP 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_oversized_body_is_413(server_url):
    payload = {"modalities": "t", "text": "x"}
    req = urllib.request.Request(
        server_url + "/extract", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json",
                 "Content-Length": str(10**12)})
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 413")
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert "limit" in json.loads(e.read())["error"]


def test_batcher_worker_death_does_not_hang():
    """ADVICE r2 / VERDICT r2 item 6: if the batcher worker dies (here: a
    BaseException from the engine), waiting clients get an error instead of
    blocking forever, /healthz reports it, and later submits fail fast."""
    import threading as _t

    from jegal_tpu.serving import _Batcher

    class Boom(BaseException):
        pass

    class DyingEngine:
        cached_graphs = []

        def extract_many(self, *a, **kw):
            raise Boom("chip on fire")

        def extract(self, *a, **kw):
            raise Boom("chip on fire")

    b = _Batcher(DyingEngine(), window_ms=5, max_batch=4, lock=_t.Lock())
    with pytest.raises(RuntimeError, match="died"):
        b.submit("ta", {"text": "x"})
    assert b.dead is not None
    with pytest.raises(RuntimeError, match="died"):
        b.submit("ta", {"text": "y"})  # fail-fast, no enqueue-and-hang


def test_healthz_503_when_batcher_dead():
    """A dead batcher must surface at the HTTP status level: LB/k8s probes
    key on the code, not the JSON body."""
    import threading as _t

    from jegal_tpu.serving import _Batcher, create_server

    class FakeEngine:
        cached_graphs = []

    b = _Batcher(FakeEngine(), window_ms=5, max_batch=2, lock=_t.Lock())
    b.dead = RuntimeError("chip on fire")
    srv = create_server(FakeEngine(), host="127.0.0.1", port=0)
    # rebuild the handler with the dead batcher wired in
    from jegal_tpu.serving import _make_handler

    srv.RequestHandlerClass = _make_handler(
        FakeEngine(), _t.Lock(), b, max_body_bytes=1 << 20)
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/healthz"
        try:
            urllib.request.urlopen(url)
            raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            body = json.loads(e.read())
            assert body["ok"] is False and "died" in body["error"]
    finally:
        srv.shutdown()


def test_batcher_dispatches_without_ladder():
    """The batcher must pad every live dispatch to max_batch (the ONE
    graph serve() warms) — a pow-2 ladder dispatch would compile a fresh
    graph inside a request."""
    import threading as _t

    from jegal_tpu.serving import _Batcher

    calls = []

    class SpyEngine:
        cached_graphs = []

        def extract_many(self, samples, **kw):
            calls.append(kw)
            return [{"ok": True} for _ in samples]

    b = _Batcher(SpyEngine(), window_ms=5, max_batch=4, lock=_t.Lock())
    out = b.submit("t", {"text": "ab hello"})
    assert out == {"ok": True}
    assert calls and calls[0]["ladder"] is False
    assert calls[0]["batch_size"] == 4


def test_client_shaped_input_errors_are_400(server_url):
    """Malformed client-supplied data — wrong-rank visual_feats, junk word
    boundaries, empty text, sub-frame wav — is validated in the engine's
    _prepare_sample and maps to 400 (ClientError), NOT to a 500 server
    fault (monitoring must not count client garbage as server errors)."""
    cases = [
        {"modalities": "v",
         "visual_feats": encode_array(np.zeros((4, 4, 4, 4), np.float32))},
        {"modalities": "v",
         "visual_feats": encode_array(np.zeros((4, 7), np.float32))},
        {"modalities": "t", "text": "   "},
        {"modalities": "a",
         "wav": encode_array(np.zeros((8,), np.float32)),
         "word_boundaries": [["w", 0, 1]]},
        {"modalities": "a",
         "wav": encode_array(np.zeros((16000,), np.float32)),
         "word_boundaries": [["w", 9, 2]]},  # start > end
        {"modalities": "a",
         "wav": encode_array(np.zeros((16000,), np.float32)),
         "word_boundaries": []},
    ]
    for payload in cases:
        try:
            _post(server_url, payload)
            raise AssertionError(f"expected HTTP 400 for {payload}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (e.code, payload)


def test_batch_ladder():
    from jegal_tpu.api import _batch_ladder

    assert [_batch_ladder(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8]
    assert _batch_ladder(7, 4) == 4


def _post_binary(url, meta, arrays, accept_binary=True):
    from jegal_tpu.serving import (BINARY_CONTENT_TYPE, decode_binary,
                                   encode_binary)

    headers = {"Content-Type": BINARY_CONTENT_TYPE}
    if accept_binary:
        headers["Accept"] = BINARY_CONTENT_TYPE
    req = urllib.request.Request(url + "/extract",
                                 data=encode_binary(meta, arrays),
                                 headers=headers)
    with urllib.request.urlopen(req) as resp:
        body = resp.read()
        if resp.headers.get("Content-Type") == BINARY_CONTENT_TYPE:
            return resp.status, decode_binary(body)
        return resp.status, json.loads(body)


def test_binary_protocol_roundtrip(server_url):
    """octet-stream request framing (+ binary response via Accept) must
    produce the same embeddings as the base64-JSON protocol, with the body
    at ~raw array size (no base64 inflation)."""
    from jegal_tpu.serving import encode_binary

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal(16000) * 500).astype(np.float32)
    meta = {"modalities": "ta", "text": "hello world abc",
            "word_boundaries": [["hello", 2, 7], ["world", 8, 12],
                                ["abc", 13, 18]], "fname": "bin0"}
    status, (rmeta, arrays) = _post_binary(server_url, meta, {"wav": wav})
    assert status == 200
    assert rmeta["info"]["fname"] == "bin0"
    assert "gesture_emb" not in arrays  # ta: no gesture branch
    content = arrays["content_emb"]
    assert content.shape == (3, 512)

    sj, body = _post(server_url, {**meta, "wav": encode_array(wav)})
    assert sj == 200
    np.testing.assert_array_equal(content, decode_array(body["content_emb"]))

    # JSON response for a binary request without the Accept header
    status, body = _post_binary(server_url, meta, {"wav": wav},
                                accept_binary=False)
    assert status == 200 and isinstance(body["content_emb"], str)

    # wire-size sanity: binary body ~= raw bytes, not 1.33x base64
    raw = wav.nbytes
    assert len(encode_binary(meta, {"wav": wav})) < raw + 4096


def test_binary_bad_framing_is_400(server_url):
    from jegal_tpu.serving import BINARY_CONTENT_TYPE

    for payload in (b"nope", b"JGL1" + (10**6).to_bytes(4, "big") + b"x",
                    b"JGL1" + (2).to_bytes(4, "big") + b"[]"):
        req = urllib.request.Request(
            server_url + "/extract", data=payload,
            headers={"Content-Type": BINARY_CONTENT_TYPE})
        try:
            urllib.request.urlopen(req)
            raise AssertionError(f"expected HTTP 400 for {payload[:8]!r}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, payload


def test_frames_request_runs_fused_path():
    """A frames-carrying request must answer through the fused
    tower+forward graph (engine.extract(frames=...)) and match the
    engine's direct output."""
    from jegal_tpu.models import gestsync as G

    engine = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(3)),
                         gestsync_params=G.init_params(jax.random.PRNGKey(1)))
    server = create_server(engine, host="127.0.0.1", port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(9)
        frames = rng.integers(0, 255, (5, 270, 480, 3)).astype(np.uint8)
        status, (meta, arrays) = _post_binary(
            url, {"modalities": "v", "fname": "f0"}, {"frames": frames})
        assert status == 200
        want = engine.extract(modalities="v", frames=frames, fname="f0")
        np.testing.assert_allclose(arrays["gesture_emb"],
                                   want["gesture_emb"], rtol=2e-5, atol=2e-5)
        # the serving path must have used the fused graph, not a two-stage
        # tower fetch (raw or planar depending on the native repack lib)
        assert any(isinstance(k, tuple) and k and k[0] == "fused"
                   for k in engine._combo_cache)
    finally:
        server.shutdown()


def test_poison_batch_does_not_stall_healthy_clients():
    """One batchmate that makes the whole batched dispatch raise must not
    fail (or meaningfully delay) its healthy batchmates: the batcher
    re-runs each sample alone, attributes the error to the poison request
    only, and healthy requests still answer 200."""
    import threading as _t
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from jegal_tpu.serving import _Batcher

    class PoisonEngine:
        cached_graphs = []

        def _ok(self, s):
            return {"gesture_emb": None, "content_emb": None,
                    "info": {"fname": s.get("fname")}}

        def extract_many(self, samples, **kw):
            if any(s.get("fname") == "poison" for s in samples):
                raise RuntimeError("batch blew up")
            return [self._ok(s) for s in samples]

        def extract(self, modalities=None, **s):
            if s.get("fname") == "poison":
                raise RuntimeError("still broken")
            return self._ok(s)

    b = _Batcher(PoisonEngine(), window_ms=50, max_batch=8, lock=_t.Lock())

    def go(name):
        t0 = _time.monotonic()
        try:
            out = b.submit("t", {"fname": name, "text": "x"})
            return name, out, _time.monotonic() - t0
        except RuntimeError as e:
            return name, e, _time.monotonic() - t0

    names = ["h0", "h1", "poison", "h2", "h3"]
    with ThreadPoolExecutor(5) as ex:
        results = {n: (r, dt) for n, r, dt in ex.map(go, names)}
    for n in ("h0", "h1", "h2", "h3"):
        r, dt = results[n]
        assert isinstance(r, dict) and r["info"]["fname"] == n
        assert dt < 30, (n, dt)
    r, _ = results["poison"]
    assert isinstance(r, RuntimeError)
    assert b.dead is None  # worker survived the poison batch


def test_mixed_combo_load_p50_p99():
    """Concurrent mixed-combo load through the batcher: every request
    answers, and the p50/p99 quantile harness used for the DEPLOYMENT.md
    table runs end-to-end (absolute numbers are only meaningful on the
    chip — benchmarks/serving_load.py records those)."""
    from benchmarks.serving_load import run_load

    import torch

    from jegal_tpu.models import roberta as R
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    engine = JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg, tokenizer=make_word_tokenizer())
    stats = run_load(engine, n_requests=12, concurrency=6,
                     combos=("ta", "t", "a"), batch_window_ms=20,
                     max_batch=4, binary=True)
    assert stats["ok"] == 12 and stats["errors"] == 0
    assert stats["p99_ms"] >= stats["p50_ms"] > 0

    # poison mode: every poison (reference-invalid word mismatch for t/ta
    # batchmates, malformed boundaries for a) answers 4xx; zero healthy
    # errors. poison_every=7 is coprime with the 3-combo cycle, so
    # poisons cover every combo.
    stats = run_load(engine, n_requests=14, concurrency=6,
                     combos=("ta", "t", "a"), batch_window_ms=20,
                     max_batch=4, binary=True, poison_every=7, warm=False)
    assert stats["errors"] == 0, stats
    assert stats["poison"]["n"] == 2 and stats["poison"]["all_4xx"], stats
