"""Serving load harness: concurrent mixed-combo requests through the
cross-request batcher, recording p50/p99 wall latency per combo and ingest
wire stats (VERDICT r3 item 5). The binary octet-stream protocol is the
default — raw-frames requests skip the 65 MB base64+json.loads path.

Used two ways:
  * tests/test_serving_http.py::test_mixed_combo_load_p50_p99 runs it small
    on CPU (harness correctness);
  * `python benchmarks/serving_load.py` runs it on the chip and prints the
    JSON rows recorded in docs/DEPLOYMENT.md.
"""

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _payloads(rng, combos, n, t_frames=0, poison_every=0):
    """One (combo, meta, arrays) request per i, cycling combos.

    poison_every > 0: every Nth request is INVALID — for combos with
    text, invalid under REFERENCE semantics (word_boundaries whose word
    count mismatches the text: these pass wire validation, land in the
    same cross-request batches as healthy batchmates, and the engine maps
    them to a None result -> 422); for audio-only combos, malformed
    boundaries (start > end -> engine ClientError -> 400 at validation).
    Either way the server must answer poison 4xx while batchmates still
    get 200 (poison-batch isolation). Pick poison_every coprime with
    len(combos) so poisons cycle every combo."""
    out = []
    for i in range(n):
        combo = combos[i % len(combos)]
        meta = {"modalities": combo, "fname": f"r{i}"}
        arrays = {}
        if "t" in combo:
            meta["text"] = "hello world abc"
        if "t" in combo or "a" in combo:
            meta["word_boundaries"] = [["hello", 2, 7], ["world", 8, 12],
                                       ["abc", 13, 18]]
        if "a" in combo:
            arrays["wav"] = (rng.standard_normal(16000) * 500
                             ).astype(np.float32)
        if "v" in combo:
            arrays["frames"] = rng.integers(
                0, 255, (t_frames, 270, 480, 3)).astype(np.uint8)
        poison = bool(poison_every and i % poison_every == poison_every - 1)
        if poison:
            meta["fname"] = f"poison{i}"
            if "t" in combo and "a" in combo:
                # one boundary word vs three text words: the reference
                # fails loudly on the word-count mismatch (models/
                # jegal.py:407-408); the engine rejects the sample -> 422
                # AFTER it already sits in a batch with healthy requests
                meta["word_boundaries"] = [["zzz", 2, 7]]
            elif "t" in combo:
                meta["text"] = " "        # empty text -> ClientError 400
            else:
                meta["word_boundaries"] = [["x", 50, 10]]  # start > end
        out.append((combo, meta, arrays, poison))
    return out


def run_load(engine, n_requests: int = 32, concurrency: int = 8,
             combos=("ta", "t", "a"), batch_window_ms: float = 20.0,
             max_batch: int = 16, binary: bool = True, mesh=None,
             t_frames: int = 125, warm: bool = True,
             poison_every: int = 0) -> dict:
    """Spin a batched server on an ephemeral port, fire `n_requests`
    mixed-combo requests at `concurrency`, return latency quantiles."""
    from concurrent.futures import ThreadPoolExecutor

    from jegal_tpu.serving import (BINARY_CONTENT_TYPE, create_server,
                                   encode_array, encode_binary)

    rng = np.random.default_rng(0)
    reqs = _payloads(rng, combos, n_requests, t_frames=t_frames,
                     poison_every=poison_every)
    if warm:
        # warm EXACTLY the graphs the traffic will hit: one representative
        # sample per combo through the batcher's own call shape
        # (extract_many, ladder=False, padded to max_batch) — including the
        # handler's raw->planar C++ repack when the native lib is present
        seen = set()
        for combo, meta, arrays, poison in reqs:
            if poison:
                continue
            if combo in seen:
                continue
            seen.add(combo)
            sample = {k: v for k, v in meta.items() if k != "modalities"}
            sample.update(arrays)
            if "frames" in sample:
                try:
                    from jegal_tpu.host import media
                    from jegal_tpu.ops.video import FALLBACK_ROWS

                    f = sample["frames"]
                    sample["frames"] = media.s2d_repack(
                        f, np.full((f.shape[0],), FALLBACK_ROWS, np.int32))
                except Exception:
                    pass  # no native lib: the handler serves raw too
            engine.extract_many([sample], modalities=combo,
                                batch_size=max_batch, mesh=mesh,
                                ladder=False)
    server = create_server(engine, host="127.0.0.1", port=0,
                           batch_window_ms=batch_window_ms,
                           max_batch=max_batch, mesh=mesh)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}/extract"

    def fire(item):
        combo, meta, arrays, poison = item
        if binary:
            data = encode_binary(meta, arrays)
            headers = {"Content-Type": BINARY_CONTENT_TYPE}
        else:
            data = json.dumps(
                {**meta, **{k: encode_array(v) for k, v in arrays.items()}}
            ).encode()
            headers = {"Content-Type": "application/json"}
        t0 = time.monotonic()
        status = None
        try:
            with urllib.request.urlopen(urllib.request.Request(
                    url, data=data, headers=headers)) as resp:
                resp.read()
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        except Exception:
            pass
        ok = status == 200
        return combo, ok, (time.monotonic() - t0) * 1e3, len(data), \
            poison, status

    try:
        with ThreadPoolExecutor(concurrency) as ex:
            rows = list(ex.map(fire, reqs))
    finally:
        server.shutdown()

    healthy = [r for r in rows if not r[4]]
    lat = sorted(r[2] for r in healthy if r[1])
    by_combo = {}
    for combo, ok, ms, _, poison, _ in healthy:
        by_combo.setdefault(combo, []).append(ms if ok else None)
    stats = {
        "n": n_requests, "concurrency": concurrency,
        "binary": binary, "max_batch": max_batch,
        "batch_window_ms": batch_window_ms,
        "ok": sum(r[1] for r in healthy),
        "errors": sum(not r[1] for r in healthy),
        "p50_ms": round(float(np.percentile(lat, 50)), 2) if lat else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 2) if lat else None,
        "wire_bytes_max": max(r[3] for r in rows),
        "per_combo_p50_ms": {
            c: round(float(np.percentile([m for m in v if m is not None],
                                         50)), 2)
            for c, v in by_combo.items() if any(m is not None for m in v)},
    }
    if poison_every:
        # isolation contract: every poison answered 4xx (not 5xx, not a
        # hang), zero healthy errors; healthy p50/p99 above measure the
        # latency impact of sharing batches with poison requests
        poisons = [r for r in rows if r[4]]
        stats["poison"] = {
            "n": len(poisons),
            "all_4xx": all(r[5] is not None and 400 <= r[5] < 500
                           for r in poisons),
            "statuses": sorted({r[5] for r in poisons}),
        }
    return stats


def main():
    """Chip run: full-width engine, ta/t/a + a raw-frames vta sweep, binary
    vs JSON ingest comparison. Prints one JSON line per configuration."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as E
    from jegal_tpu.api import JegalEngine
    from jegal_tpu.cli.main import setup_compilation_cache
    from jegal_tpu.models import gestsync as G

    setup_compilation_cache()
    jparams, rparams, cfg = E._models(jax.random.PRNGKey(0),
                                      roberta_layers=12, vocab=250002)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from tok_util import make_word_tokenizer

    engine = JegalEngine(
        jegal_params=jparams, roberta_params=rparams, roberta_cfg=cfg,
        gestsync_params=G.init_params(jax.random.PRNGKey(1)),
        tokenizer=make_word_tokenizer(), dtype=jnp.bfloat16)
    for binary in (True, False):
        stats = run_load(engine, n_requests=48, concurrency=8,
                         combos=("ta", "t", "a"), binary=binary)
        print(json.dumps({"load": "content-combos", **stats}), flush=True)
    stats = run_load(engine, n_requests=48, concurrency=8,
                     combos=("ta", "t", "a"), binary=True, poison_every=7)
    print(json.dumps({"load": "content-combos+poison", **stats}),
          flush=True)
    stats = run_load(engine, n_requests=8, concurrency=4, combos=("vta",),
                     max_batch=4, binary=True, t_frames=125)
    print(json.dumps({"load": "raw-frames vta", **stats}), flush=True)


if __name__ == "__main__":
    main()
