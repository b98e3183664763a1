"""Serving hardening: the compiled-graph ledger/eviction bound and the
warmup-all precompile surface (VERDICT r1 item 10)."""

import jax
import numpy as np
import pytest

from jegal_tpu.api import JegalEngine
from jegal_tpu.models import jegal as J


@pytest.fixture(scope="module")
def engine():
    return JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(5)),
                       max_cached_graphs=3)


def test_graph_ledger_tracks_and_evicts():
    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(6)),
                      max_cached_graphs=3)
    # 3 distinct v-graphs (different T buckets) — within budget
    for t in (16, 32, 64):
        eng.warmup(modalities="v", t=t)
    assert len(eng.cached_graphs) == 3
    assert all(k[0] == (True, False, False) for k in eng.cached_graphs)

    # a 4th graph in a DIFFERENT combo evicts the LRU combo ('v' is the only
    # other combo, so all its shapes drop and its jit cache is cleared)
    eng.warmup(modalities="a", w=8, mel=64)
    combos = {k[0] for k in eng.cached_graphs}
    assert combos == {(False, False, True)}
    assert eng._combo_cache[(True, False, False)]._cache_size() == 0


def test_bound_holds_within_a_single_combo():
    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(7)),
                      max_cached_graphs=2)
    # exceed the budget entirely within ONE combo: the bound must still
    # hold (the documented guarantee), so the active combo's own cache is
    # dropped and only the in-flight shape survives
    for t in (16, 32, 64):
        eng.warmup(modalities="v", t=t)
    assert len(eng.cached_graphs) == 1
    assert eng._combo_cache[(True, False, False)]._cache_size() == 1
    # and the engine still serves correctly afterwards
    out = eng.extract(modalities="v",
                      visual_feats=np.ones((20, 1024), np.float32))
    assert out["gesture_emb"].shape == (20, 512)


def test_warmup_all_compiles_every_requested_combo(engine):
    # buckets chosen to match the extract below: T=14 -> 32, 1 s of 16 kHz
    # audio -> 100 mel frames -> 128 bucket, 2 words -> 8 bucket
    records = engine.warmup_all(combos=("va", "v", "a"), t_buckets=(32,),
                                w_buckets=(8,), mel_buckets=(128,))
    assert [r["combo"] for r in records] == ["va", "v", "a"]
    assert all(r["seconds"] > 0 for r in records)
    # the first real request at a warmed shape must not re-trace:
    # cache size per combo stays put after an extract at the warmed bucket
    before = engine._combo_cache[(True, False, True)]._cache_size()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 500).astype(np.float32)
    engine.extract(modalities="va",
                   visual_feats=rng.standard_normal((14, 1024)).astype(np.float32),
                   wav=wav, word_boundaries=[["w", 1, 6], ["x", 7, 12]])
    after = engine._combo_cache[(True, False, True)]._cache_size()
    assert after == before


def test_serve_mesh_requires_batch_window():
    """--data_parallel (mesh) without a batching window would warm sharded
    graphs that no live request ever executes — serve() must refuse the
    contradiction up front."""
    import pytest

    from jegal_tpu.serving import serve

    with pytest.raises(ValueError, match="batch_window_ms"):
        serve(object(), mesh=object(), batch_window_ms=0.0)
