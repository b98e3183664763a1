"""JegalEngine end-to-end: bucketed/padded execution must equal the
natural-shape forward (exactly-neutral padding), all seven combos run, and
the .pkl schema matches the reference contract."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from jegal_tpu.api import JegalEngine
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R
from jegal_tpu.ops import pooling as P
from jegal_tpu.ops.audio import wav2filterbanks

from tok_util import make_word_tokenizer


@pytest.fixture(scope="module")
def tiny_roberta():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    return R.params_from_hf(hf.state_dict(), cfg), cfg


@pytest.fixture(scope="module")
def engine(tiny_roberta):
    rparams, rcfg = tiny_roberta
    return JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=rparams,
        roberta_cfg=rcfg,
        tokenizer=make_word_tokenizer(),
    )


SAMPLE = dict(
    text="hello world abc",
    word_boundaries=[["hello", 2, 7], ["world", 8, 12], ["abc", 13, 18]],
)


def _wav(rng, seconds=1.0):
    return (rng.standard_normal(int(16000 * seconds)) * 500).astype(np.float32)


def test_ta_bucketing_is_neutral(engine, rng):
    """Engine (bucketed) vs direct natural-shape forward: identical outputs."""
    wav = _wav(rng)
    out = engine.extract(modalities="ta", wav=wav, fname="s1", **SAMPLE)
    assert out is not None
    content = out["content_emb"]
    assert content.shape == (3, 512)

    # natural shapes, no padding
    batch = engine.tokenizer.encode_words([SAMPLE["text"]])
    s_nat = batch.input_ids.shape[1]
    starts = P.text_word_starts(batch.input_ids, batch.offsets, batch.special_ids)
    tpool, tvalid, _ = P.build_text_pooling(starts, [3], s_nat, 3)
    assert tvalid[0]
    mel = wav2filterbanks(jnp.asarray(wav)[None])
    apool, avalid, _ = P.build_audio_pooling([SAMPLE["word_boundaries"]],
                                             mel.shape[1] // 4, 3)
    assert avalid[0]
    _, c = J.forward_inference(
        engine.jegal_params, engine.roberta_params,
        use_v=False, use_t=True, use_a=True,
        input_ids=jnp.asarray(batch.input_ids, jnp.int32),
        text_mask=jnp.asarray(batch.attention_mask, jnp.float32),
        text_pool=jnp.asarray(tpool),
        audio_mel=mel,
        audio_pool=jnp.asarray(apool),
        roberta_cfg=engine.roberta_cfg,
    )
    from jegal_tpu.api import l2_normalize
    want = np.asarray(l2_normalize(c)[0], np.float32)
    np.testing.assert_allclose(content, want, rtol=1e-4, atol=1e-5)


def test_all_combos_run(engine, rng):
    wav = _wav(rng, 0.6)
    feats = rng.standard_normal((11, 1024)).astype(np.float32)
    for m in ("vta", "vt", "va", "ta", "v", "t", "a"):
        out = engine.extract(
            modalities=m,
            visual_feats=feats if "v" in m else None,
            wav=wav if "a" in m else None,
            text=SAMPLE["text"] if "t" in m else None,
            word_boundaries=SAMPLE["word_boundaries"],
            fname=f"combo_{m}",
        )
        assert out is not None, m
        if "v" in m:
            assert out["gesture_emb"].shape == (11, 512)
            np.testing.assert_allclose(
                np.linalg.norm(out["gesture_emb"], axis=-1), 1.0, rtol=1e-4)
        else:
            assert out["gesture_emb"] is None
        if "t" in m or "a" in m:
            assert out["content_emb"].shape == (3, 512)
            np.testing.assert_allclose(
                np.linalg.norm(out["content_emb"], axis=-1), 1.0, rtol=1e-4)
        else:
            assert out["content_emb"] is None


def test_visual_bucketing_is_neutral(engine, rng):
    feats = rng.standard_normal((19, 1024)).astype(np.float32)
    out = engine.extract(modalities="v", visual_feats=feats, fname="v")
    g = J.forward_gestures(
        engine.jegal_params, jnp.asarray(feats)[None], jnp.ones((1, 19)))
    g = J._mlp2(engine.jegal_params["proj_op_align_gesture"], g)
    from jegal_tpu.api import l2_normalize
    want = np.asarray(l2_normalize(g)[0], np.float32)
    np.testing.assert_allclose(out["gesture_emb"], want, rtol=1e-4, atol=1e-5)


def test_pkl_roundtrip(engine, rng, tmp_path):
    import pickle

    wav = _wav(rng, 0.5)
    path = engine.extract_to_pkl(
        str(tmp_path), modalities="a", wav=wav,
        word_boundaries=SAMPLE["word_boundaries"], fname="roundtrip")
    with open(path, "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"gesture_emb", "content_emb", "info"}
    assert d["gesture_emb"] is None
    assert d["content_emb"].shape == (3, 512)
    assert d["info"]["fname"] == "roundtrip"
    assert d["info"]["word_boundaries"] == SAMPLE["word_boundaries"]


def test_audio_token_count_non_multiple_of_4(engine, rng):
    """t_mel % 4 != 0: the CNN emits (t_mel-1)//4+1 tokens; a word living in
    the final token must survive (review finding: t_mel//4 dropped it)."""
    import jax.numpy as jnp

    from jegal_tpu.models import jegal as J
    from jegal_tpu.ops.audio import wav2filterbanks

    wav = (rng.standard_normal(16480) * 300).astype(np.float32)  # t_mel=103
    mel = wav2filterbanks(jnp.asarray(wav)[None])
    assert mel.shape[1] == 103
    n_tokens = np.asarray(J.forward_audio(engine.jegal_params, mel)).shape[1]
    assert n_tokens == (103 - 1) // 4 + 1 == 26

    # word boundaries whose last word occupies exactly the final token
    wbs = [["a", 0, 10], ["b", 11, 24], ["c", 25, 25]]
    out = engine.extract(modalities="a", wav=wav, word_boundaries=wbs,
                         fname="tail")
    assert out is not None
    assert out["content_emb"].shape == (3, 512)

    # padded-mel tokens must match the natural-length forward exactly when
    # valid_lens gates the temporal-padding layers (without it the last ~2
    # tokens see computed-garbage neighbors instead of conv zero-padding)
    from jegal_tpu.data.bucketing import pad_axis

    mel_pad = jnp.asarray(pad_axis(np.asarray(mel), 1, 128))
    tok_nat = np.asarray(J.forward_audio(engine.jegal_params, mel))
    tok_pad = np.asarray(J.forward_audio(engine.jegal_params, mel_pad,
                                         jnp.asarray([103])))
    np.testing.assert_allclose(tok_pad[:, :26], tok_nat, rtol=1e-5, atol=1e-5)
    tok_bad = np.asarray(J.forward_audio(engine.jegal_params, mel_pad))
    assert np.abs(tok_bad[:, :26] - tok_nat).max() > 1e-3  # the bug existed


def test_fusion_strategy_avg(tiny_roberta, rng):
    """'avg' fusion is reachable via the engine and changes outputs."""
    rparams, rcfg = tiny_roberta
    base = dict(jegal_params=J.init_params(jax.random.PRNGKey(3)),
                roberta_params=rparams, roberta_cfg=rcfg,
                tokenizer=make_word_tokenizer())
    e_concat = JegalEngine(**base)
    e_avg = JegalEngine(**base, fusion_strategy="avg")
    wav = _wav(rng, 0.6)
    kw = dict(modalities="ta", wav=wav, fname="f", **SAMPLE)
    a = e_concat.extract(**kw)
    b = e_avg.extract(**kw)
    assert a["content_emb"].shape == b["content_emb"].shape == (3, 512)
    assert np.abs(a["content_emb"] - b["content_emb"]).max() > 1e-3


def test_extraction_is_deterministic(engine, rng):
    """Same inputs through two separate calls -> bit-identical embeddings
    (no hidden RNG/nondeterminism in the inference path)."""
    wav = _wav(rng, 0.5)
    kw = dict(modalities="ta", wav=wav, fname="d", **SAMPLE)
    a = engine.extract(**kw)
    b = engine.extract(**kw)
    np.testing.assert_array_equal(a["content_emb"], b["content_emb"])


def test_warmup_precompiles_bucket(engine, rng):
    """After warmup, an extraction landing in the warmed bucket reuses the
    jit entry (no new cache key) and produces normal results."""
    engine.warmup(modalities="ta", s=32, w=8, mel=128)
    n_keys = len(engine._combo_cache)
    wav = _wav(rng, 0.5)  # 8000 samples -> mel 50 -> bucket 128; words 3 -> 8
    out = engine.extract(modalities="ta", wav=wav, fname="w", **SAMPLE)
    assert out is not None and out["content_emb"].shape == (3, 512)
    assert len(engine._combo_cache) == n_keys  # same combo entry reused


@pytest.mark.slow
def test_bucketing_neutrality_sweep(engine, rng):
    """Property sweep: for assorted ragged shapes, the bucketed engine must
    match the natural-shape forward (content cosine ~ 1)."""
    from jegal_tpu.api import l2_normalize

    for trial in range(4):
        n_words = int(rng.integers(2, 7))
        words = []
        f = int(rng.integers(0, 4))
        for i in range(n_words):
            start = f
            f += int(rng.integers(1, 5))
            words.append(["ab" if i % 2 else "hello", start, f])
            f += 1
        text = " ".join(w[0] for w in words)
        secs = float(rng.uniform(0.4, 1.6))
        wav = (rng.standard_normal(int(16000 * secs)) * 400).astype(np.float32)

        out = engine.extract(modalities="ta", wav=wav, text=text,
                             word_boundaries=words, fname=f"s{trial}")
        if out is None:  # invalid under reference rules (e.g. span overruns)
            continue

        batch = engine.tokenizer.encode_words([text])
        s_nat = batch.input_ids.shape[1]
        starts = P.text_word_starts(batch.input_ids, batch.offsets,
                                    batch.special_ids)
        tpool, tv, _ = P.build_text_pooling(starts, [n_words], s_nat, n_words)
        mel = wav2filterbanks(jnp.asarray(wav)[None])
        t_audio = (mel.shape[1] - 1) // 4 + 1
        apool, av, _ = P.build_audio_pooling([words], t_audio, n_words)
        if not (tv[0] and av[0]):
            assert out is None or True
            continue
        _, c = J.forward_inference(
            engine.jegal_params, engine.roberta_params,
            use_v=False, use_t=True, use_a=True,
            input_ids=jnp.asarray(batch.input_ids, jnp.int32),
            text_mask=jnp.asarray(batch.attention_mask, jnp.float32),
            text_pool=jnp.asarray(tpool), audio_mel=mel,
            audio_pool=jnp.asarray(apool),
            roberta_cfg=engine.roberta_cfg)
        want = np.asarray(l2_normalize(c)[0], np.float32)
        cos = (out["content_emb"] * want).sum(-1)
        assert cos.min() > 1 - 1e-5, (trial, cos)


def test_ta_word_count_mismatch_rejected(engine, rng):
    """Text word count != len(word_boundaries): the reference fails loudly
    on a torch.cat shape mismatch — the engine must reject the sample
    instead of fusing one modality with zero rows."""
    wav = _wav(rng)
    out = engine.extract(
        modalities="ta", wav=wav, fname="bad",
        text="hello world",  # 2 words vs 3 boundary entries
        word_boundaries=SAMPLE["word_boundaries"])
    assert out is None


def test_gestsync_front_door_dispatch(rng):
    """engine.gestsync_features must route all three input layouts to the
    same numerics: raw uint8 (T, 270, 480, 3) + chin rows, host-repacked
    planar uint8 (T, 90, 27, 160), and the reference's pre-masked
    edge-padded float (T+24, 270, 480, 3) layout (which once got silently
    shadowed by the uint8 front door and returned T+24 untrimmed rows)."""
    import jax

    from jegal_tpu.host import media
    from jegal_tpu.models import gestsync as G
    from jegal_tpu.ops.video import mask_frames_device

    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(0)),
                      gestsync_params=G.init_params(jax.random.PRNGKey(1)))
    t = 6
    fr = rng.integers(0, 255, (t, 270, 480, 3)).astype(np.uint8)
    chin = rng.integers(60, 200, (t,)).astype(np.int32)

    raw = eng.gestsync_features(fr, chin)
    assert raw.shape == (t, 1024)

    planar = eng.gestsync_features(media.s2d_repack(fr, chin))
    np.testing.assert_allclose(planar, raw, rtol=2e-5, atol=2e-5)

    # reference layout: masked float frames, edge-padded +/-12
    padded = np.asarray(mask_frames_device(jnp.asarray(fr),
                                           jnp.asarray(chin)))
    assert padded.shape == (t + 2 * G.EDGE_PAD, 270, 480, 3)
    legacy = eng.gestsync_features(padded)
    assert legacy.shape == (t, 1024)
    np.testing.assert_allclose(legacy, raw, rtol=2e-5, atol=2e-5)
    from jegal_tpu.api import ClientError

    with pytest.raises(ClientError):
        eng.gestsync_features(padded, chin)  # pre-masked + chin = invalid
    with pytest.raises(ClientError):  # planar + chin = invalid too
        eng.gestsync_features(media.s2d_repack(fr, chin), chin)


def test_bf16_engine_from_mixed_placement_params():
    """Engine construction must survive a params tree whose leaves are
    committed to incompatible device sets — e.g. JEGAL params sharded over
    a mesh (straight out of trainer.shard_training) while GestSync params
    are host numpy. The one-jit whole-tree cast cannot span such a tree;
    the fallback casts per leaf, preserving each leaf's placement
    (advisor r5 finding 1)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jegal_tpu.api import JegalEngine
    from jegal_tpu.models import jegal as J
    from jegal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:  # JEGAL_TEST_TPU=1 runs on the one real chip
        pytest.skip("needs 8 devices")
    jparams = J.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=2)
    # commit leaves to DIFFERENT device subsets: replicated-over-mesh for
    # one branch, single-device for another — one jit cannot take both
    repl = NamedSharding(mesh, P())
    d1 = jax.devices()[1]
    mixed = dict(jparams)
    k0 = sorted(jparams)[0]
    k1 = sorted(jparams)[1]
    mixed[k0] = jax.tree.map(lambda x: jax.device_put(x, repl), jparams[k0])
    mixed[k1] = jax.tree.map(lambda x: jax.device_put(x, d1), jparams[k1])

    eng = JegalEngine(jegal_params=mixed, dtype=jnp.bfloat16)
    leaves = jax.tree.leaves(eng.jegal_params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    # placements preserved by the per-leaf fallback
    for l in jax.tree.leaves(eng.jegal_params[k1]):
        assert l.devices() == {d1}
    out = eng.extract(modalities="v",
                      visual_feats=np.ones((6, 1024), np.float32))
    assert out["gesture_emb"].shape == (6, 512)


def test_engine_from_mixed_placement_roberta(tiny_roberta):
    """stack_layers at engine load must also survive a roberta tree whose
    leaves are committed to incompatible device sets (the jit falls back
    to eager per-op stacking — advisor r5 finding 2)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jegal_tpu.api import JegalEngine
    from jegal_tpu.models import jegal as J
    from jegal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rparams, cfg = tiny_roberta
    mesh = make_mesh(8, model_parallel=2)
    repl = NamedSharding(mesh, P())
    d1 = jax.devices()[1]
    mixed = {
        "embeddings": jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), repl),
            rparams["embeddings"]),
        "layers": [jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), d1), layer)
            for layer in rparams["layers"]],
    }
    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(0)),
                      roberta_params=mixed, roberta_cfg=cfg)
    # stacked scan layout produced despite the mixed input placements
    assert not isinstance(eng.roberta_params.get("layers"), (list, tuple))
