"""Fused single-dispatch engine paths (VERDICT r3 item 1): frames -> tower
-> JEGAL forward as ONE jit must equal the two-stage
gestsync_features + extract path exactly (bucket-padded tail frames produce
edge-repeat features instead of zero rows, but masked attention makes every
valid position identical), for single-clip extract(), batched extract_many(),
the mesh-sharded batch, and the device-resident two-stage variants."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from jegal_tpu.api import ClientError, JegalEngine
from jegal_tpu.models import gestsync as G
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R

from tok_util import make_word_tokenizer


@pytest.fixture(scope="module")
def engine():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    return JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg,
        gestsync_params=G.init_params(jax.random.PRNGKey(1)),
        tokenizer=make_word_tokenizer(),
    )


SAMPLE = dict(
    text="hello world abc",
    word_boundaries=[["hello", 1, 2], ["world", 2, 3], ["abc", 3, 4]],
)


def _clip(rng, t=6):
    fr = rng.integers(0, 255, (t, 270, 480, 3)).astype(np.uint8)
    chin = rng.integers(60, 200, (t,)).astype(np.int32)
    return fr, chin


def _wav(rng, seconds=0.5):
    return (rng.standard_normal(int(16000 * seconds)) * 500).astype(np.float32)


def _content_kwargs(modalities, wav):
    kw = {}
    if "t" in modalities:
        kw["text"] = SAMPLE["text"]
    if "t" in modalities or "a" in modalities:
        kw["word_boundaries"] = SAMPLE["word_boundaries"]
    if "a" in modalities:
        kw["wav"] = wav
    return kw


def _assert_same(a, b):
    assert (a is None) == (b is None)
    for key in ("gesture_emb", "content_emb"):
        x, y = a[key], b[key]
        assert (x is None) == (y is None), key
        if x is not None:
            np.testing.assert_allclose(x, y, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("modalities", ["vta", "vt", "v"])
def test_fused_single_matches_two_stage(engine, rng, modalities):
    fr, chin = _clip(rng)
    wav = _wav(rng)
    kw = _content_kwargs(modalities, wav)
    feats = engine.gestsync_features(fr, chin)
    want = engine.extract(modalities=modalities, visual_feats=feats,
                          fname="x", **kw)
    got = engine.extract(modalities=modalities, frames=fr, chin_rows=chin,
                         fname="x", **kw)
    _assert_same(got, want)


def test_fused_single_planar_and_device_frames(engine, rng):
    from jegal_tpu.host import media

    fr, chin = _clip(rng)
    wav = _wav(rng)
    kw = _content_kwargs("va", wav)
    want = engine.extract(modalities="va",
                          visual_feats=engine.gestsync_features(fr, chin),
                          fname="x", **kw)
    planar = media.s2d_repack(fr, chin)
    got = engine.extract(modalities="va", frames=planar, fname="x", **kw)
    _assert_same(got, want)
    # frames already on device: the fused path must accept a jax.Array
    # (bucket padding then happens on device, zero extra host traffic)
    got_dev = engine.extract(modalities="va", frames=jnp.asarray(planar),
                             fname="x", **kw)
    _assert_same(got_dev, want)


def test_fused_extract_many_matches_per_sample(engine, rng):
    """Batched fused groups (mixed raw/planar kinds, mixed T within one
    bucket, plus one visual_feats sample and one invalid sample) must equal
    per-sample extract()."""
    from jegal_tpu.host import media

    wav = _wav(rng)
    clips = [_clip(rng, t) for t in (6, 5, 6)]
    samples = [
        dict(frames=clips[0][0], chin_rows=clips[0][1], fname="a",
             **_content_kwargs("vta", wav)),
        dict(frames=clips[1][0], chin_rows=clips[1][1], fname="b",
             **_content_kwargs("vta", wav)),
        dict(frames=media.s2d_repack(*clips[2]), fname="c",
             **_content_kwargs("vta", wav)),
        dict(visual_feats=engine.gestsync_features(*clips[0]), fname="d",
             **_content_kwargs("vta", wav)),
        dict(frames=clips[0][0][:, :10], fname="bad"),  # bad frame shape
    ]
    got = engine.extract_many(samples, modalities="vta", batch_size=4)
    assert got[4] is None
    for i in range(3):
        want = engine.extract(
            modalities="vta", frames=samples[i]["frames"],
            chin_rows=samples[i].get("chin_rows"), fname=samples[i]["fname"],
            **_content_kwargs("vta", wav))
        _assert_same(got[i], want)
    want = engine.extract(modalities="vta",
                          visual_feats=samples[3]["visual_feats"],
                          fname="d", **_content_kwargs("vta", wav))
    _assert_same(got[3], want)


def test_fused_extract_many_mesh(engine, rng):
    """The fused batched graph sharded over the 'data' mesh axis equals the
    unsharded batch (the multi-chip path of the fused pipeline)."""
    from jegal_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(min(4, len(jax.devices())))
    wav = _wav(rng)
    samples = []
    for _ in range(3):
        fr, chin = _clip(rng)
        samples.append(dict(frames=fr, chin_rows=chin, fname="m",
                            **_content_kwargs("vta", wav)))
    got = engine.extract_many(samples, modalities="vta", batch_size=4,
                              mesh=mesh)
    want = engine.extract_many(samples, modalities="vta", batch_size=4)
    for g, w in zip(got, want):
        _assert_same(g, w)


def test_fused_client_errors(engine, rng):
    fr, chin = _clip(rng)
    with pytest.raises(ClientError):
        engine.extract(modalities="ta", frames=fr, text="x",
                       word_boundaries=[["x", 0, 1]], wav=_wav(rng))
    with pytest.raises(ClientError):
        engine.extract(modalities="v", frames=fr,
                       visual_feats=np.zeros((4, 1024), np.float32))
    with pytest.raises(ClientError):
        engine.extract(modalities="v",
                       visual_feats=np.zeros((4, 1024), np.float32),
                       chin_rows=chin)
    with pytest.raises(ClientError):  # planar pre-masked + chin
        from jegal_tpu.host import media

        engine.extract(modalities="v", frames=media.s2d_repack(fr, chin),
                       chin_rows=chin)
    with pytest.raises(ClientError):  # float frames are not the fused input
        engine.extract(modalities="v",
                       frames=fr.astype(np.float32))


def test_bf16_outputs_exactly_unit_norm(rng):
    """A bf16 engine normalizing on device leaves row norms at 1 +- 0.4%
    (found by the r4 on-chip A/B: 'cosine' dot products between
    bit-identical embeddings read 0.995); _postprocess must normalize in
    f32 on host so the .pkl rows are exactly unit."""
    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(3)),
                      dtype=jnp.bfloat16)
    feats = rng.standard_normal((9, 1024)).astype(np.float32)
    out = eng.extract(modalities="v", visual_feats=feats, fname="n")
    norms = np.linalg.norm(out["gesture_emb"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)


def test_bf16_visual_feats_accepted(engine, rng):
    """A bf16 engine's own gestsync_features output is an ml_dtypes.bfloat16
    numpy array, which numpy does not class under np.number — validation
    must use jnp dtype lattice (regression: r4 on-chip drive caught the
    two-stage path rejecting its own features)."""
    import ml_dtypes

    feats = rng.standard_normal((9, 1024)).astype(ml_dtypes.bfloat16)
    out = engine.extract(modalities="v", visual_feats=feats, fname="bf16")
    assert out is not None
    assert out["gesture_emb"].shape == (9, 512)


def test_device_resident_two_stage(engine, rng):
    """as_device features feed extract/extract_many without ever leaving
    the device (prepare_visual pads with jnp; batches stack with jnp)."""
    fr, chin = _clip(rng)
    feats_host = engine.gestsync_features(fr, chin)
    feats_dev = engine.gestsync_features(fr, chin, as_device=True)
    assert isinstance(feats_dev, jax.Array)
    np.testing.assert_allclose(np.asarray(feats_dev), feats_host,
                               rtol=2e-5, atol=2e-5)
    want = engine.extract(modalities="v", visual_feats=feats_host, fname="x")
    got = engine.extract(modalities="v", visual_feats=feats_dev, fname="x")
    _assert_same(got, want)
    got_many = engine.extract_many(
        [dict(visual_feats=feats_dev, fname="x"),
         dict(visual_feats=feats_host, fname="y")],
        modalities="v", batch_size=2)
    _assert_same(got_many[0], want)
    _assert_same(got_many[1], want)


def test_from_raw_many_device_clips(engine, rng):
    """Clips already device_put (the extract-feats driver uploads on its
    decode threads) batch on device and match host-clip results; as_device
    returns device arrays."""
    clips = [_clip(rng, t) for t in (6, 5)]
    want = engine.gestsync_features_from_raw_many(clips, batch_size=2)
    dev_clips = [(jnp.asarray(fr), chin) for fr, chin in clips]
    got = engine.gestsync_features_from_raw_many(dev_clips, batch_size=2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5)
    got_dev = engine.gestsync_features_from_raw_many(
        dev_clips, batch_size=2, as_device=True)
    for g, w in zip(got_dev, want):
        assert isinstance(g, jax.Array)
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-5, atol=2e-5)


def test_warmup_frames_kind(engine):
    engine.warmup(modalities="v", t=32, batch=1, frames_kind="raw")
    engine.warmup(modalities="v", t=32, batch=2, frames_kind="planar")
    keys = [k for k in engine._combo_cache if isinstance(k, tuple)
            and k and k[0] == "fused"]
    assert any(k[1] == "raw" and k[4] is False for k in keys)
    assert any(k[1] == "planar" and k[4] is True for k in keys)
    with pytest.raises(ValueError):
        engine.warmup(modalities="ta", frames_kind="raw")


def test_warmup_matches_live_fused_signatures(engine, rng):
    """warmup must warm the EXACT signature live traffic uses: jit
    executables key on device committed-ness as well as shape/dtype, so a
    warmup built from committed jnp arrays where live requests pass host
    numpy (single-sample prep is host numpy since the eager-op-storm fix)
    compiles a graph no request ever hits — the first live request then
    pays the compile the warmup existed to absorb."""
    from jegal_tpu.data.bucketing import T_BUCKETS, next_bucket

    fr, chin = _clip(rng)
    t_b = next_bucket(fr.shape[0], T_BUCKETS)
    # single-clip fused graph: live = host numpy frames (CLI infer/serving)
    engine.warmup(modalities="v", t=t_b, frames_kind="raw")
    key = engine._fused_key("raw", False, False, batched=False)
    before = engine._combo_cache[key]._cache_size()
    assert engine.extract(modalities="v", frames=fr,
                          chin_rows=chin) is not None
    assert engine._combo_cache[key]._cache_size() == before
    # batched fused graph: live = put_batch-committed device arrays
    engine.warmup(modalities="v", t=t_b, frames_kind="raw", batch=2)
    bkey = engine._fused_key("raw", False, False, batched=True)
    before = engine._combo_cache[bkey]._cache_size()
    outs = engine.extract_many(
        [dict(frames=fr, chin_rows=chin), dict(frames=fr, chin_rows=chin)],
        modalities="v", batch_size=2)
    assert all(o is not None for o in outs)
    assert engine._combo_cache[bkey]._cache_size() == before


def test_warmup_matches_live_two_stage_batched(engine, rng):
    """Batched two-stage warmup must match extract_many's _stack_parts
    placement (put_batch-committed) for host-prepared samples."""
    engine.warmup(modalities="v", t=32, batch=2)
    key = (True, False, False)
    before = engine._combo_cache[key]._cache_size()
    feats = rng.standard_normal((14, 1024)).astype(np.float32)
    outs = engine.extract_many([dict(visual_feats=feats)] * 2,
                               modalities="v", batch_size=2)
    assert all(o is not None for o in outs)
    assert engine._combo_cache[key]._cache_size() == before
