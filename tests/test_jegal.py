"""JEGAL model parity vs a torch oracle assembled from the reference's own
modules (mounted read-only), with the XLM-R hidden states injected directly
so no HF download is needed."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from jegal_tpu.models import jegal as J
from jegal_tpu.ops import pooling as P

from oracles import reference_available, ref_modules, to_numpy


def _build_oracle():
    """torch JEGAL with the reference's exact module names/shapes
    (models/jegal.py:18-76), minus the HF backbone."""
    import copy

    m = ref_modules()
    d, d_text, h = 512, 768, 8

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj_ip_rgb = nn.Sequential(
                nn.Linear(1024, 512), nn.LayerNorm(512), nn.ReLU(), nn.Linear(512, 512)
            )
            attn = m.MultiHeadedAttention_Transformer(h, d, dropout=0.0)
            ff = m.PositionwiseFeedForward_Transformer(d, d * 4, 0.0)
            self.position_rgb = m.PositionalEncoding_Transformer(d, 0.0)
            self.encoder_rgb = m.Encoder_Transformer(
                m.EncoderLayer_Transformer(d, copy.deepcopy(attn), copy.deepcopy(ff), 0.0), 6
            )
            self.proj_op_rgb = nn.Linear(512, 512)
            attn_t = m.MultiHeadedAttention_Transformer(h, d_text, dropout=0.0)
            ff_t = m.PositionwiseFeedForward_Transformer(d_text, d_text * 4, 0.0)
            self.encoder_text = m.Encoder_Transformer(
                m.EncoderLayer_Transformer(d_text, copy.deepcopy(attn_t), copy.deepcopy(ff_t), 0.0), 3
            )
            self.proj_op_text = nn.Linear(768, 256)
            self.cnn = nn.Sequential(
                nn.Conv2d(1, 32, 5, (1, 1), 2), nn.BatchNorm2d(32), nn.ReLU(),
                nn.Conv2d(32, 64, 3, (2, 2), 1), nn.BatchNorm2d(64), nn.ReLU(),
                nn.Conv2d(64, 128, 3, (2, 2), 1), nn.BatchNorm2d(128), nn.ReLU(),
                nn.Conv2d(128, 256, 3, (1, 3), 1), nn.BatchNorm2d(256), nn.ReLU(),
                nn.Conv2d(256, 256, 3, (1, 3), 1), nn.BatchNorm2d(256), nn.ReLU(),
                nn.Conv2d(256, 256, 1, (1, 3), 0),
            )
            self.proj_op_audio = nn.Linear(256, 256)
            self.proj_op_fusion_content = nn.Sequential(
                nn.Linear(512, 512), nn.ReLU(), nn.Linear(512, 512))
            self.proj_op_align_gesture = nn.Sequential(
                nn.Linear(512, 512), nn.ReLU(), nn.Linear(512, 512))
            self.proj_op_align_content = nn.Sequential(
                nn.Linear(512, 512), nn.ReLU(), nn.Linear(512, 512))

        def forward_gestures(self, x, x_mask):
            x = self.proj_ip_rgb(x)
            x = self.position_rgb(x)
            x = self.encoder_rgb(x, x_mask)
            return self.proj_op_rgb(x)

        def forward_text(self, x, x_mask):
            return self.proj_op_text(self.encoder_text(x, x_mask))

        def forward_audio(self, x):
            c = self.cnn(x.unsqueeze(1)).squeeze(-1).permute(0, 2, 1)
            return self.proj_op_audio(c)

    torch.manual_seed(0)
    oracle = Oracle().eval()
    with torch.no_grad():
        for mod in oracle.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
            if isinstance(mod, m.LayerNorm):
                mod.a_2.uniform_(0.8, 1.2)
                mod.b_2.uniform_(-0.1, 0.1)
    return oracle


@pytest.fixture(scope="module")
def oracle():
    if not reference_available():
        pytest.skip("reference not mounted")
    return _build_oracle()


@pytest.fixture(scope="module")
def params(oracle):
    return J.params_from_torch(oracle.state_dict())


def test_gesture_branch_parity(oracle, params, rng):
    b, t = 2, 14
    feats = rng.standard_normal((b, t, 1024)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[1, 10:] = 0
    with torch.no_grad():
        g = oracle.forward_gestures(
            torch.from_numpy(feats), torch.from_numpy(mask).unsqueeze(1))
        want = to_numpy(oracle.proj_op_align_gesture(g))
    got_pre = J.forward_gestures(params, jnp.asarray(feats), jnp.asarray(mask))
    got = np.asarray(J._mlp2(params["proj_op_align_gesture"], got_pre))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_audio_branch_parity(oracle, params, rng):
    b, tm = 2, 96
    mel = rng.standard_normal((b, tm, 80)).astype(np.float32) * 2
    with torch.no_grad():
        want = to_numpy(oracle.forward_audio(torch.from_numpy(mel)))
    got = np.asarray(J.forward_audio(params, jnp.asarray(mel)))
    assert got.shape == want.shape == (b, tm // 4, 256)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_text_branch_parity(oracle, params, rng):
    b, s = 2, 11
    hidden = rng.standard_normal((b, s, 768)).astype(np.float32)
    mask = np.ones((b, s), np.float32)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = to_numpy(oracle.forward_text(
            torch.from_numpy(hidden), torch.from_numpy(mask).unsqueeze(1)))
    got = np.asarray(J.forward_text(params, jnp.asarray(hidden), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_full_content_path_parity(oracle, params, rng):
    """ta combo end-to-end (minus XLM-R): text+audio word pooling + fusion +
    align vs the reference algorithm run on the oracle."""
    s, tm = 10, 64
    t_audio = tm // 4
    hidden = rng.standard_normal((1, s, 768)).astype(np.float32)
    text_mask = np.ones((1, s), np.float32)
    mel = rng.standard_normal((1, tm, 80)).astype(np.float32)
    word_starts = [[1, 4, 6]]
    n_words = [3]
    wbs = [[["w0", 7, 9], ["w1", 10, 11], ["w2", 12, 15]]]

    with torch.no_grad():
        sub = oracle.forward_text(torch.from_numpy(hidden),
                                  torch.from_numpy(text_mask).unsqueeze(1))[0]
        text_words = []
        for w in range(3):
            lo = word_starts[0][w]
            hi = word_starts[0][w + 1] if w < 2 else s
            text_words.append(sub[lo:hi].mean(dim=0))
        text_words = torch.stack(text_words)[None]

        tokens = oracle.forward_audio(torch.from_numpy(mel))[0]
        a0 = 7
        audio_words = torch.stack([
            tokens[7 - a0 : 9 - a0 + 1].mean(dim=0),
            tokens[10 - a0 : 11 - a0 + 1].mean(dim=0),
            tokens[12 - a0 : 15 - a0 + 1].mean(dim=0),
        ])[None]
        fused = torch.cat([audio_words, text_words], dim=-1)
        want = to_numpy(oracle.proj_op_align_content(
            oracle.proj_op_fusion_content(fused)))

    text_pool, tv, _ = P.build_text_pooling(word_starts, n_words, s, 4)
    audio_pool, av, _ = P.build_audio_pooling(wbs, t_audio, 4)
    assert tv[0] and av[0]

    import jegal_tpu.models.roberta as R  # noqa: F401 (not used: no use_t via roberta)

    sub_j = J.forward_text(params, jnp.asarray(hidden), jnp.asarray(text_mask))
    tw = P.pool_words(jnp.asarray(text_pool), sub_j)
    tok_j = J.forward_audio(params, jnp.asarray(mel))
    aw = P.pool_words(jnp.asarray(audio_pool), tok_j)
    got = np.asarray(J.fuse_content(params, aw, tw, align=True))

    np.testing.assert_allclose(got[:, :3], want, rtol=2e-3, atol=2e-3)


def test_forward_inference_combo_shapes(params, rng):
    """All seven combos produce the documented output shapes."""
    b, t, s, tm, w_max = 1, 6, 9, 32, 4
    feats = jnp.asarray(rng.standard_normal((b, t, 1024)).astype(np.float32))
    vmask = jnp.ones((b, t))
    mel = jnp.asarray(rng.standard_normal((b, tm, 80)).astype(np.float32))
    text_pool = jnp.asarray(
        P.build_text_pooling([[1, 3]], [2], s, w_max)[0])
    audio_pool = jnp.asarray(
        P.build_audio_pooling([[["a", 0, 2], ["b", 3, 5]]], tm // 4, w_max)[0])

    # roberta: tiny random params via our init-free converter is overkill;
    # use a stub hidden-state path by monkeypatching? Instead: use_t combos
    # are exercised with a tiny roberta.
    from jegal_tpu.models import roberta as R
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=128,
                          max_position_embeddings=32)
    torch.manual_seed(1)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=128,
        max_position_embeddings=32, pad_token_id=1)).eval()
    rparams = R.params_from_hf(hf.state_dict(), cfg)
    ids = jnp.asarray(np.array([[0, 5, 9, 17, 33, 2, 1, 1, 1]], np.int32))
    tmask = (ids != 1).astype(jnp.float32)

    def run(v, t_, a):
        return J.forward_inference(
            params, rparams if t_ else None,
            use_v=v, use_t=t_, use_a=a,
            visual_feats=feats if v else None,
            visual_mask=vmask if v else None,
            input_ids=ids if t_ else None,
            text_mask=tmask if t_ else None,
            text_pool=text_pool if t_ else None,
            audio_mel=mel if a else None,
            audio_pool=audio_pool if a else None,
            roberta_cfg=cfg,
        )

    for v, t_, a in [(1, 1, 1), (1, 1, 0), (1, 0, 1), (0, 1, 1),
                     (1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        g, c = run(bool(v), bool(t_), bool(a))
        if v:
            assert g.shape == (b, t, 512)
        else:
            assert g is None
        if t_ or a:
            assert c.shape == (b, w_max, 512)
        else:
            assert c is None


def test_forward_validation(params, rng):
    """forward_validation: no align heads; zeros substitution for a missing
    content modality (reference models/jegal.py:330-375)."""
    b, t, tm, w_max = 1, 6, 32, 4
    feats = jnp.asarray(rng.standard_normal((b, t, 1024)).astype(np.float32))
    vmask = jnp.ones((b, t))
    mel = jnp.asarray(rng.standard_normal((b, tm, 80)).astype(np.float32))
    audio_pool = jnp.asarray(
        P.build_audio_pooling([[["a", 0, 2], ["b", 3, 5]]], tm // 4, w_max)[0])

    g, c = J.forward_validation(
        params, use_t=False, use_a=True,
        visual_feats=feats, visual_mask=vmask,
        audio_mel=mel, audio_pool=audio_pool)
    assert g.shape == (b, t, 512) and c.shape == (b, w_max, 512)

    # va (audio-only content) must equal fusing audio with explicit zeros
    tokens = J.forward_audio(params, mel)
    aw = P.pool_words(audio_pool, tokens)
    want = J.fuse_content(params, aw, jnp.zeros_like(aw), align=False)
    np.testing.assert_allclose(np.asarray(c), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and differ from the align-head (inference) output
    got_inf = J.fuse_content(params, aw, jnp.zeros_like(aw), align=True)
    assert np.abs(np.asarray(got_inf) - np.asarray(c)).max() > 1e-3
