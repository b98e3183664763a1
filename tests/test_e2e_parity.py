"""Capstone end-to-end parity: the COMPLETE vta path — masked frames +
text + audio -> gesture/content embeddings — computed two ways with shared
random weights:

  torch side: reference GestSync (imported from the mount) run with the
      reference's own sliding-window algorithm, reference-module JEGAL
      oracle with HF-torch XLM-R and the reference's naive word-pooling
      loops, fp32;
  jax side:   JegalEngine (shared-conv windowing, bucketed padding,
      on-device pooling/masking machinery).

Individual pieces are parity-tested elsewhere; this composes everything
through the public engine API. slow-marked (full-resolution torch conv3d).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from jegal_tpu.api import JegalEngine
from jegal_tpu.models import gestsync as G
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R
from jegal_tpu.ops import pooling as P
from jegal_tpu.ops.audio import wav2filterbanks

from oracles import reference_available, ref_gestsync
from test_jegal import _build_oracle
from tok_util import make_word_tokenizer

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference not mounted"),
]


def test_full_vta_parity(rng):
    t_frames = 4
    text = "hello ab world"
    wbs = [["hello", 1, 4], ["ab", 5, 8], ["world", 9, 12]]
    wav = (rng.standard_normal(16000) * 400).astype(np.float32)
    masked = rng.random((t_frames + 24, 270, 480, 3)).astype(np.float32)

    # ---------------- torch reference side (fp32) ----------------
    gm = ref_gestsync()
    torch.manual_seed(0)
    gest_t = gm.GestSync().eval()
    with torch.no_grad():
        for m in gest_t.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    with torch.no_grad():
        # reference sliding-window algorithm (inference_embs.py:488-519)
        frames_t = torch.from_numpy(masked).permute(3, 0, 1, 2)  # C,T,H,W
        windows = [frames_t[:, i : i + 25][None] for i in range(t_frames)]
        embs = []
        for w in windows:
            v = gest_t.forward_vid(w)            # (1, 1024, 21)
            embs.append(v.mean(dim=-1))          # (1, 1024)
        visual_feats_t = torch.cat(embs)[None]   # (1, T, 1024)

    oracle = _build_oracle()  # reference-module JEGAL wiring
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(5)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    rcfg = R.RobertaConfig(64, 768, 2, 12, 256, 64)

    tokenizer = make_word_tokenizer()
    batch = tokenizer.encode_words([text])
    s_nat = batch.input_ids.shape[1]
    starts = P.text_word_starts(batch.input_ids, batch.offsets,
                                batch.special_ids)[0]
    mel = np.asarray(wav2filterbanks(jnp.asarray(wav)[None]))  # shared DSP

    with torch.no_grad():
        vmask = torch.ones(1, 1, t_frames)
        g = oracle.forward_gestures(visual_feats_t.float(), vmask)
        gesture_t = oracle.proj_op_align_gesture(g)

        hidden = hf(input_ids=torch.from_numpy(batch.input_ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(batch.attention_mask.astype(np.int64))
                    ).last_hidden_state
        sub = oracle.forward_text(hidden, torch.from_numpy(
            batch.attention_mask.astype(np.float32)).unsqueeze(1))[0]
        # reference naive subword->word pooling (jegal.py:159-182)
        text_words = []
        for w in range(3):
            lo = starts[w]
            hi = starts[w + 1] if w < 2 else s_nat
            text_words.append(sub[lo:hi].mean(dim=0))
        text_words = torch.stack(text_words)[None]

        tokens = oracle.forward_audio(torch.from_numpy(mel))[0]
        a0 = wbs[0][1]
        audio_words = torch.stack([
            tokens[b - a0 : e - a0 + 1].mean(dim=0) for _, b, e in wbs
        ])[None]
        fused = torch.cat([audio_words, text_words], dim=-1)
        content_t = oracle.proj_op_align_content(
            oracle.proj_op_fusion_content(fused))

        gesture_t = torch.nn.functional.normalize(gesture_t, p=2, dim=-1)[0]
        content_t = torch.nn.functional.normalize(content_t, p=2, dim=-1)[0]

    # ---------------- jax engine side (fp32) ----------------
    engine = JegalEngine(
        jegal_params=J.params_from_torch(oracle.state_dict()),
        roberta_params=R.params_from_hf(hf.state_dict(), rcfg),
        roberta_cfg=rcfg,
        gestsync_params=G.params_from_torch(gest_t.state_dict()),
        tokenizer=tokenizer,
    )
    feats = engine.gestsync_features(masked)
    np.testing.assert_allclose(
        feats, visual_feats_t[0].numpy(), rtol=5e-3, atol=5e-3)

    out = engine.extract(modalities="vta", visual_feats=feats, text=text,
                         word_boundaries=wbs, wav=wav, fname="e2e")
    assert out is not None

    # embeddings are unit vectors: compare via cosine
    cos_g = (out["gesture_emb"] * gesture_t.numpy()).sum(-1)
    cos_c = (out["content_emb"] * content_t.numpy()).sum(-1)
    assert cos_g.min() > 1 - 1e-4, cos_g
    assert cos_c.min() > 1 - 1e-4, cos_c
