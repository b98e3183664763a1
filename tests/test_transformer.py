"""Parity tests for the transformer stacks vs the reference implementation
(annotated-style) and torch nn.TransformerEncoder (GestSync-style)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from jegal_tpu.core import transformer as T
from jegal_tpu.convert import torch_import as C

from oracles import reference_available, ref_modules, to_numpy


def test_positional_encoding_parity():
    import math
    d_model, max_len = 64, 50
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    got = T.sinusoidal_position_encoding(max_len, d_model)
    np.testing.assert_allclose(np.asarray(got), pe.numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_annotated_mha_parity(rng):
    m = ref_modules()
    d, h = 64, 8
    attn = m.MultiHeadedAttention_Transformer(h, d, dropout=0.0).eval()
    x = rng.standard_normal((2, 10, d)).astype(np.float32)
    mask = (rng.random((2, 1, 10)) > 0.3).astype(np.float32)
    with torch.no_grad():
        # reference callers pass (B,1,T); the module unsqueezes the head axis
        want = to_numpy(attn(torch.from_numpy(x), torch.from_numpy(x),
                             torch.from_numpy(x), torch.from_numpy(mask)))
    p = C.mha_from_annotated_torch(attn.state_dict(), "")
    got = T.multi_head_attention(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                                 jnp.asarray(mask), h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_annotated_encoder_stack_parity(rng):
    """Full pre-norm encoder stack (the JEGAL gesture/text encoders' shape)."""
    import copy
    m = ref_modules()
    d, h, n = 64, 8, 3
    attn = m.MultiHeadedAttention_Transformer(h, d, dropout=0.0)
    ff = m.PositionwiseFeedForward_Transformer(d, d * 4, dropout=0.0)
    enc = m.Encoder_Transformer(
        m.EncoderLayer_Transformer(d, copy.deepcopy(attn), copy.deepcopy(ff), 0.0), n
    ).eval()
    # randomize norms away from identity
    with torch.no_grad():
        for mod in enc.modules():
            if isinstance(mod, m.LayerNorm):
                mod.a_2.uniform_(0.5, 1.5)
                mod.b_2.uniform_(-0.2, 0.2)

    x = rng.standard_normal((2, 12, d)).astype(np.float32)
    mask = np.ones((2, 1, 12), np.float32)
    mask[1, :, 9:] = 0.0
    with torch.no_grad():
        want = to_numpy(enc(torch.from_numpy(x), torch.from_numpy(mask)))

    p = C.encoder_stack_from_annotated_torch(enc.state_dict(), "", n)
    got = T.encoder_stack(p, jnp.asarray(x), jnp.asarray(mask), h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_torch_native_encoder_parity(rng):
    """torch nn.TransformerEncoder (post-norm) — the GestSync tower config
    (reference models/gestsync.py:20-21), at reduced width."""
    d, h, n = 32, 4, 2
    layer = nn.TransformerEncoderLayer(d_model=d, nhead=h, batch_first=True, dropout=0.0)
    enc = nn.TransformerEncoder(layer, num_layers=n).eval()
    x = rng.standard_normal((3, 21, d)).astype(np.float32)
    with torch.no_grad():
        want = to_numpy(enc(torch.from_numpy(x)))
    p = C.torch_encoder_stack_from_torch(enc.state_dict(), "", n)
    got = T.torch_encoder_stack(p, jnp.asarray(x), None, h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
