"""Fused transformer-layer Pallas kernels: parity vs the core/transformer
oracles (interpret mode; on-chip full-size parity lives in the slow suite,
tests/test_fused_layer_chip.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.core import transformer as T
from jegal_tpu.core.layers import ref_layer_norm
from jegal_tpu.ops.pallas import fused_layer as F


def _cos(a, b):
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_block_rows():
    assert F.block_rows(21) == 336
    assert F.block_rows(128) == 256
    assert F.block_rows(512) == 512
    assert F.fused_stack_ok(21, 512, 8)
    assert F.fused_stack_ok(128, 768, 8)
    assert not F.fused_stack_ok(600, 512, 8)   # segment too long
    assert not F.fused_stack_ok(21, 520, 8)    # lanes not 128-aligned


def test_torch_stack_parity_windows(rng):
    """Post-norm stack over 21-token windows == torch_encoder_stack,
    including a ragged window count (pads to a partial block)."""
    stack = {"layers": [
        T.init_encoder_layer(jax.random.PRNGKey(i), 512, 2048)
        for i in range(2)
    ]}
    n = 19  # 19 * 21 = 399 rows -> pads to 672 (2 blocks)
    wins = jnp.asarray(rng.standard_normal((n, 21, 512)), jnp.float32)

    ref = T.torch_encoder_stack(stack, wins, None, 8)
    out = F.fused_torch_stack(stack, wins.reshape(n * 21, 512), 21, 8,
                              interpret=True).reshape(n, 21, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert _cos(out, ref) > 1 - 1e-6


def test_prenorm_stack_parity_masked(rng):
    """Pre-norm stack (ref LN) over (B, T) rows with a key-validity mask ==
    encoder_stack minus its final norm."""
    d, heads, b, t = 512, 8, 3, 64
    stack = T.init_encoder_stack(jax.random.PRNGKey(7), 2, d, 2048)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lens = np.array([64, 17, 1])
    kmask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    kmask_j = jnp.asarray(kmask)

    ref = x
    for layer in stack["layers"]:
        ref = T.encoder_layer(layer, ref, kmask_j[:, None, :], heads)

    out = F.fused_prenorm_stack(
        stack, x.reshape(b * t, d), t, heads,
        kmask=kmask_j.reshape(-1), interpret=True).reshape(b, t, d)
    # only valid rows are contractually meaningful (invalid queries attend
    # over valid keys in both paths, but downstream consumers mask them)
    m = np.asarray(kmask, bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               rtol=2e-4, atol=2e-4)
    # the full stack (with final norm) through the same fused rows
    full_ref = T.encoder_stack(stack, x, kmask_j[:, None, :], heads)
    full_out = ref_layer_norm(stack["norm"], out)
    np.testing.assert_allclose(np.asarray(full_out)[m],
                               np.asarray(full_ref)[m],
                               rtol=2e-4, atol=2e-4)


def test_prenorm_d768_ffn_streaming(rng):
    """d=768 / d_ff=3072 streams the FFN weights over the inner grid axis
    (3 blocks) — the text-encoder geometry."""
    d, heads, b, t = 768, 8, 2, 32
    stack = T.init_encoder_stack(jax.random.PRNGKey(3), 1, d, 3072)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    ref = x
    for layer in stack["layers"]:
        ref = T.encoder_layer(layer, ref, None, heads)
    out = F.fused_prenorm_stack(stack, x.reshape(b * t, d), t, heads,
                                interpret=True).reshape(b, t, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_head_fused_wiring(rng):
    """gestsync._window_head_flat with the fused path forced (interpret)
    equals the XLA head."""
    from jegal_tpu.models import gestsync as G

    params = G.init_params(jax.random.PRNGKey(0))
    wins = jnp.asarray(rng.standard_normal((9, 21, 512)), jnp.float32)
    ref = G._window_head_flat(params, wins, None)
    out = G._window_head_fused(params, wins, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_roberta_stack_parity(rng):
    """fused_roberta_stack (post-norm, std LN, exact GELU) == the XLM-R
    XLA oracle (models/roberta.encoder_layer), with a padded batch: the
    kernel's -1e9 score fill must match HF's additive finfo.min mask."""
    from jegal_tpu.models import roberta as R

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=2,
                          num_heads=12, intermediate_size=3072,
                          max_position_embeddings=64)
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(11)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=64, pad_token_id=1)).eval()
    params = R.params_from_hf(hf.state_dict(), cfg)

    b, s, d = 2, 32, 768
    x = jnp.asarray(rng.standard_normal((b, s, d)) * 0.1, jnp.float32)
    mask = jnp.asarray([[1.0] * s, [1.0] * 20 + [0.0] * (s - 20)],
                       jnp.float32)
    ext = (1.0 - mask)[:, None, None, :] * jnp.finfo(jnp.float32).min

    ref = x
    for layer in params["layers"]:
        ref = R.encoder_layer(layer, ref, ext, cfg)

    flayers = [R._fused_layout(l) for l in params["layers"]]
    out = F.fused_roberta_stack(
        flayers, x.reshape(b * s, d), s, cfg.num_heads,
        kmask=mask.reshape(-1), interpret=True).reshape(b, s, d)
    # compare only valid rows (masked-out key rows produce garbage queries
    # in both paths under HF semantics, but HF still computes them; fused
    # fills their keys; valid-query rows must agree)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(out[1, :20]),
                               np.asarray(ref[1, :20]),
                               rtol=3e-4, atol=3e-4)


def test_roberta_forward_fused_wiring(rng):
    """models/roberta.forward takes the fused path (interpret-forced via
    monkeypatched platform_dependent is overkill — instead call the fused
    branch pieces directly) and equals the XLA path end-to-end."""
    from jegal_tpu.models import roberta as R

    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=12, intermediate_size=3072,
                          max_position_embeddings=64)
    torch.manual_seed(12)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=64, pad_token_id=1)).eval()
    params = R.params_from_hf(hf.state_dict(), cfg)

    ids = jnp.asarray(rng.integers(2, 64, (2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), jnp.float32)

    ref = R.forward(params, ids, mask, cfg, fused=False)
    x = R.embeddings(params["embeddings"], ids, cfg)
    b, s, d = x.shape
    flayers = [R._fused_layout(l) for l in params["layers"]]
    out = F.fused_roberta_stack(flayers, x.reshape(b * s, d), s,
                                cfg.num_heads,
                                kmask=mask.reshape(-1).astype(jnp.float32),
                                interpret=True).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)

    # HF torch oracle: the whole jax path (embeddings + fused stack) must
    # match transformers' own last_hidden_state
    with torch.no_grad():
        th = hf(input_ids=torch.tensor(np.asarray(ids)),
                attention_mask=torch.ones((2, 32), dtype=torch.long)
                ).last_hidden_state.numpy()
    cos = (np.asarray(out).reshape(-1) @ th.reshape(-1)) / (
        np.linalg.norm(out) * np.linalg.norm(th))
    assert cos > 1 - 1e-5, cos
