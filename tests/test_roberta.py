"""XLM-RoBERTa JAX encoder parity vs HuggingFace torch (tiny random config —
the real xlm-roberta-base weights are converted with the same code path)."""

import numpy as np
import torch

import jax.numpy as jnp

from jegal_tpu.models import roberta as R


def _tiny():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=120,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=40,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg).eval()
    cfg = R.RobertaConfig(
        vocab_size=120, hidden_size=48, num_layers=3, num_heads=4,
        intermediate_size=96, max_position_embeddings=40,
    )
    return model, cfg


def test_position_ids_parity():
    from transformers.models.roberta.modeling_roberta import (
        create_position_ids_from_input_ids,
    )

    ids = torch.tensor([[0, 5, 9, 2, 1, 1], [0, 7, 2, 1, 1, 1]])
    want = create_position_ids_from_input_ids(ids, padding_idx=1).numpy()
    got = np.asarray(R.create_position_ids(jnp.asarray(ids.numpy())))
    np.testing.assert_array_equal(got, want)


def test_encoder_parity(rng):
    model, cfg = _tiny()
    ids = np.array(
        [[0, 5, 9, 17, 33, 2, 1, 1], [0, 7, 99, 2, 1, 1, 1, 1]], dtype=np.int64
    )
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    params = R.params_from_hf(model.state_dict(), cfg)
    got = np.asarray(R.forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # padded positions must not affect valid ones: change pad token content
    ids2 = ids.copy()
    ids2[0, 6:] = 77  # garbage in padded slots, mask unchanged... but mask
    # gates attention only; embeddings of pad slots differ, valid outputs
    # must be identical
    got2 = np.asarray(R.forward(params, jnp.asarray(ids2), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(got2[0, :6], got[0, :6], rtol=1e-5, atol=1e-5)


def test_stacked_scan_layout_matches_loop(rng):
    """R.stack_layers + the lax.scan path must equal the list-of-layers
    loop (the engine stacks at load time for ~2x faster compiles)."""
    model, cfg = _tiny()
    params = R.params_from_hf(model.state_dict(), cfg)
    ids = np.array([[0, 5, 9, 17, 2, 1, 1, 1]], dtype=np.int64)
    mask = (ids != 1).astype(np.int64)
    loop = np.asarray(R.forward(params, jnp.asarray(ids), jnp.asarray(mask),
                                cfg))
    stacked = R.stack_layers(params)
    assert not isinstance(stacked["layers"], (list, tuple))
    scan = np.asarray(R.forward(stacked, jnp.asarray(ids), jnp.asarray(mask),
                                cfg))
    np.testing.assert_allclose(scan, loop, rtol=1e-6, atol=1e-6)
