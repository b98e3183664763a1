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
