"""Pallas flash attention vs the dense reference path (interpret mode on
the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.core import transformer as T
from jegal_tpu.core.transformer import init_mha
from jegal_tpu.ops.pallas.flash_attention import flash_attention


def _dense(q, k, v, mask):
    d_k = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s / jnp.sqrt(jnp.float32(d_k))
    if mask is not None:
        s = jnp.where(mask[:, None, None, :] == 0, -1e9, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("t,block", [(64, 32), (128, 64)])
def test_flash_matches_dense(rng, t, block):
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[1, t // 2:] = 0
    mask = jnp.asarray(mask)

    want = np.asarray(_dense(q, k, v, mask))
    got = np.asarray(flash_attention(q, k, v, mask, block_q=block,
                                     block_k=block, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # no-mask path
    want2 = np.asarray(_dense(q, k, v, None))
    got2 = np.asarray(flash_attention(q, k, v, None, block_q=block,
                                      block_k=block, interpret=True))
    np.testing.assert_allclose(got2, want2, rtol=2e-4, atol=2e-4)


def test_mha_flash_dispatch_matches_dense(rng):
    """Forcing the flash impl through multi_head_attention must match the
    dense impl bit-for-tolerance on the same params."""
    d, h, t, b = 64, 4, 64, 2
    params = init_mha(jax.random.PRNGKey(0), d)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = np.ones((b, 1, t), np.float32)
    mask[1, :, 50:] = 0
    mask = jnp.asarray(mask)

    T.set_attention_impl("dense")
    want = np.asarray(T.multi_head_attention(params, x, x, x, mask, h))
    try:
        T.set_attention_impl("flash")
        got = np.asarray(T.multi_head_attention(params, x, x, x, mask, h))
    finally:
        T.set_attention_impl("auto")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_vjp_matches_dense(rng):
    """custom_vjp backward (dense fp32) must match autodiff through the
    dense forward."""
    from jegal_tpu.ops.pallas.flash_attention import flash_attention_diff

    b, h, t, d = 1, 2, 64, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((b, 50), np.float32), np.zeros((b, 14), np.float32)], axis=1))

    def loss_flash(q, k, v):
        out = flash_attention_diff(q, k, v, mask, 32, 32, True)
        return jnp.sum(out ** 2)

    def loss_dense(q, k, v):
        out = _dense(q, k, v, mask)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)
