"""Blockwise (flash-style) multi-head attention as a Pallas TPU kernel.

The reference computes dense O(T^2) attention with full score
materialization (models/modules.py:61-75). This kernel streams over key
blocks with an online softmax so scores never hit HBM: VMEM-resident
(block_q x block_k) tiles, fp32 running max/denominator, MXU matmuls.
T <= 500 by construction in the reference (PE cap), but the blockwise
structure keeps minutes-long videos in memory (SURVEY.md §5.7) and removes
the HBM round-trip for the (h, T, T) score tensor.

Mask semantics are reference-parity: key positions with mask == 0 are
filled with -1e9 before the (fp32) softmax — verified against the dense
path in tests.

Layout: q, k, v are (B, H, T, D); mask is (B, T) key validity or None.
Requires T % block == 0 (callers pad to shape buckets that satisfy this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_FILL = -1e9  # reference fill value (models/modules.py:70)


def _make_kernel(block_k: int, scale: float, has_mask: bool):
    def kernel(*refs):
        if has_mask:
            q_ref, k_ref, v_ref, m_full, o_ref = refs
            # the mask ref is the FULL (B, T) array (a (1, T) block would
            # violate the sublane tiling rule when B > 1); select this
            # program's row
            bi = pl.program_id(0)
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            m_full = None

        block_q, d = q_ref.shape[2], q_ref.shape[3]
        t = k_ref.shape[2]
        num_k = t // block_k

        q = q_ref[0, 0].astype(jnp.float32) * scale

        def body(j, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
            v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (block_q, block_k)
            if m_full is not None:
                mk = m_full[bi, 0, pl.ds(j * block_k, block_k)]
                s = jnp.where(mk[None, :] == 0.0, jnp.float32(NEG_FILL), s)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc = jnp.zeros((block_q, d), jnp.float32)
        m0 = jnp.full((block_q, 1), NEG_FILL * 2.0, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m0, l0))
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_diff(q, k, v, mask, block_q: int = 128,
                         block_k: int = 128, interpret: bool = False):
    """Differentiable wrapper: flash kernel forward, dense fp32 backward
    (the standard softmax-attention VJP; O(T^2) scratch is fine at the
    training sequence lengths, T <= 512 by the reference's PE cap)."""
    return flash_attention(q, k, v, mask, block_q, block_k, interpret)


def _flash_fwd(q, k, v, mask, block_q, block_k, interpret):
    out = flash_attention(q, k, v, mask, block_q, block_k, interpret)
    return out, (q, k, v, mask)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, mask = res
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :] == 0, jnp.float32(NEG_FILL), s)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dmask


flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, mask=None, block_q: int = 128,
                    block_k: int = 128, interpret: bool = False):
    """q, k, v: (B, H, T, D) -> (B, H, T, D). mask: (B, T) key validity.

    Scores are scaled by 1/sqrt(D) inside the kernel (reference
    models/modules.py:64-65).
    """
    b, h, t, d = q.shape
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0, (t, block_q, block_k)
    scale = 1.0 / (d ** 0.5)

    grid = (b, h, t // block_q)
    qspec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    kvspec = pl.BlockSpec((1, 1, t, d), lambda bi, hi, qi: (bi, hi, 0, 0))
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if mask is not None:
        # (B, 1, T): batch stays an UNTILED leading dim so the kernel's
        # dynamic program-id index is legal; (1, T) tiles satisfy the
        # sublane rule for any B
        in_specs.append(pl.BlockSpec((b, 1, t), lambda bi, hi, qi: (0, 0, 0)))
        args.append(mask.astype(jnp.float32).reshape(b, 1, t))

    return pl.pallas_call(
        _make_kernel(block_k, scale, mask is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)
