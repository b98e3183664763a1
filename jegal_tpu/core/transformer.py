"""Transformer encoder stacks.

Two variants are needed for parity with the reference checkpoints:

  * `encoder_stack` — the "annotated transformer" style used by JEGAL
    (reference models/modules.py:11-131): PRE-norm sublayers with the
    reference's nonstandard LayerNorm, plus a final LayerNorm.

  * `torch_encoder_stack` — torch `nn.TransformerEncoderLayer`
    (norm_first=False, relu, d_ff=2048, LN eps 1e-5) used by the GestSync
    visual tower (reference models/gestsync.py:20-21): POST-norm with
    standard LayerNorm.

Attention mask semantics follow the reference (models/modules.py:61-75):
positions where mask == 0 are filled with -1e9 in float32 before softmax.

Parameter pytrees:
  mha:   {"q": linear, "k": linear, "v": linear, "o": linear}
  ffn:   {"w1": linear, "w2": linear}
  layer (pre-norm):  {"attn": mha, "ff": ffn, "norm1": ln, "norm2": ln}
  stack (pre-norm):  {"layers": [layer...], "norm": ln}
  layer (torch):     {"attn": mha, "ff": ffn, "norm1": ln, "norm2": ln}
  stack (torch):     {"layers": [layer...]}
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from jegal_tpu.core.layers import (
    linear,
    ref_layer_norm,
    std_layer_norm,
    init_linear,
    init_layer_norm,
)


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------

def sinusoidal_position_encoding(max_len: int, d_model: int, dtype=jnp.float32):
    """Classic sin/cos positional table, shape (max_len, d_model).

    Matches reference models/modules.py:134-148 / models/gestsync.py:171-189.
    """
    # computed in float32 end-to-end for bit parity with the reference's
    # torch-float32 PE tables
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * np.float32(-(math.log(10000.0) / d_model))
    ).astype(np.float32)
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def _split_heads(x, h: int):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)  # (B,h,T,dk)


def _merge_heads(x):
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def masked_attention_weights(scores, mask):
    """Apply reference mask-fill semantics and softmax in float32.

    scores: (B,h,Tq,Tk); mask broadcastable to it; 0 entries masked out.
    """
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask == 0, jnp.float32(-1e9), scores)
    return jax.nn.softmax(scores, axis=-1)


# attention implementation switch: "dense" (reference-exact einsum),
# "flash" (Pallas blockwise kernel), or "auto" (flash on TPU when the
# shapes qualify — see _flash_ok)
_ATTENTION_IMPL = "auto"


def set_attention_impl(impl: str):
    global _ATTENTION_IMPL
    assert impl in ("auto", "dense", "flash"), impl
    _ATTENTION_IMPL = impl


def _key_mask(mask, b: int, t: int):
    """Reduce a broadcastable mask to (B, T) key validity, else None."""
    if mask is None:
        return None
    if mask.size == b * t:
        return mask.reshape(b, t)
    return False  # a genuinely 2-D (Tq, Tk) mask — flash path unsupported


def _flash_ok(t: int, d_k: int) -> bool:
    """Auto-dispatch gate, sized to the production shape buckets.

    Kernel constraints: T must tile into (<=128)-row blocks (one block when
    T <= 128, else T % 128 == 0 — covers every power-of-two bucket in
    jegal_tpu.data.bucketing) and d_k % 32 == 0 for lane tiling. Both JEGAL
    encoder families qualify: gesture (512/8 -> d_k 64) and text
    (768/8 -> d_k 96, verified on-chip). The 21-token GestSync window
    transformer does NOT (21 % 8 != 0) and intentionally stays dense — at
    that size attention is dispatch-bound and the dense einsum fuses into
    the surrounding graph. The XLM-R encoder never reaches this function:
    it carries its own HF-parity additive-mask attention
    (models/roberta.py:66-82). Measured on-chip (v5e): flash <= dense at
    every bucket from T=16 through T=512.

    When this passes under 'auto', the TPU-vs-other choice is deferred to
    LOWERING time via jax.lax.platform_dependent — the default backend says
    nothing about where a jit actually runs (a TPU-attached process can
    still run CPU-placed graphs, e.g. bench.py's CPU baseline).
    """
    if _ATTENTION_IMPL == "dense":
        return False
    if _ATTENTION_IMPL == "flash":
        return True
    return (
        t % 8 == 0
        and (t <= 128 or t % 128 == 0)
        and d_k % 32 == 0
    )


def multi_head_attention(params, q_in, k_in, v_in, mask, num_heads: int):
    """MHA matching reference models/modules.py:88-120.

    mask: None or broadcastable to (B, 1, Tq, Tk) after an internal
    head-axis unsqueeze — pass (B, 1, Tk), (B, Tq, Tk) or (B, 1, 1, Tk).

    Dispatches to the Pallas blockwise kernel when the global attention
    impl allows it and the mask is a pure key-validity mask.
    """
    dtype = q_in.dtype
    q = _split_heads(linear(params["q"], q_in), num_heads)
    k = _split_heads(linear(params["k"], k_in), num_heads)
    v = _split_heads(linear(params["v"], v_in), num_heads)
    b, _, t, d_k = q.shape

    def dense(q, k, v):
        m = mask
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d_k))
        if m is not None:
            while m.ndim < 4:
                m = m[:, None]
        p = masked_attention_weights(scores, m).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                         preferred_element_type=jnp.float32)
        return out.astype(dtype)

    if q_in is k_in and t == k.shape[2] and _flash_ok(t, d_k):
        kmask = _key_mask(mask, b, t)
        if kmask is not False:
            from jegal_tpu.ops.pallas.flash_attention import flash_attention_diff

            def flash(q, k, v):
                return flash_attention_diff(q, k, v, kmask, 128, 128, False)

            if _ATTENTION_IMPL == "flash":  # forced (tests/CPU interpret)
                out = flash_attention_diff(
                    q, k, v, kmask, 128, 128,
                    jax.default_backend() != "tpu")
            else:
                # per-backend choice at LOWERING time: the kernel only on
                # TPU, the reference einsum everywhere else
                out = jax.lax.platform_dependent(
                    q, k, v, tpu=flash, default=dense)
            return linear(params["o"], _merge_heads(out))

    return linear(params["o"], _merge_heads(dense(q, k, v)))


def _ffn(params, x):
    return linear(params["w2"], jax.nn.relu(linear(params["w1"], x)))


# ---------------------------------------------------------------------------
# Pre-norm stack (JEGAL / annotated-transformer parity)
# ---------------------------------------------------------------------------

def encoder_layer(params, x, mask, num_heads: int):
    h = ref_layer_norm(params["norm1"], x)
    x = x + multi_head_attention(params["attn"], h, h, h, mask, num_heads)
    h = ref_layer_norm(params["norm2"], x)
    return x + _ffn(params["ff"], h)


def encoder_stack(params, x, mask, num_heads: int, fused: bool = True):
    """N pre-norm layers + final reference LayerNorm.

    On TPU, when the mask is a pure key-validity mask and the sequence
    length tiles (fused_layer.fused_stack_ok), the layers run as fused
    Pallas sublayer kernels over the flattened (B*T, d) rows — backend
    chosen at lowering time like the flash dispatch. The python-loop path
    below is the oracle and the fallback everywhere else.

    fused=False forces the XLA loop — required under reverse-mode autodiff
    (the fused kernels are inference-only, no VJP): the trainer's loss
    passes it (training/trainer.py)."""
    from jegal_tpu.ops.pallas import fused_layer as FL

    b, t, d = x.shape

    def xla_loop(h):
        for layer in params["layers"]:
            h = encoder_layer(layer, h, mask, num_heads)
        return h

    if fused and FL.enabled() and FL.fused_stack_ok(t, d, num_heads):
        kmask = _key_mask(mask, b, t)
        if kmask is not False:
            km = None if kmask is None else kmask.reshape(-1)

            def fused(h):
                out = FL.fused_prenorm_stack(
                    params, h.reshape(b * t, d), t, num_heads, kmask=km)
                return out.reshape(b, t, d)

            x = jax.lax.platform_dependent(x, tpu=fused, default=xla_loop)
            return ref_layer_norm(params["norm"], x)

    return ref_layer_norm(params["norm"], xla_loop(x))


# ---------------------------------------------------------------------------
# Post-norm stack (torch nn.TransformerEncoder parity, for GestSync)
# ---------------------------------------------------------------------------

def torch_encoder_layer(params, x, mask, num_heads: int):
    x = std_layer_norm(
        params["norm1"],
        x + multi_head_attention(params["attn"], x, x, x, mask, num_heads),
    )
    return std_layer_norm(params["norm2"], x + _ffn(params["ff"], x))


def torch_encoder_stack(params, x, mask, num_heads: int):
    for layer in params["layers"]:
        x = torch_encoder_layer(layer, x, mask, num_heads)
    return x


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_mha(key, d_model: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], d_model, d_model, dtype),
        "k": init_linear(ks[1], d_model, d_model, dtype),
        "v": init_linear(ks[2], d_model, d_model, dtype),
        "o": init_linear(ks[3], d_model, d_model, dtype),
    }


def init_ffn(key, d_model: int, d_ff: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w1": init_linear(k1, d_model, d_ff, dtype),
        "w2": init_linear(k2, d_ff, d_model, dtype),
    }


def init_encoder_layer(key, d_model: int, d_ff: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "attn": init_mha(k1, d_model, dtype),
        "ff": init_ffn(k2, d_model, d_ff, dtype),
        "norm1": init_layer_norm(d_model, dtype),
        "norm2": init_layer_norm(d_model, dtype),
    }


def init_encoder_stack(key, num_layers: int, d_model: int, d_ff: int,
                       final_norm: bool = True, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers)
    stack = {
        "layers": [init_encoder_layer(k, d_model, d_ff, dtype) for k in keys],
    }
    if final_norm:
        stack["norm"] = init_layer_norm(d_model, dtype)
    return stack
