"""From-scratch XLM-RoBERTa encoder in JAX (HF-weight compatible).

The reference consumes a frozen HuggingFace `XLMRobertaModel`
(reference models/jegal.py:13-14,116-129: tokenizer with offset mapping ->
`last_hidden_state` under no_grad). We re-implement the encoder natively so
the whole text branch is one XLA graph on TPU instead of a host-side torch
forward; `params_from_hf` converts an HF checkpoint's state_dict.

Architecture (BERT-style post-norm, xlm-roberta-base: 12 layers, d=768,
h=12, d_ff=3072, gelu-exact, LN eps from config):
  embeddings: word + learned positions (RoBERTa padding_idx offset) +
              token_type + LayerNorm
  layer:      self-attn -> dense -> +residual -> LN -> FFN -> +residual -> LN

Mask semantics replicate HF: extended mask (1-mask)*finfo.min ADDED to the
attention scores (not the reference's -1e9 fill — that applies only to the
JEGAL-side encoders).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from jegal_tpu.core.layers import linear, std_layer_norm
from jegal_tpu.convert.torch_import import linear_from_torch, layer_norm_from_torch, _get


PAD_TOKEN_ID = 1  # RoBERTa/XLM-R padding_idx


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 250002
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    layer_norm_eps: float = 1e-5


XLMR_BASE = RobertaConfig()


def create_position_ids(input_ids, pad_id: int = PAD_TOKEN_ID):
    """RoBERTa position ids: cumulative count of non-pad tokens + pad_id
    (HF create_position_ids_from_input_ids parity)."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def embeddings(params, input_ids, cfg: RobertaConfig):
    pos_ids = create_position_ids(input_ids)
    x = (
        params["word"][input_ids]
        + params["position"][pos_ids]
        + params["token_type"][0][None, None, :]
    )
    return std_layer_norm(params["ln"], x, eps=cfg.layer_norm_eps)


def _attention(params, x, ext_mask, cfg: RobertaConfig):
    b, s, d = x.shape
    h = cfg.num_heads
    dk = d // h

    def heads(p):
        return linear(p, x).reshape(b, s, h, dk).transpose(0, 2, 1, 3)

    q, k, v = heads(params["q"]), heads(params["k"]), heads(params["v"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(dk))
    if ext_mask is not None:
        scores = scores + ext_mask
    p_attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p_attn, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, d)
    return linear(params["attn_out"], ctx)


def encoder_layer(params, x, ext_mask, cfg: RobertaConfig):
    a = _attention(params, x, ext_mask, cfg)
    x = std_layer_norm(params["attn_ln"], x + a, eps=cfg.layer_norm_eps)
    f = linear(params["out"], jax.nn.gelu(linear(params["inter"], x), approximate=False))
    return std_layer_norm(params["out_ln"], x + f, eps=cfg.layer_norm_eps)


def stack_layers(params):
    """Stack the per-layer param list into one (L, ...) pytree so `forward`
    runs the encoder as a lax.scan: ~2x faster XLA compiles of the 12-layer
    stack (3.7 -> 2.1 s measured on v5e — serving warm-start) and no
    per-call restacking. Layer math is identical; do the stacking ONCE at
    load time (JegalEngine does).

    Also precomputes `fused_ops` — the single-kernel stack's (L, ...)
    operands (fused_layer._stacked_weights layout) — so the TPU fused path
    never concatenates weights inside the jit (an in-graph restack of the
    12-layer stack measured ~0.6 ms/call on v5e). Costs one extra copy of
    the encoder weights in HBM (~170 MB bf16 for xlm-roberta-base)."""
    from jegal_tpu.ops.pallas import fused_layer as FL

    layer_list = params["layers"]
    dt = layer_list[0]["q"]["kernel"].dtype
    fused_ops = FL._stacked_weights([_fused_layout(l) for l in layer_list],
                                    dt)
    return dict(params,
                layers=jax.tree.map(lambda *ls: jnp.stack(ls), *layer_list),
                fused_ops=fused_ops)


def _fused_layout(layer):
    """Adapt one encoder layer's params to the fused-kernel layout
    (ops/pallas/fused_layer expects {"attn": {q,k,v,o}, "ff": {w1,w2},
    "norm1", "norm2"})."""
    return {"attn": {"q": layer["q"], "k": layer["k"], "v": layer["v"],
                     "o": layer["attn_out"]},
            "ff": {"w1": layer["inter"], "w2": layer["out"]},
            "norm1": layer["attn_ln"], "norm2": layer["out_ln"]}


def forward(params, input_ids, attention_mask, cfg: RobertaConfig = XLMR_BASE,
            fused: bool = True):
    """input_ids, attention_mask: (B, S) -> last_hidden_state (B, S, d).

    params["layers"]: either the converter's list-of-layers (python loop)
    or the stacked (L, ...) pytree from `stack_layers` (lax.scan).

    On TPU, when the sequence length tiles (fused_layer.fused_stack_ok),
    the 12 layers run as fused Pallas sublayer kernels over the flattened
    (B*S, d) rows — the encoder is otherwise ~15 small ops per layer at
    S<=256 and is launch-overhead-bound. Backend chosen at lowering time;
    the XLA path below stays the oracle and the autodiff/fallback path
    (fused=False forces it — the kernels are inference-only)."""
    ext_mask = None
    if attention_mask is not None:
        ext_mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        ext_mask = ext_mask * jnp.finfo(jnp.float32).min
    x = embeddings(params["embeddings"], input_ids, cfg)
    layers = params["layers"]

    def xla_path(x):
        if isinstance(layers, (list, tuple)):
            for layer in layers:
                x = encoder_layer(layer, x, ext_mask, cfg)
            return x

        def body(x, layer):
            return encoder_layer(layer, x, ext_mask, cfg), None

        x, _ = jax.lax.scan(body, x, layers)
        return x

    from jegal_tpu.ops.pallas import fused_layer as FL

    b, s, d = x.shape
    if (fused and FL.enabled() and cfg.layer_norm_eps == 1e-5
            and FL.fused_stack_ok(s, d, cfg.num_heads)):
        # stack_layers precomputes fused_ops so nothing re-concatenates
        # weights inside the jit; list-layout params (converter output,
        # tests) stack in-graph — correct but ~0.6 ms/call slower
        flayers = params.get("fused_ops")
        if flayers is None:
            if isinstance(layers, (list, tuple)):
                flayers = [_fused_layout(l) for l in layers]
            else:
                flayers = [_fused_layout(jax.tree.map(lambda a: a[i],
                                                      layers))
                           for i in range(cfg.num_layers)]
        km = (None if attention_mask is None
              else attention_mask.reshape(-1).astype(jnp.float32))

        def fused_path(x):
            out = FL.fused_roberta_stack(flayers, x.reshape(b * s, d), s,
                                         cfg.num_heads, kmask=km)
            return out.reshape(b, s, d)

        return jax.lax.platform_dependent(x, tpu=fused_path,
                                          default=xla_path)

    return xla_path(x)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def params_from_hf(sd, cfg: RobertaConfig = XLMR_BASE, dtype=jnp.float32):
    """Convert an HF XLMRobertaModel/RobertaModel state_dict. Accepts keys
    with or without a leading 'roberta.' prefix; pooler is ignored."""
    if not any(k.startswith("embeddings.") for k in sd):
        sd = {k.split(".", 1)[1]: v for k, v in sd.items() if "." in k}
    emb = {
        "word": _get(sd, "embeddings.word_embeddings.weight", dtype),
        "position": _get(sd, "embeddings.position_embeddings.weight", dtype),
        "token_type": _get(sd, "embeddings.token_type_embeddings.weight", dtype),
        "ln": layer_norm_from_torch(sd, "embeddings.LayerNorm", dtype),
    }
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        layers.append({
            "q": linear_from_torch(sd, f"{p}.attention.self.query", dtype),
            "k": linear_from_torch(sd, f"{p}.attention.self.key", dtype),
            "v": linear_from_torch(sd, f"{p}.attention.self.value", dtype),
            "attn_out": linear_from_torch(sd, f"{p}.attention.output.dense", dtype),
            "attn_ln": layer_norm_from_torch(sd, f"{p}.attention.output.LayerNorm", dtype),
            "inter": linear_from_torch(sd, f"{p}.intermediate.dense", dtype),
            "out": linear_from_torch(sd, f"{p}.output.dense", dtype),
            "out_ln": layer_norm_from_torch(sd, f"{p}.output.LayerNorm", dtype),
        })
    return {"embeddings": emb, "layers": layers}
