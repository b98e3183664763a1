"""Torch state_dict -> jegal_tpu parameter-pytree converters.

All converters take a flat mapping `sd` of name -> array-like (torch tensors
work — np.asarray handles them) plus a `prefix`, and emit pytrees in our
layouts (see jegal_tpu/core/layers.py):

  torch Linear   weight (out, in)            -> kernel (in, out)
  torch Conv2d   weight (O, I, kh, kw)       -> kernel HWIO
  torch Conv3d   weight (O, I, kd, kh, kw)   -> kernel DHWIO
  torch LN/BN    weight/bias (+ running_*)   -> scale/bias (+ mean/var)

Two MHA flavors exist in the reference:
  * "annotated" MHA — four separate Linears named linears.{0..3}
    (reference models/modules.py:88-120)
  * torch-native nn.MultiheadAttention — fused in_proj_weight/bias +
    out_proj (used by GestSync's nn.TransformerEncoder,
    reference models/gestsync.py:20-21)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _j(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _get(sd, name, dtype=jnp.float32):
    arr = sd[name]
    return jnp.asarray(np.asarray(arr), dtype=dtype)


def linear_from_torch(sd, prefix: str, dtype=jnp.float32):
    p = {"kernel": _get(sd, _j(prefix, "weight"), dtype).T}
    if _j(prefix, "bias") in sd:
        p["bias"] = _get(sd, _j(prefix, "bias"), dtype)
    return p


def layer_norm_from_torch(sd, prefix: str, dtype=jnp.float32):
    """Handles both the reference's custom LayerNorm (a_2/b_2) and torch
    nn.LayerNorm (weight/bias)."""
    if _j(prefix, "a_2") in sd:
        return {"scale": _get(sd, _j(prefix, "a_2"), dtype),
                "bias": _get(sd, _j(prefix, "b_2"), dtype)}
    return {"scale": _get(sd, _j(prefix, "weight"), dtype),
            "bias": _get(sd, _j(prefix, "bias"), dtype)}


def batch_norm_from_torch(sd, prefix: str, dtype=jnp.float32):
    return {
        "scale": _get(sd, _j(prefix, "weight"), dtype),
        "bias": _get(sd, _j(prefix, "bias"), dtype),
        "mean": _get(sd, _j(prefix, "running_mean"), dtype),
        "var": _get(sd, _j(prefix, "running_var"), dtype),
    }


def conv2d_from_torch(sd, prefix: str, dtype=jnp.float32):
    w = _get(sd, _j(prefix, "weight"), dtype)  # (O, I, kh, kw)
    p = {"kernel": jnp.transpose(w, (2, 3, 1, 0))}  # HWIO
    if _j(prefix, "bias") in sd:
        p["bias"] = _get(sd, _j(prefix, "bias"), dtype)
    return p


def conv3d_from_torch(sd, prefix: str, dtype=jnp.float32):
    w = _get(sd, _j(prefix, "weight"), dtype)  # (O, I, kd, kh, kw)
    p = {"kernel": jnp.transpose(w, (2, 3, 4, 1, 0))}  # DHWIO
    if _j(prefix, "bias") in sd:
        p["bias"] = _get(sd, _j(prefix, "bias"), dtype)
    return p


def mha_from_annotated_torch(sd, prefix: str, dtype=jnp.float32):
    """reference MultiHeadedAttention_Transformer: linears.{0,1,2,3}=q,k,v,o."""
    return {
        "q": linear_from_torch(sd, _j(prefix, "linears.0"), dtype),
        "k": linear_from_torch(sd, _j(prefix, "linears.1"), dtype),
        "v": linear_from_torch(sd, _j(prefix, "linears.2"), dtype),
        "o": linear_from_torch(sd, _j(prefix, "linears.3"), dtype),
    }


def mha_from_torch_native(sd, prefix: str, dtype=jnp.float32):
    """torch nn.MultiheadAttention: split fused in_proj into q/k/v."""
    w = _get(sd, _j(prefix, "in_proj_weight"), dtype)  # (3d, d)
    b = _get(sd, _j(prefix, "in_proj_bias"), dtype)  # (3d,)
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q", "k", "v")):
        out[name] = {"kernel": w[i * d : (i + 1) * d].T,
                     "bias": b[i * d : (i + 1) * d]}
    out["o"] = linear_from_torch(sd, _j(prefix, "out_proj"), dtype)
    return out


def _ffn_from_torch(sd, prefix: str, w1: str, w2: str, dtype=jnp.float32):
    return {
        "w1": linear_from_torch(sd, f"{prefix}.{w1}", dtype),
        "w2": linear_from_torch(sd, f"{prefix}.{w2}", dtype),
    }


def encoder_stack_from_annotated_torch(sd, prefix: str, num_layers: int,
                                       dtype=jnp.float32):
    """reference Encoder_Transformer (models/modules.py:11-22):
    layers.{i}.self_attn / .feed_forward / .sublayer.{0,1}.norm, + final .norm."""
    layers = []
    for i in range(num_layers):
        lp = _j(prefix, f"layers.{i}")
        layers.append({
            "attn": mha_from_annotated_torch(sd, lp + ".self_attn", dtype),
            "ff": _ffn_from_torch(sd, lp + ".feed_forward", "w_1", "w_2", dtype),
            "norm1": layer_norm_from_torch(sd, lp + ".sublayer.0.norm", dtype),
            "norm2": layer_norm_from_torch(sd, lp + ".sublayer.1.norm", dtype),
        })
    return {"layers": layers,
            "norm": layer_norm_from_torch(sd, _j(prefix, "norm"), dtype)}


def torch_encoder_stack_from_torch(sd, prefix: str, num_layers: int,
                                   dtype=jnp.float32):
    """torch nn.TransformerEncoder: layers.{i}.self_attn / linear1/linear2 /
    norm1/norm2 (post-norm)."""
    layers = []
    for i in range(num_layers):
        lp = _j(prefix, f"layers.{i}")
        layers.append({
            "attn": mha_from_torch_native(sd, lp + ".self_attn", dtype),
            "ff": _ffn_from_torch(sd, lp, "linear1", "linear2", dtype),
            "norm1": layer_norm_from_torch(sd, lp + ".norm1", dtype),
            "norm2": layer_norm_from_torch(sd, lp + ".norm2", dtype),
        })
    return {"layers": layers}


def strip_module_prefix(sd):
    """Strip DataParallel 'module.' prefixes (the reference checkpoints were
    saved under nn.DataParallel — reference inference_embs.py:110-114)."""
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in sd.items()}
