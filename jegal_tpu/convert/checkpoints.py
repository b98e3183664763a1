"""Checkpoint IO.

Ingests the reference's torch `.pth` checkpoints (saved as
{"state_dict": ...} under nn.DataParallel prefixes — reference
inference_embs.py:92-119, README.md:52-59) and HF XLM-R checkpoints, and
provides a native flat-npz pytree format for fast load on TPU VMs (plus
Orbax for sharded/async checkpointing of training state, see
jegal_tpu/parallel/checkpoint.py).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Flat-npz pytree format
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}#/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def rebuild(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        if node and all(k.endswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][:-1]))
            return [rebuild(v) for _, v in items]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_npz(tree, path: str):
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_npz(path: str):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


# ---------------------------------------------------------------------------
# Model loaders (auto-detect format)
# ---------------------------------------------------------------------------

def _torch_state_dict(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def load_gestsync(path: str):
    """GestSync parameters from .pth (reference format) or .npz (native)."""
    from jegal_tpu.models.gestsync import params_from_torch

    if path.endswith(".npz"):
        return load_npz(path)
    return params_from_torch(_torch_state_dict(path))


def load_jegal(path: str):
    from jegal_tpu.models.jegal import params_from_torch

    if path.endswith(".npz"):
        return load_npz(path)
    return params_from_torch(_torch_state_dict(path))


def roberta_config_from_params(params, num_heads: int | None = None):
    """Infer a RobertaConfig from parameter shapes (num_heads is not
    recoverable from shapes; stored in native checkpoints, default 12)."""
    from jegal_tpu.models.roberta import RobertaConfig

    emb = params["embeddings"]
    hidden = int(emb["word"].shape[1])
    return RobertaConfig(
        vocab_size=int(emb["word"].shape[0]),
        hidden_size=hidden,
        num_layers=len(params["layers"]),
        num_heads=int(num_heads) if num_heads else 12,
        intermediate_size=int(params["layers"][0]["inter"]["kernel"].shape[1]),
        max_position_embeddings=int(emb["position"].shape[0]),
    )


def save_roberta_npz(params, path: str, num_heads: int = 12):
    tree = dict(params)
    tree["__meta__"] = {"num_heads": np.int32(num_heads)}
    save_npz(tree, path)


def load_roberta(path: str, cfg=None, num_heads: int | None = None):
    """XLM-R parameters from an HF checkpoint file (pytorch_model.bin /
    model.safetensors / directory) or native .npz.

    -> (params, RobertaConfig)."""
    from jegal_tpu.models.roberta import XLMR_BASE, params_from_hf

    if path.endswith(".npz"):
        tree = load_npz(path)
        meta = tree.pop("__meta__", {})
        heads = num_heads or int(meta.get("num_heads", 12))
        return tree, roberta_config_from_params(tree, heads)
    cfg = cfg or XLMR_BASE
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return params_from_hf(load_file(path), cfg), cfg
    return params_from_hf(_torch_state_dict(path), cfg), cfg
