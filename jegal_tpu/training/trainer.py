"""Contrastive training for JEGAL (TPU-native, working).

The reference ships a broken, dead training path (models/jegal.py:274-328
references undefined names; dataset.py:27-72 uses variables before
assignment — SURVEY.md §2.9 defects 1-2; training code was never released,
README.md:163-165). This module provides a WORKING training loop with the
same structure the reference's loss implies: symmetric InfoNCE between
video-level gesture embeddings and word-fused content embeddings at the
eval temperature 0.07 (the temperature all three eval harnesses assume),
with the reference's random content-modality dropout (jegal.py:279-292)
reproduced as branchless 0/1 gates so the graph stays static.

Sharding: batch over the 'data' mesh axis, attention heads / FFN hidden
over 'model' (Megatron layout — see jegal_tpu/parallel/mesh.py). Gradients
are averaged across 'data' by XLA automatically (GSPMD); the XLM-R backbone
and GestSync tower stay frozen like the reference.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R
from jegal_tpu.ops.pooling import pool_words

TEMPERATURE = 0.07


class TrainState(NamedTuple):
    params: Any          # trainable JEGAL params
    opt_state: Any
    step: jnp.ndarray


def masked_mean(x, mask, eps: float = 1e-6):
    """x: (B, N, D); mask: (B, N) -> (B, D)."""
    w = mask[..., None]
    return (x * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), eps)


def video_level_embeddings(params, roberta_params, batch, roberta_cfg,
                           drop_gates=(1.0, 1.0)):
    """Forward the three branches and pool to one embedding per video.

    batch keys: visual_feats (B,T,1024), visual_mask (B,T), input_ids (B,S),
    text_mask (B,S), text_pool (B,W,S), audio_mel (B,Tm,80),
    audio_pool (B,W,Tm/4), word_mask (B,W).
    drop_gates: (audio_gate, text_gate) 0/1 scalars for modality dropout.
    """
    # fused=False: this forward sits under jax.grad — the fused Pallas
    # encoder sublayers are inference-only (no VJP)
    g = J.forward_gestures(params, batch["visual_feats"],
                           batch["visual_mask"], fused=False)
    gesture_vid = masked_mean(g, batch["visual_mask"])

    hidden = R.forward(roberta_params, batch["input_ids"], batch["text_mask"],
                       roberta_cfg, fused=False)
    hidden = jax.lax.stop_gradient(hidden)  # frozen backbone
    sub = J.forward_text(params, hidden, batch["text_mask"], fused=False)
    text_words = pool_words(batch["text_pool"], sub) * drop_gates[1]

    tokens = J.forward_audio(params, batch["audio_mel"],
                             batch.get("audio_valid"))
    audio_words = pool_words(batch["audio_pool"], tokens) * drop_gates[0]

    content = J.fuse_content(params, audio_words, text_words, align=False)
    content_vid = masked_mean(content, batch["word_mask"])
    return gesture_vid, content_vid


def info_nce(gesture, content, temp: float = TEMPERATURE):
    """Symmetric batch contrastive loss on L2-normalized embeddings —
    the training counterpart of the retrieval eval's cosine ranking."""
    g = gesture / jnp.maximum(jnp.linalg.norm(gesture, axis=-1, keepdims=True), 1e-8)
    c = content / jnp.maximum(jnp.linalg.norm(content, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("id,jd->ij", g, c, preferred_element_type=jnp.float32) / temp
    labels = jnp.arange(sim.shape[0])
    loss_g2c = optax.softmax_cross_entropy_with_integer_labels(sim, labels)
    loss_c2g = optax.softmax_cross_entropy_with_integer_labels(sim.T, labels)
    return 0.5 * (loss_g2c.mean() + loss_c2g.mean())


def modality_drop_gates(key):
    """Reference jegal.py:279-292: with p=0.5 keep both; else drop audio or
    text with p=0.25 each. Branchless: returns (audio_gate, text_gate)."""
    k1, k2 = jax.random.split(key)
    keep_both = jax.random.uniform(k1) <= 0.5
    drop_audio = jax.random.uniform(k2) > 0.5
    audio_gate = jnp.where(keep_both, 1.0, jnp.where(drop_audio, 0.0, 1.0))
    text_gate = jnp.where(keep_both, 1.0, jnp.where(drop_audio, 1.0, 0.0))
    return audio_gate, text_gate


def loss_fn(params, roberta_params, batch, key, roberta_cfg,
            remat: bool = False):
    gates = modality_drop_gates(key)
    fwd = video_level_embeddings
    if remat:
        # trade FLOPs for memory on long-T corpora: the branch forwards
        # recompute in the backward pass instead of keeping activations
        fwd = jax.checkpoint(video_level_embeddings,
                             static_argnums=(3,))
    g, c = fwd(params, roberta_params, batch, roberta_cfg, gates)
    return info_nce(g, c)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   warmup_steps: int = 0, total_steps: int | None = None,
                   accum_steps: int = 1):
    """AdamW, optionally with linear-warmup + cosine-decay (when
    total_steps is given) and gradient accumulation over accum_steps
    micro-batches (optax.MultiSteps — note the contrastive loss sees only
    in-micro-batch negatives, the standard accumulation trade-off).

    warmup_steps/total_steps are in LOOP steps (micro-batches). The inner
    schedule only advances on APPLIED updates — once per accum_steps — so
    the counts are converted here; without the conversion a
    --cosine_decay --accum_steps 4 run would end at ~0.85*peak LR instead
    of 0."""
    k = max(accum_steps, 1)
    # ceil: warmup_steps < accum_steps must still produce >= 1 schedule
    # warmup step, not silently start at full peak LR
    sched_warmup = -(-warmup_steps // k) if warmup_steps > 0 else 0
    if total_steps is not None:
        sched_total = max(total_steps // k, sched_warmup + 1)
        if sched_warmup > 0:
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=sched_warmup,
                decay_steps=sched_total)
        else:
            # no warmup requested: start AT peak (a forced 1-step warmup
            # from 0 would silently zero the first applied update)
            schedule = optax.cosine_decay_schedule(
                init_value=lr, decay_steps=sched_total)
    elif sched_warmup > 0:
        schedule = optax.linear_schedule(0.0, lr, sched_warmup)
    else:
        schedule = lr
    opt = optax.adamw(schedule, weight_decay=weight_decay)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def train_step(state: TrainState, batch, key, *, roberta_params, roberta_cfg,
               optimizer, remat: bool = False) -> tuple[TrainState, jnp.ndarray]:
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, roberta_params, batch, key, roberta_cfg, remat)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def shard_training(mesh, state: TrainState, roberta_params, batch):
    """Place training state + inputs on the mesh: JEGAL/XLM-R params with
    Megatron TP specs ('model' axis), optimizer moments mirroring the param
    layout, batch arrays sharded on 'data'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jegal_tpu.parallel.mesh import (
        jegal_param_spec,
        roberta_param_spec,
        shard_pytree,
    )

    jspec = jegal_param_spec()
    params = shard_pytree(state.params, jspec, mesh)

    def place_opt(node):
        # adamw moments / accumulated grads mirror the param tree; other
        # leaves replicate
        try:
            return shard_pytree(node, jspec, mesh)
        except (ValueError, KeyError, TypeError):
            return jax.device_put(node, NamedSharding(mesh, P()))

    def place_opt_tree(s):
        # preserve optimizer-state container types exactly (plain tuples,
        # optax NamedTuples, and nested wrappers like MultiStepsState)
        if hasattr(s, "_fields"):
            return type(s)(*[place_opt_tree(getattr(s, f))
                             for f in s._fields])
        if isinstance(s, tuple):
            return tuple(place_opt_tree(x) for x in s)
        return place_opt(s)

    opt_state = place_opt_tree(state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    rparams = shard_pytree(
        roberta_params, roberta_param_spec(len(roberta_params["layers"])), mesh)
    data = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, data) for k, v in batch.items()}
    return TrainState(params, opt_state, step), rparams, batch


def make_train_step(optimizer, roberta_cfg, remat: bool = False):
    """jit-compiled train step; sharding is inherited from the (committed)
    input placements produced by `shard_training` — GSPMD inserts the data
    psum for gradients and the TP collectives automatically."""

    def wrapped(state, batch, key, roberta_params):
        return train_step(state, batch, key, roberta_params=roberta_params,
                          roberta_cfg=roberta_cfg, optimizer=optimizer,
                          remat=remat)

    # donate the old state: params + both adam moments are overwritten each
    # step, halving training HBM
    return jax.jit(wrapped, donate_argnums=(0,))
