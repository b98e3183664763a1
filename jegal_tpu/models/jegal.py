"""JEGAL tri-modal embedding model (gesture / audio / text), TPU-native.

Replicates the reference model (models/jegal.py:16-420) as pure functions
over a parameter pytree, with every branch — including the previously
host-side XLM-RoBERTa forward and the Python word-pooling loops — compiled
into one XLA graph:

  gesture: 1024 -> proj_ip (Linear+LN+ReLU+Linear) -> +PE(500) ->
           6x pre-norm transformer d=512 h=8 -> proj_op_rgb ->
           [inference] proj_op_align_gesture            (jegal.py:25-33,78-92,381)
  text:    XLM-R last_hidden_state -> 3x transformer d=768 -> proj 768->256 ->
           subword->word mean pooling (matmul)          (jegal.py:35-38,95-103,131-211)
  audio:   log-mel (B,T,80) -> 6x conv2d CNN (time/4, freq 80->1) -> 256 ->
           proj_op_audio -> frame->word mean pooling    (jegal.py:41-64,105-113,213-252)
  fusion:  concat([audio, text]) -> 512 -> proj_op_fusion_content ->
           [inference] proj_op_align_content            (jegal.py:67-76,406-415)

Missing modalities substitute zeros for the absent content branch
(jegal.py:393-394,401-402). The seven modality combos are static variants:
`forward_inference(..., use_v=, use_t=, use_a=)` with python bools, so each
combo jit-compiles its own lean graph (no traced Nones).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jegal_tpu.core.layers import (
    batch_norm_inference,
    conv2d,
    linear,
    std_layer_norm,
)
from jegal_tpu.core.transformer import (
    encoder_stack,
    sinusoidal_position_encoding,
)
from jegal_tpu.ops.pooling import pool_words
from jegal_tpu.convert.torch_import import (
    batch_norm_from_torch,
    conv2d_from_torch,
    encoder_stack_from_annotated_torch,
    layer_norm_from_torch,
    linear_from_torch,
    strip_module_prefix,
)

from jegal_tpu.config import DEFAULT as _CFG

D_MODEL = _CFG.model.d_model
D_TEXT = _CFG.model.d_model_text
NUM_HEADS = _CFG.model.num_heads
PE_MAX_LEN = _CFG.model.pe_max_len

# audio CNN: (kernel, stride, padding, has_bn_relu) — reference jegal.py:41-63
AUDIO_CNN_SPEC = (
    dict(k=(5, 5), s=(1, 1), p=(2, 2), bn=True),
    dict(k=(3, 3), s=(2, 2), p=(1, 1), bn=True),
    dict(k=(3, 3), s=(2, 2), p=(1, 1), bn=True),
    dict(k=(3, 3), s=(1, 3), p=(1, 1), bn=True),
    dict(k=(3, 3), s=(1, 3), p=(1, 1), bn=True),
    dict(k=(1, 1), s=(1, 3), p=(0, 0), bn=False),
)
AUDIO_CHANNELS = (1, 32, 64, 128, 256, 256, 256)


def _mlp2(params, x):
    """Linear -> ReLU -> Linear (the align/fusion head shape)."""
    return linear(params[1], jax.nn.relu(linear(params[0], x)))


# ---------------------------------------------------------------------------
# Branches
# ---------------------------------------------------------------------------

def forward_gestures(params, visual_feats, visual_mask, fused: bool = True):
    """(B, T, 1024), (B, T) -> (B, T, 512) gesture embeddings (pre-align).

    fused=False forces the XLA encoder loop (training path — the fused
    Pallas sublayers are inference-only, see core/transformer.encoder_stack).
    """
    x = linear(params["proj_ip_rgb"][0], visual_feats)
    x = std_layer_norm(params["proj_ip_ln"], x)
    x = jax.nn.relu(x)
    x = linear(params["proj_ip_rgb"][1], x)
    # PE table is computed at trace time for the static T; the reference
    # caps it at 500 and would crash beyond (modules.py:136) — we extend
    # the same formula so minutes-long videos work.
    pe = sinusoidal_position_encoding(
        max(PE_MAX_LEN, x.shape[1]), D_MODEL, x.dtype)
    x = x + pe[None, : x.shape[1]]
    mask = visual_mask[:, None, :] if visual_mask is not None else None
    x = encoder_stack(params["encoder_rgb"], x, mask, NUM_HEADS, fused=fused)
    return linear(params["proj_op_rgb"], x)


def forward_text(params, roberta_out, text_mask, fused: bool = True):
    """(B, S, 768), (B, S) -> (B, S, 256) subword embeddings."""
    mask = text_mask[:, None, :] if text_mask is not None else None
    x = encoder_stack(params["encoder_text"], roberta_out, mask, NUM_HEADS,
                      fused=fused)
    return linear(params["proj_op_text"], x)


def forward_audio(params, mel, valid_lens=None):
    """(B, T_mel, 80) -> (B, (T_mel-1)//4+1, 256) audio tokens at 25 Hz.

    valid_lens: optional (B,) true mel lengths when T_mel is bucket-padded.
    Layers 4-5 have temporal padding at stride 1, so a padded run's last
    valid tokens would otherwise see computed-garbage neighbors instead of
    the conv zero-padding a natural-length run sees; re-zeroing the invalid
    tail after every layer makes the padded run bit-equal to natural
    (tested in tests/test_api.py)."""
    x = mel[..., None]  # NHWC: (B, time, freq, 1)
    v = None if valid_lens is None else valid_lens.astype(jnp.int32)

    def zero_tail(x, v):
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1, 1), 1)
        return jnp.where(rows < v[:, None, None, None], x, 0.0)

    for spec, blk in zip(AUDIO_CNN_SPEC, params["cnn"]):
        x = conv2d(blk["conv"], x, stride=spec["s"], padding=spec["p"])
        if spec["bn"]:
            x = batch_norm_inference(blk["bn"], x)
            x = jax.nn.relu(x)
        if v is not None:
            if spec["s"][0] == 2:  # temporal stride halves the valid length
                v = (v - 1) // 2 + 1
            x = zero_tail(x, v)
    x = x[:, :, 0, :]  # freq collapsed to 1
    return linear(params["proj_op_audio"], x)


def fuse_content(params, audio_words, text_words, align: bool,
                 strategy: str = "concat"):
    """fusion -> MLP (-> align MLP at inference): (B, W, 512).

    strategy: 'concat' (default; [audio, text] order, reference
    jegal.py:319-320) or 'avg'. The reference's 'avg' (jegal.py:321-322) is
    a latent bug: (audio + text) / 2 is 256-d, which the 512-d fusion MLP
    cannot consume. Our 'avg' tiles the averaged 256-d vector twice to
    512-d so the option runs; its outputs are NOT comparable to any
    reference output (a warning is logged on selection)."""
    if strategy == "concat":
        content = jnp.concatenate([audio_words, text_words], axis=-1)
    elif strategy == "avg":
        # reference 'avg' is (audio + text) / 2; it produces 256-d which the
        # 512-d fusion MLP cannot consume (latent reference bug) — we tile
        # the averaged 256-d to 512-d so the option is usable
        import warnings

        warnings.warn(
            "fusion_strategy='avg' tiles the 256-d average to 512-d; the "
            "reference's 'avg' crashes, so these outputs are not comparable "
            "to any reference output", stacklevel=2)
        avg = (audio_words + text_words) / 2
        content = jnp.concatenate([avg, avg], axis=-1)
    else:
        raise ValueError(f"unknown fusion strategy: {strategy}")
    content = _mlp2(params["proj_op_fusion_content"], content)
    if align:
        content = _mlp2(params["proj_op_align_content"], content)
    return content


# ---------------------------------------------------------------------------
# Inference forward (7 static modality combos)
# ---------------------------------------------------------------------------

def forward_inference(
    params,
    roberta_params=None,
    *,
    use_v: bool,
    use_t: bool,
    use_a: bool,
    visual_feats=None,
    visual_mask=None,
    input_ids=None,
    text_mask=None,
    text_pool=None,
    audio_mel=None,
    audio_pool=None,
    audio_valid=None,
    roberta_cfg=None,
    fusion_strategy: str = "concat",
):
    """Parity with reference forward_inference (models/jegal.py:377-420).

    text_pool / audio_pool: (B, W_max, S) / (B, W_max, T_audio) pooling
    matrices from jegal_tpu.ops.pooling (host-precomputed).

    Returns (gesture_emb | None, content_emb | None) — unlike the reference
    (which returns a bare tensor for single-branch combos), always a pair;
    the CLI layer flattens it to the documented .pkl schema.
    """
    assert use_v or use_t or use_a
    gesture = None
    if use_v:
        g = forward_gestures(params, visual_feats, visual_mask)
        gesture = _mlp2(params["proj_op_align_gesture"], g)
        if not (use_t or use_a):
            return gesture, None

    text_words = audio_words = None
    if use_t:
        from jegal_tpu.models import roberta as R

        cfg = roberta_cfg or R.XLMR_BASE
        hidden = R.forward(roberta_params, input_ids, text_mask, cfg)
        sub = forward_text(params, hidden, text_mask)
        text_words = pool_words(text_pool, sub)
    if use_a:
        tokens = forward_audio(params, audio_mel, audio_valid)
        audio_words = pool_words(audio_pool, tokens)
    if text_words is None:
        text_words = jnp.zeros_like(audio_words)
    if audio_words is None:
        audio_words = jnp.zeros_like(text_words)

    content = fuse_content(params, audio_words, text_words, align=True,
                           strategy=fusion_strategy)
    return gesture, content


def forward_validation(
    params,
    roberta_params=None,
    *,
    use_t: bool = True,
    use_a: bool = True,
    visual_feats=None,
    visual_mask=None,
    input_ids=None,
    text_mask=None,
    text_pool=None,
    audio_mel=None,
    audio_pool=None,
    audio_valid=None,
    roberta_cfg=None,
    fusion_strategy: str = "concat",
    fused: bool = True,
):
    """Validation forward (reference models/jegal.py:330-375): like
    forward_inference but WITHOUT the align heads — the representation the
    training loss sees. Visual branch is always on; text/audio optional with
    zeros substitution.

    fused=True (default): the encoder stacks ride the fused Pallas sublayer
    kernels on TPU — validation runs under no-grad, so the kernels'
    inference-only (no-VJP) restriction does not apply; only the LOSS
    forward must pass fused=False (training/trainer.py:55-64). Measured at
    b=8/T=125 full-width on chip: see docs/ARCHITECTURE.md r4 ledger."""
    gesture = forward_gestures(params, visual_feats, visual_mask,
                               fused=fused)

    text_words = audio_words = None
    if use_t:
        from jegal_tpu.models import roberta as R

        cfg = roberta_cfg or R.XLMR_BASE
        hidden = R.forward(roberta_params, input_ids, text_mask, cfg)
        text_words = pool_words(
            text_pool, forward_text(params, hidden, text_mask, fused=fused))
    if use_a:
        audio_words = pool_words(
            audio_pool, forward_audio(params, audio_mel, audio_valid))
    if text_words is None:
        text_words = jnp.zeros_like(audio_words)
    if audio_words is None:
        audio_words = jnp.zeros_like(text_words)
    content = fuse_content(params, audio_words, text_words, align=False,
                           strategy=fusion_strategy)
    return gesture, content


# ---------------------------------------------------------------------------
# Checkpoint conversion / init
# ---------------------------------------------------------------------------

def params_from_torch(sd, dtype=jnp.float32):
    """Convert the reference JEGAL state_dict (.pth 'state_dict', possibly
    DataParallel-prefixed). The XLM-R backbone is NOT part of this state_dict
    (the reference loads it separately from HF — jegal.py:13-14)."""
    sd = strip_module_prefix(sd)
    cnn = []
    seq_idx = 0
    for spec in AUDIO_CNN_SPEC:
        blk = {"conv": conv2d_from_torch(sd, f"cnn.{seq_idx}", dtype)}
        seq_idx += 1
        if spec["bn"]:
            blk["bn"] = batch_norm_from_torch(sd, f"cnn.{seq_idx}", dtype)
            seq_idx += 2  # bn + relu
        cnn.append(blk)
    return {
        "proj_ip_rgb": [
            linear_from_torch(sd, "proj_ip_rgb.0", dtype),
            linear_from_torch(sd, "proj_ip_rgb.3", dtype),
        ],
        "proj_ip_ln": layer_norm_from_torch(sd, "proj_ip_rgb.1", dtype),
        "encoder_rgb": encoder_stack_from_annotated_torch(sd, "encoder_rgb", 6, dtype),
        "proj_op_rgb": linear_from_torch(sd, "proj_op_rgb", dtype),
        "encoder_text": encoder_stack_from_annotated_torch(sd, "encoder_text", 3, dtype),
        "proj_op_text": linear_from_torch(sd, "proj_op_text", dtype),
        "cnn": cnn,
        "proj_op_audio": linear_from_torch(sd, "proj_op_audio", dtype),
        "proj_op_fusion_content": [
            linear_from_torch(sd, "proj_op_fusion_content.0", dtype),
            linear_from_torch(sd, "proj_op_fusion_content.2", dtype),
        ],
        "proj_op_align_gesture": [
            linear_from_torch(sd, "proj_op_align_gesture.0", dtype),
            linear_from_torch(sd, "proj_op_align_gesture.2", dtype),
        ],
        "proj_op_align_content": [
            linear_from_torch(sd, "proj_op_align_content.0", dtype),
            linear_from_torch(sd, "proj_op_align_content.2", dtype),
        ],
    }


def init_params(key, dtype=jnp.float32):
    from jegal_tpu.core.layers import (
        init_batch_norm,
        init_conv,
        init_layer_norm,
        init_linear,
    )
    from jegal_tpu.core.transformer import init_encoder_stack

    ks = iter(jax.random.split(key, 32))
    cnn = []
    for i, spec in enumerate(AUDIO_CNN_SPEC):
        blk = {
            "conv": init_conv(
                next(ks), spec["k"] + (AUDIO_CHANNELS[i], AUDIO_CHANNELS[i + 1]), dtype
            )
        }
        if spec["bn"]:
            blk["bn"] = init_batch_norm(AUDIO_CHANNELS[i + 1], dtype)
        cnn.append(blk)
    return {
        "proj_ip_rgb": [init_linear(next(ks), 1024, 512, dtype),
                        init_linear(next(ks), 512, 512, dtype)],
        "proj_ip_ln": init_layer_norm(512, dtype),
        "encoder_rgb": init_encoder_stack(next(ks), 6, 512, 2048, dtype=dtype),
        "proj_op_rgb": init_linear(next(ks), 512, 512, dtype),
        "encoder_text": init_encoder_stack(next(ks), 3, 768, 3072, dtype=dtype),
        "proj_op_text": init_linear(next(ks), 768, 256, dtype),
        "cnn": cnn,
        "proj_op_audio": init_linear(next(ks), 256, 256, dtype),
        "proj_op_fusion_content": [init_linear(next(ks), 512, 512, dtype),
                                   init_linear(next(ks), 512, 512, dtype)],
        "proj_op_align_gesture": [init_linear(next(ks), 512, 512, dtype),
                                  init_linear(next(ks), 512, 512, dtype)],
        "proj_op_align_content": [init_linear(next(ks), 512, 512, dtype),
                                  init_linear(next(ks), 512, 512, dtype)],
    }
