"""GestSync visual tower (frozen feature extractor), TPU-native.

Replicates the reference model (models/gestsync.py:7-162) — a 6-block 3-D VGG
over 25-frame masked RGB clips, sinusoidal PE, a 6-layer post-norm torch
TransformerEncoder (d=512, h=8), and a 512->512->1024 head — but re-designed
for XLA/TPU:

  * channels-last NDHWC layout end-to-end (MXU-friendly),
  * **shared-conv windowing**: the reference recomputes the full conv tower
    for every sliding 25-frame window (stride 1, batches of 48 —
    inference_embs.py:488-516). Because every temporal conv is stride 1 and
    only block 1 has a temporal extent (k_t=5; blocks 2-6 have k_t=1), the
    conv tower is translation-equivariant in time: computing it ONCE over the
    whole (T+24)-frame padded sequence yields exactly the per-window conv
    tokens, shared across overlapping windows (~25x fewer conv FLOPs).
    Window w over frames [w, w+25) corresponds to conv tokens [w, w+21).
  * the per-window transformer+head then runs batched over all T windows of
    21 tokens at once,
  * temporal chunking (static shapes) bounds conv activation memory so
    minutes-long videos never materialize a (T, 88, 158, 64) tensor.

Input contract (reference inference_embs.py:235-283):
  frames: (T_pad, 270, 480, 3) float32 in [0, 1], already masked and
  edge-padded +/-12 frames by the caller; T_pad = T + 24.
Output: (T, 1024) GestSync features, one per original frame.

The audio branch / LSTM of the reference checkpoint exist only for
state-dict compatibility and are not used in this pipeline
(reference models/gestsync.py:23-32); the converter simply skips them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jegal_tpu.core.layers import (
    batch_norm_inference,
    conv3d,
    linear,
    max_pool3d,
)
from jegal_tpu.core.transformer import (
    sinusoidal_position_encoding,
    torch_encoder_stack,
)
from jegal_tpu.convert.torch_import import (
    batch_norm_from_torch,
    conv3d_from_torch,
    linear_from_torch,
    torch_encoder_stack_from_torch,
    strip_module_prefix,
)

# (kernel, stride, padding, maxpool) per VGG block — reference
# models/gestsync.py:34-87. Channels: 3->64->128->256->256->256->512.
VGG_SPEC = (
    dict(k=(5, 7, 7), s=(1, 3, 3), p=(0, 0, 0), mp=((1, 3, 3), (1, 2, 2))),
    dict(k=(1, 5, 5), s=(1, 2, 2), p=(0, 0, 0), mp=None),
    dict(k=(1, 3, 3), s=(1, 2, 2), p=(0, 1, 1), mp=None),
    dict(k=(1, 3, 3), s=(1, 1, 2), p=(0, 1, 1), mp=None),
    dict(k=(1, 3, 3), s=(1, 1, 1), p=(0, 1, 1), mp=((1, 3, 3), (1, 2, 2))),
    dict(k=(1, 4, 4), s=(1, 1, 1), p=(0, 0, 0), mp=None),  # fc3d block
)

from jegal_tpu.config import DEFAULT as _CFG

WINDOW = _CFG.video.window       # frames per sync window (inference_embs.py:488)
TOKENS = WINDOW - 4              # conv tokens per window: 25 - (5-1)
EDGE_PAD = _CFG.video.edge_pad_frames  # caller edge-pads +/-12 (inference_embs.py:283)
NUM_HEADS = 8
D_MODEL = 512
D_OUT = 1024


def _space_to_depth(x, b: int):
    """(B, D, H, W, C) -> (B, D, ceil(H/b), ceil(W/b), b*b*C): zero-pad H/W
    up to multiples of b, then pack each bxb spatial block into channels
    (channel order: row-major block offset, then C). Zero padding is
    tap-safe for a valid stride-b conv: real kernel taps never reach the
    padded rows (the last window starts at b*(out-1) <= H-k)."""
    bs, d, h, w, c = x.shape
    hp, wp = -(-h // b) * b, -(-w // b) * b
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    y = x.reshape(bs, d, hp // b, b, wp // b, b, c)
    return y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(bs, d, hp // b, wp // b,
                                                    b * b * c)


def _s2d_kernel(k, b: int):
    """Rewrite a conv3d kernel (kt,kh,kw,C,O) for space-to-depth input with
    spatial block b (stride b -> stride 1 in block space):
    -> (kt, kb, kb, b*b*C, O) with kb = (k-1)//b + 1. Original tap (di,dj)
    lands in block (di//b, dj//b) at within-block offset (di%b, dj%b)."""
    kt, kh, kw, c, o = k.shape
    kb_h = (kh - 1) // b + 1
    kb_w = (kw - 1) // b + 1
    out = jnp.zeros((kt, kb_h, kb_w, b * b * c, o), k.dtype)
    for di in range(kh):
        for dj in range(kw):
            bi, ri = divmod(di, b)
            bj, rj = divmod(dj, b)
            off = (ri * b + rj) * c
            out = out.at[:, bi, bj, off : off + c, :].set(k[:, di, dj])
    return out


def _conv_block(blk, spec, x):
    """One VGG block with automatic space-to-depth for MXU-starving strided
    convs (spatial stride b > 1, zero padding): exactly equivalent, ~3-5x
    faster for the C_in=3 stem on v5e."""
    s = spec["s"]

    def _s2d_shape_ok(n, k, b):
        # block-space valid conv must emit exactly the dense output count
        return (-(-n // b) - (k - 1) // b) == ((n - k) // b + 1)

    kh, kw = blk["conv"]["kernel"].shape[1:3]
    # s2d pays off only when C_in starves the MXU contraction (the stem's
    # C_in=3); at C_in >= 16 the repack transpose costs more than it saves
    # (measured on v5e: layer 2 regressed 18.1 -> 20.3 ms with s2d).
    if (s[1] == s[2] > 1 and spec["p"] == (0, 0, 0)
            and x.shape[-1] < 16
            and _s2d_shape_ok(x.shape[2], kh, s[1])
            and _s2d_shape_ok(x.shape[3], kw, s[2])):
        b = s[1]
        conv = {"kernel": _s2d_kernel(blk["conv"]["kernel"], b),
                "bias": blk["conv"].get("bias")}
        x = conv3d(conv, _space_to_depth(x, b), stride=(s[0], 1, 1),
                   padding=(0, 0, 0))
    else:
        x = conv3d(blk["conv"], x, stride=s, padding=spec["p"])
    x = batch_norm_inference(blk["bn"], x)
    x = jax.nn.relu(x)
    if spec["mp"] is not None:
        x = max_pool3d(x, kernel=spec["mp"][0], stride=spec["mp"][1])
    return x


def vgg_tower(params, x):
    """6-block conv3d tower. x: (B, D, H, W, C) -> (B, D-4, 1, 1, 512)."""
    for spec, blk in zip(VGG_SPEC, params["net_vid"]):
        x = _conv_block(blk, spec, x)
    return x


def _pallas_stem_ok(frames) -> bool:
    """Use the fused Pallas stem when on a real TPU backend and the frame
    geometry fits the kernel's contract (s2d block 3, >=1 pool row/col).
    Any non-TPU backend (CPU, GPU) takes the XLA path — the kernel uses
    TPU-only Mosaic primitives."""
    t_pad, h, w, c = frames.shape
    if jax.default_backend() != "tpu":
        return False
    return (c == 3 and h % 3 == 0 and w % 3 == 0
            and h // 3 >= 5 and 5 <= w // 3 <= 254 and t_pad >= 5)


def conv_tokens(params, frames, chunk: int = 160,
                use_pallas: bool | None = None):
    """Run the conv tower once over the full padded sequence.

    frames: (T_pad, H, W, 3) -> tokens (T_pad - 4, 512).

    Time is processed in static chunks with a 4-frame halo (block 1 has
    k_t=5, all temporal strides are 1), so activation memory is bounded
    regardless of video length while remaining numerically identical to the
    single-pass conv.

    On TPU the stem block (conv1+BN+ReLU+maxpool — ~80% of the tower time
    under XLA, which caps at the K=27 contraction) runs as the fused Pallas
    kernel (ops/pallas/stem.py); block 2 consumes its undecimated m-grid
    output via a dilated conv and blocks 3-6 proceed unchanged. The XLA
    path below is the fallback and the parity oracle.
    """
    if use_pallas is None:
        use_pallas = _pallas_stem_ok(frames)
    if use_pallas:
        # NOTE: branch BEFORE the chunk padding below — conv_tokens_x pads
        # for itself and derives t_out from its input length (padding here
        # would inflate its output with garbage tail tokens)
        from jegal_tpu.ops.pallas.stem import s2d_lanes

        w_pool = (frames.shape[2] // 3 - 5) // 2 + 1
        return conv_tokens_x(params, s2d_lanes(frames), w_pool, chunk=chunk,
                             w_valid=frames.shape[2] // 3)
    t_pad = frames.shape[0]
    t_out = t_pad - 4
    chunk = min(chunk, t_out)  # short buckets: don't pad to a full chunk
    num_chunks = -(-t_out // chunk)
    # pad the tail so every chunk is full-size (outputs beyond t_out dropped)
    pad_to = num_chunks * chunk + 4
    frames = jnp.pad(frames, ((0, pad_to - t_pad), (0, 0), (0, 0), (0, 0)))

    starts = jnp.arange(num_chunks) * chunk

    def one_chunk(start):
        piece = jax.lax.dynamic_slice_in_dim(frames, start, chunk + 4, axis=0)
        out = vgg_tower(params, piece[None])  # (1, chunk, 1, 1, 512)
        return out[0, :, 0, 0, :]

    toks = jax.lax.map(one_chunk, starts)  # (num_chunks, chunk, 512)
    return toks.reshape(-1, D_MODEL)[:t_out]


def _make_stem_chunk_fn(params, w_pool: int, w_valid: int,
                        interpret: bool = False, planar_u8: bool = False,
                        dtype=jnp.bfloat16):
    """-> fn: one (chunk+4)-frame s2d-lanes piece -> (chunk, 512) tokens
    via the Pallas stem -> m-grid layer-2 conv -> blocks 3-6. The SINGLE
    definition of the Pallas tower body, shared by the per-video and both
    batched paths so they cannot silently diverge.

    planar_u8: the piece is HOST-repacked (chunk+4, H3, 27, w_valid) uint8
    (host.media.s2d_repack) and the stem runs `stem_mgrid_planar` — uint8
    DMA'd straight into the kernel, cast in VMEM, /255 folded into the conv
    weights (measured 1.5 ms/chunk faster than any materialized
    convert+repack on chip).

    Block-2 impl order (first whose geometry gate passes):
      1. `mgrid_conv2_dense` — compaction matmul + s2d(2) dense conv, the
         measured-fastest form on chip and pure XLA (default),
      2. the fused Pallas lane-compaction kernel (when `conv2.set_impl`
         selects it),
      3. the dilated `mgrid_conv2` — fallback and parity oracle.
    """
    from jegal_tpu.ops.pallas import conv2 as C2K
    from jegal_tpu.ops.pallas.stem import (
        mgrid_conv2, mgrid_conv2_dense, stem_kernel_params, stem_mgrid_x,
        stem_mgrid_planar)

    lhs, scale, bias = stem_kernel_params(params["net_vid"][0])
    blk2 = params["net_vid"][1]

    def conv2_xla(m):
        y = mgrid_conv2(m, blk2["conv"]["kernel"][0], w_pool)
        if blk2["conv"].get("bias") is not None:
            y = y + blk2["conv"]["bias"]
        return jax.nn.relu(batch_norm_inference(blk2["bn"], y))

    use_kernel = C2K.impl() == "kernel" and w_pool >= 5
    if use_kernel:
        c2 = C2K.conv2_kernel_params(blk2)
    use_dense = C2K.impl() == "dense" and w_pool >= 5

    def fn(piece):
        if planar_u8:
            m = stem_mgrid_planar(piece, lhs, scale, bias, dtype=dtype,
                                  interpret=interpret)
        else:
            m = stem_mgrid_x(piece, lhs, scale, bias, w_valid=w_valid,
                             interpret=interpret)
        if use_dense and C2K.conv2_ok(w_pool, m.shape[1]):
            y = mgrid_conv2_dense(m, blk2, w_pool)
        elif use_kernel and C2K.conv2_ok(w_pool, m.shape[1]):
            y = C2K.mgrid_conv2_fused(m, *c2, w_pool, interpret=interpret)
        else:
            y = conv2_xla(m)
        h = y[None]  # (1, chunk, H2, W2, C2) NDHWC
        for spec, blk in zip(VGG_SPEC[2:], params["net_vid"][2:]):
            h = _conv_block(blk, spec, h)
        return h[0, :, 0, 0, :]

    return fn


def conv_tokens_x(params, x, w_pool: int, chunk: int = 160,
                  w_valid: int = 160, interpret: bool = False):
    """Pallas-stem conv tower over pre-repacked input.

    x: (T_pad, H3, 32, 256) s2d-lanes frames (ops/pallas/stem.s2d_lanes, or
    ops/video.mask_frames_s2d which fuses the repack into the masking pass)
    -> tokens (T_pad - 4, 512). w_pool: pooled stem width (78 for 480-wide
    frames)."""
    t_pad = x.shape[0]
    t_out = t_pad - 4
    chunk = min(chunk, t_out)
    num_chunks = -(-t_out // chunk)
    pad_to = num_chunks * chunk + 4
    x = jnp.pad(x, ((0, pad_to - t_pad), (0, 0), (0, 0), (0, 0)))
    starts = jnp.arange(num_chunks) * chunk
    chunk_fn = _make_stem_chunk_fn(params, w_pool, w_valid, interpret)

    def one_chunk(start):
        return chunk_fn(jax.lax.dynamic_slice_in_dim(x, start, chunk + 4,
                                                     axis=0))

    toks = jax.lax.map(one_chunk, starts)
    return toks.reshape(-1, D_MODEL)[:t_out]


def _window_stack(tokens):
    """tokens (..., T + 20, 512) -> PE-added windows (..., T, 21, 512)."""
    t = tokens.shape[-2] - (TOKENS - 1)
    idx = jnp.arange(t)[:, None] + jnp.arange(TOKENS)[None, :]
    wins = jnp.take(tokens, idx, axis=-2)  # (..., T, 21, 512)
    pe = sinusoidal_position_encoding(50, D_MODEL, tokens.dtype)[:TOKENS]
    return wins + pe


def _window_head_fused(params, wins, interpret: bool = False):
    """Fused-kernel window head: (N, 21, 512) -> (N, 1024).

    The 6 post-norm layers run as fused Pallas sublayer kernels over the
    flattened N*21 window rows (block-diagonal attention across the
    independent 21-token windows — ops/pallas/fused_layer); the ff1/ff2
    head and the per-window mean stay in XLA (three large matmul-shaped
    ops). Semantics oracle: _window_head_xla / reference
    models/gestsync.py:148-162."""
    from jegal_tpu.ops.pallas.fused_layer import fused_torch_stack

    n = wins.shape[0]
    h = fused_torch_stack(params["transformer"],
                          wins.reshape(n * TOKENS, D_MODEL), TOKENS,
                          NUM_HEADS, interpret=interpret)
    h = linear(params["ff1"], h)
    h = jax.nn.relu(h)
    h = linear(params["ff2"], h)  # (N*21, 1024)
    return jnp.mean(h.reshape(n, TOKENS, D_OUT), axis=1)


def _window_head_xla(params, wins, batch: int | None):
    def head(w):
        h = torch_encoder_stack(params["transformer"], w, None, NUM_HEADS)
        h = linear(params["ff1"], h)
        h = jax.nn.relu(h)
        h = linear(params["ff2"], h)  # (b, 21, 1024)
        return jnp.mean(h, axis=1)

    n = wins.shape[0]
    if batch is None or n <= batch:
        return head(wins)
    # bound memory for very long videos: static-size batches via lax.map
    nb = -(-n // batch)
    wins = jnp.pad(wins, ((0, nb * batch - n), (0, 0), (0, 0)))
    out = jax.lax.map(head, wins.reshape(nb, batch, TOKENS, D_MODEL))
    return out.reshape(-1, D_OUT)[:n]


def _window_head_flat(params, wins, batch: int | None):
    """wins: (N, 21, 512) -> (N, 1024), optionally in static-size slices.

    On TPU the transformer+head runs as the fused Pallas sublayer kernels
    (backend chosen at LOWERING time, like the flash dispatch —
    core/transformer.py:126-128); everywhere else, and when the fused
    impl is switched off, the XLA path (also the parity oracle)."""
    from jegal_tpu.ops.pallas import fused_layer as FL

    if FL.enabled() and FL.fused_stack_ok(TOKENS, D_MODEL, NUM_HEADS):
        return jax.lax.platform_dependent(
            wins,
            tpu=lambda w: _window_head_fused(params, w),
            default=lambda w: _window_head_xla(params, w, batch))
    return _window_head_xla(params, wins, batch)


def window_head(params, tokens, batch: int | None = None):
    """Per-window transformer + head over sliding 21-token windows.

    tokens: (T + 20, 512) conv tokens of a T-frame (pre-pad) video
    -> (T, 1024) features (mean over the 21 per-window head outputs,
    reference inference_embs.py:510-511).
    """
    return _window_head_flat(params, _window_stack(tokens), batch)


def extract_features(params, frames, chunk: int = 160,
                     window_batch: int = 512,
                     use_pallas: bool | None = None):
    """Full GestSync feature path: padded masked frames -> (T, 1024).

    frames: (T + 24, 270, 480, 3) float32 in [0,1] (edge-padded by caller).
    Long videos run the window transformer in static window_batch slices so
    activation memory stays bounded (matching the chunked conv)."""
    tokens = conv_tokens(params, frames, chunk=chunk,
                         use_pallas=use_pallas)  # (T + 20, 512)
    t = tokens.shape[0] - (TOKENS - 1)
    batch = window_batch if t > window_batch else None
    return window_head(params, tokens, batch=batch)  # (T, 1024)


def extract_features_x(params, x, w_pool: int = 78, chunk: int = 160,
                       window_batch: int = 512, w_valid: int = 160,
                       interpret: bool = False):
    """extract_features over pre-repacked s2d-lanes input (Pallas stem path;
    x from ops/video.mask_frames_s2d): (T + 24, H3, 32, 256) -> (T, 1024)
    (the +/-12 edge pad; the stem consumes 4 frames, the window transformer
    the remaining 20)."""
    tokens = conv_tokens_x(params, x, w_pool, chunk=chunk, w_valid=w_valid,
                           interpret=interpret)
    t = tokens.shape[0] - (TOKENS - 1)
    batch = window_batch if t > window_batch else None
    return window_head(params, tokens, batch=batch)


def extract_features_planar(params, planar_u8, w_pool: int = 78,
                            chunk: int = 160, window_batch: int = 512,
                            dtype=jnp.bfloat16, interpret: bool = False):
    """extract_features over HOST-repacked uint8 planar input: planar_u8
    (T, H3, 27, W3) uint8 (host.media.s2d_repack — face-masked, NOT
    edge-padded) -> (T, 1024). The +/-12 edge pad happens here in uint8
    (cheap) and the Pallas stem consumes the bytes directly
    (stem_mgrid_planar) — the single-clip production path of the
    extract-feats driver."""
    x = jnp.pad(planar_u8, ((EDGE_PAD, EDGE_PAD),) + ((0, 0),) * 3, "edge")
    t_pad = x.shape[0]
    t_out = t_pad - 4
    chunk = min(chunk, t_out)
    num_chunks = -(-t_out // chunk)
    pad_to = num_chunks * chunk + 4
    x = jnp.pad(x, ((0, pad_to - t_pad),) + ((0, 0),) * 3)
    chunk_fn = _make_stem_chunk_fn(params, w_pool, w_valid=x.shape[3],
                                   interpret=interpret, planar_u8=True,
                                   dtype=dtype)
    toks = jax.lax.map(
        lambda s: chunk_fn(jax.lax.dynamic_slice_in_dim(x, s, chunk + 4,
                                                        axis=0)),
        jnp.arange(num_chunks) * chunk)
    tokens = toks.reshape(-1, D_MODEL)[:t_out]
    t = tokens.shape[0] - (TOKENS - 1)
    batch = window_batch if t > window_batch else None
    return window_head(params, tokens, batch=batch)


def conv_tokens_batch(params, frames, chunk: int = 160,
                      use_pallas: bool | None = None, w_pool: int = 78,
                      w_valid: int = 160, interpret: bool = False):
    """Cross-video conv tower: frames (B, T_pad, H, W, 3) [or s2d-lanes
    (B, T_pad, H3, 32, 256) on the Pallas path] -> (B, T_pad - 4, 512).

    All (video, chunk) units run through ONE lax.map in a single dispatch —
    B same-bucket clips share one graph launch instead of B (the per-video
    driver's dominant overhead for short clips). w_pool: pooled stem width
    of the Pallas path (78 for 480-wide frames, conv_tokens_x)."""
    if use_pallas is None:
        use_pallas = frames.ndim == 5 and frames.shape[-1] == 256
    b, t_pad = frames.shape[:2]
    t_out = t_pad - 4
    chunk = min(chunk, t_out)
    num_chunks = -(-t_out // chunk)
    pad_to = num_chunks * chunk + 4
    widths = [(0, 0), (0, pad_to - t_pad)] + [(0, 0)] * (frames.ndim - 2)
    frames = jnp.pad(frames, widths)

    if use_pallas:
        chunk_fn = _make_stem_chunk_fn(params, w_pool, w_valid, interpret)

        def one(i):
            vi = i // num_chunks
            start = (i % num_chunks) * chunk
            return chunk_fn(jax.lax.dynamic_slice_in_dim(
                frames[vi], start, chunk + 4, axis=0))
    else:
        def one(i):
            vi = i // num_chunks
            start = (i % num_chunks) * chunk
            piece = jax.lax.dynamic_slice_in_dim(
                frames[vi], start, chunk + 4, axis=0)
            return vgg_tower(params, piece[None])[0, :, 0, 0, :]

    toks = jax.lax.map(one, jnp.arange(b * num_chunks))
    return toks.reshape(b, num_chunks * chunk, D_MODEL)[:, :t_out]


def extract_features_batch_raw(params, frames_u8, cut, chunk: int = 160,
                               window_batch: int = 512, w_pool: int = 78,
                               dtype=jnp.bfloat16, interpret: bool = False):
    """Cross-video features from RAW decoder frames, mask+s2d fused into the
    chunk loop: frames_u8 (B, T, 270, 480, 3) uint8 (bucket-padded, NOT yet
    +/-12 edge-padded), cut (B, T) int32 chin rows -> (B, T, 1024).

    The unfused batch path materializes the full repacked tensor
    (B x (T+24) x 90 x 32 x 256 bf16 — 1.8 GB at B=8, T=128) before the
    tower reads it back; masking per chunk keeps that stage's HBM traffic
    to the uint8 input + per-chunk working set."""
    from jegal_tpu.ops.video import mask_s2d_core

    b, t = frames_u8.shape[:2]
    # +/-12 edge pad in uint8 (cheap) so chunk slices see the same frame
    # sequence mask_frames_s2d would produce
    frames_u8 = jnp.pad(
        frames_u8, ((0, 0), (EDGE_PAD, EDGE_PAD), (0, 0), (0, 0), (0, 0)),
        "edge")
    cut = jnp.pad(cut, ((0, 0), (EDGE_PAD, EDGE_PAD)), "edge")
    t_pad = t + 2 * EDGE_PAD
    t_out = t_pad - 4
    chunk = min(chunk, t_out)
    num_chunks = -(-t_out // chunk)
    pad_to = num_chunks * chunk + 4
    frames_u8 = jnp.pad(
        frames_u8, ((0, 0), (0, pad_to - t_pad), (0, 0), (0, 0), (0, 0)))
    cut = jnp.pad(cut, ((0, 0), (0, pad_to - t_pad)))

    chunk_fn = _make_stem_chunk_fn(params, w_pool,
                                   w_valid=frames_u8.shape[3] // 3,
                                   interpret=interpret)

    def one(i):
        vi = i // num_chunks
        start = (i % num_chunks) * chunk
        piece = jax.lax.dynamic_slice_in_dim(
            frames_u8[vi], start, chunk + 4, axis=0)
        cpiece = jax.lax.dynamic_slice_in_dim(cut[vi], start, chunk + 4)
        return chunk_fn(mask_s2d_core(piece, cpiece, dtype=dtype))

    toks = jax.lax.map(one, jnp.arange(b * num_chunks))
    return _batch_tokens_to_feats(params, toks, b, t, t_out, chunk,
                                  num_chunks, window_batch)


def _batch_tokens_to_feats(params, toks, b, t, t_out, chunk, num_chunks,
                           window_batch):
    """Shared tail of the batched tower paths: (b*num_chunks, chunk, 512)
    chunk tokens -> window stack -> window head -> (B, T, 1024)."""
    tokens = toks.reshape(b, num_chunks * chunk, D_MODEL)[:, :t_out]
    wins = _window_stack(tokens).reshape(b * (t_out - TOKENS + 1), TOKENS,
                                         D_MODEL)
    batch = window_batch if wins.shape[0] > window_batch else None
    return _window_head_flat(params, wins, batch).reshape(b, t, D_OUT)


def extract_features_batch_planar(params, planar_u8, chunk: int = 160,
                                  window_batch: int = 512, w_pool: int = 78,
                                  dtype=jnp.bfloat16,
                                  interpret: bool = False):
    """Cross-video features from HOST-repacked s2d planar input: planar_u8
    (B, T, 90, 27, 160) uint8 (host.media.s2d_repack output — already
    face-masked, NOT edge-padded) -> (B, T, 1024).

    Numerically equivalent to extract_features_batch_raw on the same clips
    (the C++ repack is the same permutation+mask, bit-exact — tested; the
    stem consumes the uint8 bytes directly with /255 folded into the conv
    weights, so only that one bf16 rounding site differs). The device
    graph has ZERO pre-stem layout/convert work — the Pallas stem DMAs the
    padded uint8 planar itself (ops/pallas/stem.stem_mgrid_planar)."""
    b, t = planar_u8.shape[:2]
    planar_u8 = jnp.pad(
        planar_u8, ((0, 0), (EDGE_PAD, EDGE_PAD), (0, 0), (0, 0), (0, 0)),
        "edge")
    t_pad = t + 2 * EDGE_PAD
    t_out = t_pad - 4
    chunk = min(chunk, t_out)
    num_chunks = -(-t_out // chunk)
    pad_to = num_chunks * chunk + 4
    planar_u8 = jnp.pad(
        planar_u8, ((0, 0), (0, pad_to - t_pad), (0, 0), (0, 0), (0, 0)))

    chunk_fn = _make_stem_chunk_fn(params, w_pool,
                                   w_valid=planar_u8.shape[4],
                                   interpret=interpret, planar_u8=True,
                                   dtype=dtype)

    def one(i):
        vi = i // num_chunks
        start = (i % num_chunks) * chunk
        piece = jax.lax.dynamic_slice_in_dim(
            planar_u8[vi], start, chunk + 4, axis=0)
        return chunk_fn(piece)

    toks = jax.lax.map(one, jnp.arange(b * num_chunks))
    return _batch_tokens_to_feats(params, toks, b, t, t_out, chunk,
                                  num_chunks, window_batch)


def shard_batch_tower(fn, mesh):
    """THE data-parallel sharding contract for batched tower bodies: wrap a
    (params, frames (B, ...), cut (B, T)) -> (B, T, 1024) fn so the B axis
    shards over the mesh 'data' axis with replicated params.

    Clips are independent, so B splits cleanly: each device runs the full
    chunked tower on its local B/data clips — no collectives in the tower
    at all (the ICI cost is zero; XLA only all-gathers if the caller asks
    for a replicated output). B must be a multiple of the 'data' axis
    size. shard_map (not GSPMD annotations) because the tower's
    (video, chunk) lax.map is a scan XLA cannot split across devices by
    itself. Single definition shared by the raw/planar/CPU tower variants
    (api.gestsync_features_from_raw_many) so the specs cannot diverge.

    This is the multi-device path for the FLOPs-dominant stage of the
    pipeline (the reference parallelizes the same workload with N processes
    over file shards — preprocess/extract_gestsync_feats.py:314-338)."""
    from jax.sharding import PartitionSpec as _P

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(_P(), _P("data"), _P("data")),
                         out_specs=_P("data"), check_vma=False)


def extract_features_batch_raw_sharded(params, frames_u8, cut, mesh,
                                       chunk: int = 160,
                                       window_batch: int = 512,
                                       w_pool: int = 78,
                                       dtype=jnp.bfloat16,
                                       interpret: bool = False):
    """extract_features_batch_raw with clips sharded over 'data' (see
    shard_batch_tower)."""
    import functools as _ft

    f = _ft.partial(extract_features_batch_raw, chunk=chunk,
                    window_batch=window_batch, w_pool=w_pool, dtype=dtype,
                    interpret=interpret)
    return shard_batch_tower(f, mesh)(params, frames_u8, cut)


def extract_features_batch(params, frames, chunk: int = 160,
                           window_batch: int = 512,
                           use_pallas: bool | None = None, w_pool: int = 78,
                           interpret: bool = False):
    """Cross-video GestSync features: (B, T + 24, 270, 480, 3) masked frames
    [or (B, T + 24, 90, 32, 256) s2d-lanes] -> (B, T, 1024). Numerically
    identical to per-video extract_features (tested); one dispatch for the
    whole batch."""
    tokens = conv_tokens_batch(params, frames, chunk=chunk, w_pool=w_pool,
                               use_pallas=use_pallas, interpret=interpret)
    b = tokens.shape[0]
    t = tokens.shape[1] - (TOKENS - 1)
    wins = _window_stack(tokens).reshape(b * t, TOKENS, D_MODEL)
    batch = window_batch if b * t > window_batch else None
    return _window_head_flat(params, wins, batch).reshape(b, t, D_OUT)


def forward_vid_windowed(params, clips):
    """Reference-exact per-window path: clips (B, 25, 270, 480, 3) ->
    (B, 1024, 21) like reference forward_vid (models/gestsync.py:148-162).
    Used for parity tests and as the semantics oracle of the shared-conv path.
    """
    x = vgg_tower(params, clips)  # (B, 21, 1, 1, 512)
    x = x[:, :, 0, 0, :]  # (B, 21, 512)
    pe = sinusoidal_position_encoding(50, D_MODEL, x.dtype)[: x.shape[1]]
    x = x + pe[None]
    x = torch_encoder_stack(params["transformer"], x, None, NUM_HEADS)
    x = linear(params["ff1"], x)
    x = jax.nn.relu(x)
    x = linear(params["ff2"], x)
    return x.transpose(0, 2, 1)  # (B, 1024, 21)


# ---------------------------------------------------------------------------
# Audio tower (checkpoint-compat: present in the reference model but unused
# by the gesture pipeline — reference models/gestsync.py:23-32,89-168; the
# LSTM head is dead weight even in the reference forward_aud and is not
# reimplemented)
# ---------------------------------------------------------------------------

AUD_SPEC = (
    dict(k=(3, 3), s=(2, 2), p=(1, 1), mp=((3, 3), (2, 2))),
    dict(k=(3, 3), s=(1, 2), p=(1, 1), mp=((3, 3), (2, 2))),
    dict(k=(3, 3), s=(1, 1), p=(1, 1), mp=None),
    dict(k=(3, 3), s=(1, 1), p=(1, 1), mp=None),
    dict(k=(3, 3), s=(1, 1), p=(1, 1), mp=((2, 3), (2, 2))),
    dict(k=(4, 2), s=(1, 1), p=(0, 0), mp=None),  # fc2d block
)
AUD_CHANNELS = (1, 64, 192, 384, 256, 256, 512)


def forward_aud(params, x):
    """Audio sync branch: x (B, F, T, 1) NHWC -> (B, 1024, T') like the
    reference forward_aud (models/gestsync.py:164-168: net_aud -> NetFC_2D
    -> squeeze)."""
    from jegal_tpu.core.layers import conv2d, max_pool2d

    for spec, blk in zip(AUD_SPEC, params["net_aud"]):
        x = conv2d(blk["conv"], x, stride=spec["s"], padding=spec["p"])
        x = batch_norm_inference(blk["bn"], x)
        x = jax.nn.relu(x)
        if spec["mp"] is not None:
            x = max_pool2d(x, kernel=spec["mp"][0], stride=spec["mp"][1])
    # NetFC_2D head: 1x1 convs 512 -> 512 -> 1024 with BN+ReLU between
    x = conv2d(params["ff_aud"]["fc7"], x)
    x = batch_norm_inference(params["ff_aud"]["bn7"], x)
    x = jax.nn.relu(x)
    x = conv2d(params["ff_aud"]["fc8"], x)
    # torch squeeze(-1) drops the collapsed width axis (NCHW); NHWC parity:
    return x[:, :, 0, :].transpose(0, 2, 1)  # (B, 1024, T')


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

def params_from_torch(sd, dtype=jnp.float32):
    """Convert the reference GestSync state_dict (DataParallel-prefixed torch
    .pth, reference inference_embs.py:92-119) to our pytree. The unused audio
    tower / LSTM / logits_scale entries are skipped."""
    sd = strip_module_prefix(sd)
    net_vid = []
    for i in range(1, 7):
        name = "fc6" if i == 6 else f"conv{i}"
        net_vid.append({
            "conv": conv3d_from_torch(sd, f"net_vid.{name}", dtype),
            "bn": batch_norm_from_torch(sd, f"net_vid.bn{i}", dtype),
        })
    params = {
        "net_vid": net_vid,
        "transformer": torch_encoder_stack_from_torch(
            sd, "transformer_encoder", 6, dtype
        ),
        "ff1": linear_from_torch(sd, "ff_vid.0", dtype),
        "ff2": linear_from_torch(sd, "ff_vid.2", dtype),
    }
    # audio sync branch (checkpoint-compat; unused by the gesture pipeline)
    if "net_aud.conv1.weight" in sd:
        from jegal_tpu.convert.torch_import import conv2d_from_torch

        net_aud = []
        for i in range(1, 7):
            name = "fc6" if i == 6 else f"conv{i}"
            net_aud.append({
                "conv": conv2d_from_torch(sd, f"net_aud.{name}", dtype),
                "bn": batch_norm_from_torch(sd, f"net_aud.bn{i}", dtype),
            })
        params["net_aud"] = net_aud
        params["ff_aud"] = {
            "fc7": conv2d_from_torch(sd, "ff_aud.fc7", dtype),
            "bn7": batch_norm_from_torch(sd, "ff_aud.bn7", dtype),
            "fc8": conv2d_from_torch(sd, "ff_aud.fc8", dtype),
        }
    return params


def init_params(key, dtype=jnp.float32):
    """Random init with the right shapes (tests / from-scratch training)."""
    from jegal_tpu.core.layers import init_conv, init_batch_norm, init_linear
    from jegal_tpu.core.transformer import init_encoder_layer

    channels = (3, 64, 128, 256, 256, 256, 512)
    keys = jax.random.split(key, 16)
    net_vid = []
    for i, spec in enumerate(VGG_SPEC):
        kshape = spec["k"] + (channels[i], channels[i + 1])
        net_vid.append({
            "conv": init_conv(keys[i], kshape, dtype),
            "bn": init_batch_norm(channels[i + 1], dtype),
        })
    layers = [init_encoder_layer(keys[6 + i], D_MODEL, 2048, dtype) for i in range(6)]
    return {
        "net_vid": net_vid,
        "transformer": {"layers": layers},
        "ff1": init_linear(keys[12], 512, 512, dtype),
        "ff2": init_linear(keys[13], 512, 1024, dtype),
    }
