"""Device-side video preprocessing for the GestSync input.

The reference masks/resizes per frame on the host with cv2
(inference_embs.py:235-286) — measured at ~32 ms/frame in this image, which
would cap end-to-end throughput at ~1 video/sec. TPU-native split instead:

  * spatial resize to 480x270 happens in the native decoder (swscale, C++),
  * the face mask is applied ON DEVICE as part of the GestSync graph:
    uint8 frames -> float/255 -> rows above the chin line zeroed -> edge pad.

Fallback (no keypoint backend): the reference's face-None branch masks the
top 110 rows after resize (inference_embs.py:262-264) — identical here.
With keypoints: the reference masks at the original resolution before
resizing; applying the scaled chin line after the decoder's resize differs
only in the single interpolated boundary row (documented divergence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_HEIGHT, MASK_WIDTH = 270, 480
FALLBACK_ROWS = 111  # cv2.rectangle (0,0)-(w,110) fills rows 0..110 inclusive
EDGE_PAD = 12


def mask_frames_device(frames_u8, y2=None):
    """frames_u8: (T, 270, 480, 3) uint8 (decoder-resized) ->
    (T + 24, 270, 480, 3) float32 in [0, 1], masked and edge-padded.

    y2: per-frame chin-line rows (T,) int32 in resized coordinates
    (already +15 offset applied by the caller), or None for the
    fixed top-110 fallback mask.
    """
    t, h, w, _ = frames_u8.shape
    x = frames_u8.astype(jnp.float32) / 255.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    if y2 is None:
        cut = jnp.full((t, 1, 1, 1), FALLBACK_ROWS, jnp.int32)
    else:
        cut = jnp.clip(y2.astype(jnp.int32), 0, h).reshape(t, 1, 1, 1)
    x = jnp.where(rows < cut, 0.0, x)
    return jnp.pad(x, ((EDGE_PAD, EDGE_PAD), (0, 0), (0, 0), (0, 0)), "edge")


def chin_lines(keypoints, resolution, out_height: int = MASK_HEIGHT):
    """Per-frame chin rows from Holistic keypoints, scaled to the decoder's
    output height; frames with no face get the fallback row."""
    import numpy as np

    h = resolution[0]
    scale = out_height / h
    from jegal_tpu.host.masking import face_bbox_bottom

    out = np.full((len(keypoints),), FALLBACK_ROWS, np.int32)
    for i, kp in enumerate(keypoints):
        face = kp.get("face")
        if face is not None:
            # reference masks rows 0..y2+15 inclusive -> y2+16 rows
            out[i] = int((face_bbox_bottom(face, resolution) + 16) * scale)
    return out


def mask_s2d_core(frames_u8, y2=None, dtype=jnp.bfloat16):
    """Mask + space-to-depth repack WITHOUT the +/-12 edge pad.

    frames_u8: (T, 270, 480, 3) uint8 -> (T, 90, 32, 256) `dtype` in the
    stem kernel's layout (s2d block 3: channel c = (ri*3+rj)*3+ch in
    sublanes [27 valid of 32], w//3 in lanes [160 valid of 256]). Per-frame
    pure, so callers may chunk the time axis freely (the batched tower
    fuses this into its chunk loop instead of materializing the full
    repacked tensor — 4x less HBM traffic for that stage)."""
    t, h, w, _ = frames_u8.shape
    x = frames_u8.astype(jnp.float32) / 255.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    if y2 is None:
        cut = jnp.full((t, 1, 1, 1), FALLBACK_ROWS, jnp.int32)
    else:
        cut = jnp.clip(y2.astype(jnp.int32), 0, h).reshape(t, 1, 1, 1)
    x = jnp.where(rows < cut, 0.0, x).astype(dtype)
    # two-step s2d (measured fastest XLA form): merge (w3, rj*3+ch) first,
    # swap innermost, then fold ri out of the row dim
    y = x.reshape(t, h, w // 3, 9).transpose(0, 1, 3, 2)
    y = y.reshape(t, h // 3, 27, w // 3)
    return jnp.pad(y, ((0, 0), (0, 0), (0, 5), (0, 256 - w // 3)))


def s2d_from_planar(planar_u8, dtype=jnp.bfloat16, edge_pad: bool = True):
    """Stem-kernel input from the native decoder's s2d layout.

    planar_u8: (T, H/3, 27, W/3) uint8 as emitted by host.media.s2d_repack
    (C++ jegal_s2d_repack) — already repacked AND face-masked on the host.
    -> (T + 24, H/3, 32, 256) `dtype`, bit-identical to
    mask_frames_s2d(frames_u8, y2, dtype): only convert + pad remain on
    device (pure elementwise; no transpose), which is what makes the
    host-repack path ~2 ms/clip faster than the raw-frames path.
    """
    t, h3, c27, w3 = planar_u8.shape
    assert c27 == 27, planar_u8.shape
    x = (planar_u8.astype(jnp.float32) / 255.0).astype(dtype)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 5), (0, 256 - w3)))
    if edge_pad:
        x = jnp.pad(x, ((EDGE_PAD, EDGE_PAD), (0, 0), (0, 0), (0, 0)),
                    "edge")
    return x


def mask_frames_s2d(frames_u8, y2=None, dtype=jnp.bfloat16):
    """Fused mask + space-to-depth repack for the Pallas stem kernel.

    frames_u8: (T, 270, 480, 3) uint8 -> X (T + 24, 90, 32, 256) `dtype`:
    same masking semantics as mask_frames_device, but the output is written
    directly in the stem kernel's layout — the standalone transpose this
    replaces costs ~3 ms/clip.
    """
    y = mask_s2d_core(frames_u8, y2, dtype)
    return jnp.pad(y, ((EDGE_PAD, EDGE_PAD), (0, 0), (0, 0), (0, 0)), "edge")
