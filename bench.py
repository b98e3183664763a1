"""Benchmark: end-to-end vta embedding extraction throughput on one chip.

Workload: one "video" = 5 s @ 25 fps (T=125 frames) through the FULL engine
device path per clip (reference inference_embs.py extract_embs): decoder
uint8 frames -> fused on-device face-mask + s2d repack -> GestSync tower
(Pallas fused stem + shared-conv windowing) -> JEGAL tri-modal forward with
a FULL-WIDTH text branch (12-layer, 250k-vocab XLM-R as in
models/jegal.py:13-14 of the reference; random weights — real checkpoints
are external to this image), bf16 compute.

vs_baseline: the same pipeline (XLA stem fallback) on the host CPU backend,
T=25 scaled by 5 (conv FLOPs are linear in T; underestimates CPU time, so
the reported speedup is conservative). The reference publishes no
throughput numbers (BASELINE.md); the driver north star is >=10x CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

XLMR_LAYERS = 12      # full xlm-roberta-base depth
XLMR_VOCAB = 250002   # full xlm-roberta-base vocab


def build(dtype, t_frames: int, rng, use_pallas: bool):
    from jegal_tpu.models import gestsync as G
    from jegal_tpu.models import jegal as J
    from jegal_tpu.ops.video import mask_frames_device, mask_frames_s2d
    import __graft_entry__ as E

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    gparams = jax.tree.map(lambda x: x.astype(dtype), G.init_params(k1))
    jparams, rparams, cfg = E._models(
        k2, roberta_layers=XLMR_LAYERS, vocab=XLMR_VOCAB)
    jparams = jax.tree.map(lambda x: x.astype(dtype), jparams)
    rparams = jax.tree.map(lambda x: x.astype(dtype), rparams)

    frames_u8 = jnp.asarray(
        rng.integers(0, 255, (t_frames, 270, 480, 3)), jnp.uint8)
    chin = jnp.asarray(rng.integers(100, 140, (t_frames,)), jnp.int32)
    batch = E._example_batch(rng, b=1, t=t_frames, s=32, w=16,
                             mel=4 * t_frames, vocab=XLMR_VOCAB)
    batch = {k: (v.astype(dtype) if v.dtype in (jnp.float32,) else v)
             for k, v in batch.items()}

    def pipeline(gp, jp, rp, frames_u8, chin, input_ids, text_mask,
                 text_pool, audio_mel, audio_pool):
        if use_pallas:
            x = mask_frames_s2d(frames_u8, chin, dtype=dtype)
            feats = G.extract_features_x(gp, x, chunk=160)
        else:
            masked = mask_frames_device(frames_u8, chin).astype(dtype)
            feats = G.extract_features(gp, masked, chunk=160,
                                       use_pallas=False)
        vmask = jnp.ones((1, feats.shape[0]), dtype)
        return J.forward_inference(
            jp, rp, use_v=True, use_t=True, use_a=True,
            visual_feats=feats[None], visual_mask=vmask,
            input_ids=input_ids, text_mask=text_mask, text_pool=text_pool,
            audio_mel=audio_mel, audio_pool=audio_pool, roberta_cfg=cfg)

    args = (gparams, jparams, rparams, frames_u8, chin, batch["input_ids"],
            batch["text_mask"], batch["text_pool"], batch["audio_mel"],
            batch["audio_pool"])
    return jax.jit(pipeline), args


def timed(fn, args, iters: int, device=None, reps: int = 3):
    """Best-of-`reps` timing passes: the tunnel-attached chip shows
    server-side contention between runs (see docs in the verify recipe);
    the minimum is the honest hardware number."""
    if device is not None:
        args = jax.tree.map(lambda x: jax.device_put(x, device), args)
    out = fn(*args)  # compile
    np.asarray(out[1])  # sync via host fetch (the experimental axon
    # platform's block_until_ready does not actually block)
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - start) / iters)
    return best


def build_batched(dtype, t_frames: int, batch: int, rng):
    """Batch-of-clips pipeline: cross-video batched GestSync tower
    (extract_features_batch) + batched JEGAL forward — the serving-throughput
    shape (engine.gestsync_features_from_raw_many / extract_many)."""
    from jegal_tpu.models import gestsync as G
    from jegal_tpu.models import jegal as J
    import __graft_entry__ as E

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    gparams = jax.tree.map(lambda x: x.astype(dtype), G.init_params(k1))
    jparams, rparams, cfg = E._models(
        k2, roberta_layers=XLMR_LAYERS, vocab=XLMR_VOCAB)
    jparams = jax.tree.map(lambda x: x.astype(dtype), jparams)
    rparams = jax.tree.map(lambda x: x.astype(dtype), rparams)

    frames_u8 = jnp.asarray(
        rng.integers(0, 255, (batch, t_frames, 270, 480, 3)), jnp.uint8)
    chin = jnp.asarray(rng.integers(100, 140, (batch, t_frames)), jnp.int32)
    b1 = E._example_batch(rng, b=batch, t=t_frames, s=32, w=16,
                          mel=4 * t_frames, vocab=XLMR_VOCAB)
    b1 = {k: (v.astype(dtype) if v.dtype in (jnp.float32,) else v)
          for k, v in b1.items()}

    def pipeline(gp, jp, rp, frames_u8, chin, input_ids, text_mask,
                 text_pool, audio_mel, audio_pool):
        feats = G.extract_features_batch_raw(gp, frames_u8, chin, chunk=160,
                                             dtype=dtype)
        vmask = jnp.ones(feats.shape[:2], dtype)
        return J.forward_inference(
            jp, rp, use_v=True, use_t=True, use_a=True,
            visual_feats=feats, visual_mask=vmask,
            input_ids=input_ids, text_mask=text_mask, text_pool=text_pool,
            audio_mel=audio_mel, audio_pool=audio_pool, roberta_cfg=cfg)

    args = (gparams, jparams, rparams, frames_u8, chin, b1["input_ids"],
            b1["text_mask"], b1["text_pool"], b1["audio_mel"],
            b1["audio_pool"])
    return jax.jit(pipeline), args


def main():
    from jegal_tpu.cli.main import setup_compilation_cache

    setup_compilation_cache()
    rng = np.random.default_rng(0)
    t_video = 125  # 5 s @ 25 fps

    # --- accelerator run (bf16, real chip, Pallas stem) ---
    fn, args = build(jnp.bfloat16, t_video, rng, use_pallas=True)
    accel = jax.devices()[0]
    iters = 10
    sec_per_video = timed(fn, args, iters, device=accel)
    vps = 1.0 / sec_per_video

    # --- batched throughput (same workload, 8 clips per dispatch) ---
    bsz = 8
    fn_b, args_b = build_batched(jnp.bfloat16, t_video, bsz, rng)
    sec_batch = timed(fn_b, args_b, max(2, iters // 2), device=accel)
    batch_vps = bsz / sec_batch

    # --- CPU baseline (same pipeline, XLA stem, T=25, scaled by 5) ---
    cpu = jax.devices("cpu")[0]
    t_small = 25
    fn_c, args_c = build(jnp.float32, t_small, rng, use_pallas=False)
    sec_small = timed(fn_c, args_c, 1, device=cpu)
    cpu_sec_per_video = sec_small * (t_video / t_small)
    cpu_vps = 1.0 / cpu_sec_per_video

    print(json.dumps({
        "metric": "vta embedding extraction throughput (5s 25fps clips, "
                  "mask+GestSync+JEGAL, full-width 12L/250k XLM-R, bf16, "
                  "single chip)",
        "value": round(vps, 3),
        "unit": "videos/sec",
        "vs_baseline": round(vps / cpu_vps, 2),
        "batch8_videos_per_sec": round(batch_vps, 3),
        "single_clip_latency_ms": round(sec_per_video * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
