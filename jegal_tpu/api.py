"""JegalEngine — the end-to-end embedding extraction engine.

Mirrors the public behavior of the reference drivers (inference_embs.py
extract_embs :526-646 and evaluation/extract_jegal_embs.py :56-125): given
any of the seven modality combos (vta/vt/va/ta/v/t/a), produce L2-normalized
`gesture_emb (T, 512)` and/or `content_emb (W, 512)` plus the `.pkl` info
dict. Unlike the reference, all seven combos actually work (the shipped
script crashes on several — SURVEY.md §2.9 defect 4); outputs for the
working paths are numerically parity-matched.

TPU design:
  * each (combo, shape-bucket) pair jits once; ragged inputs are padded to
    buckets with exactly-neutral masking/pooling (zero pooling rows, masked
    attention, zero-padded mel — all verified neutral in tests),
  * the GestSync tower runs the shared-conv windowed path (25x fewer conv
    FLOPs than the reference's per-window batching),
  * the XLM-R forward and word pooling are on-device (the reference runs
    them on host CPU / in Python loops).
"""

from __future__ import annotations

import functools
import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from jegal_tpu.data.bucketing import (
    MEL_BUCKETS,
    S_BUCKETS,
    T_BUCKETS,
    W_BUCKETS,
    next_bucket,
    pad_axis,
)
from jegal_tpu.models import gestsync as G
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R
from jegal_tpu.ops import pooling as P
from jegal_tpu.ops.audio import wav2filterbanks


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class ClientError(ValueError):
    """Invalid client-supplied sample (e.g. a modality without its data).

    The serving layer maps exactly this type to HTTP 400; any other
    ValueError escaping the engine is a server fault (500) — internal shape
    bugs must not masquerade as client errors."""


def _batch_ladder(n: int, cap: int) -> int:
    """Smallest power-of-two >= n, capped at `cap`: tail batches compile at
    most log2(cap)+1 graphs per bucket instead of always padding a 1-sample
    straggler to a full cap-sized batch (VERDICT r2 weak 6)."""
    from jegal_tpu.data.bucketing import pow2_bucket

    return pow2_bucket(n, cap=cap)


@dataclass
class JegalEngine:
    """Holds parameters + tokenizer and serves bucketed, jitted forwards."""

    jegal_params: Any
    roberta_params: Any = None
    gestsync_params: Any = None
    tokenizer: Any = None                      # jegal_tpu.text.tokenizer.WordTokenizer
    roberta_cfg: R.RobertaConfig = field(default_factory=lambda: R.XLMR_BASE)
    transcriber: Callable | None = None        # optional ASR backend (wav -> transcript file)
    fusion_strategy: str = "concat"            # 'concat' (reference default) | 'avg'
    dtype: Any = jnp.float32
    max_cached_graphs: int = 64                # compiled (combo, bucket) budget

    def __post_init__(self):
        # compute dtype applies to parameters too: with fp32 params a bf16
        # engine would silently promote every matmul back to fp32 (and
        # hard-crash convs on mixed dtypes) — cast once here instead
        if self.dtype != jnp.float32:
            def host_leaf(x):
                # host leaves cast in numpy BEFORE any upload (half the
                # host->device bytes for a bf16 engine)
                if (not isinstance(x, jax.Array) and hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating)):
                    return np.asarray(x).astype(self.dtype)
                return x

            def dev_leaf(x):
                return (x.astype(self.dtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x)

            def cast(tree):
                if tree is None:
                    return None
                tree = jax.tree.map(host_leaf, tree)
                if any(isinstance(l, jax.Array)
                       and jnp.issubdtype(l.dtype, jnp.floating)
                       and l.dtype != self.dtype
                       for l in jax.tree.leaves(tree)):
                    # device leaves: ONE compiled convert for the whole tree
                    # — per-leaf eager astype compiles one tiny graph per
                    # distinct shape (~60 s of engine construction in the r4
                    # corpus profile, VERDICT r4 weak 2c)
                    try:
                        tree = jax.jit(lambda t: jax.tree.map(dev_leaf, t))(tree)
                    except ValueError:
                        # leaves committed to incompatible device sets (e.g.
                        # a mesh-sharded tree from trainer.shard_training
                        # mixed with single-device leaves) cannot share one
                        # jit — fall back to per-leaf casts, which preserve
                        # each leaf's placement
                        tree = jax.tree.map(
                            lambda x: dev_leaf(x) if isinstance(x, jax.Array)
                            else x, tree)
                return tree

            self.jegal_params = cast(self.jegal_params)
            self.roberta_params = cast(self.roberta_params)
            self.gestsync_params = cast(self.gestsync_params)
        if (self.roberta_params is not None
                and isinstance(self.roberta_params.get("layers"),
                               (list, tuple))):
            # scan layout: ~2x faster XLA compiles of the encoder stack
            # (serving warm-start) — see roberta.stack_layers. Jitted: the
            # stack/concat of ~100 leaves is one compiled dispatch instead
            # of ~100 eager ops (each a compile on first use)
            try:
                self.roberta_params = jax.jit(R.stack_layers)(
                    self.roberta_params)
            except ValueError:
                # leaves committed to incompatible device sets (same
                # fallback contract as cast() above): eager per-op stacking
                # preserves placements where one jit cannot span the tree
                self.roberta_params = R.stack_layers(self.roberta_params)
        self._combo_cache: dict = {}
        # HF fast tokenizers hold a Rust RefCell: concurrent encode_words
        # from extract_many's prep pool raises "Already borrowed" — all
        # tokenizer calls serialize on this lock (the mel FFT / pooling
        # build, the bulk of prep, still run in parallel)
        import threading

        self._tok_lock = threading.Lock()
        self._prep_pool = None  # lazy shared prep executor (_prep_map)
        self._gestsync_fn = None
        self._gestsync_raw_fn = None
        self._gestsync_batch_fn = None
        self._gestsync_planar_fn = None
        self._graph_ledger: dict = {}          # (combo, shape sig) -> seq no
        self._graph_seq = 0

    # ------------------------------------------------------------------
    # Visual features (GestSync)
    # ------------------------------------------------------------------

    def gestsync_features_masked(self, masked_frames: np.ndarray,
                                 as_device: bool = False) -> np.ndarray:
        """masked_frames: (T + 24, 270, 480, 3) float32 [0,1] (already
        face-masked and edge-padded +/-12, the reference's own preprocessed
        layout) -> (T, 1024). as_device=True returns a device array (no
        host fetch) for callers that feed the features straight back into
        another jit (extract_many / serving)."""
        if self.gestsync_params is None:
            raise RuntimeError("engine has no GestSync parameters")
        t = masked_frames.shape[0] - 2 * G.EDGE_PAD
        t_bucket = next_bucket(t, T_BUCKETS)
        frames = pad_axis(masked_frames, 0, t_bucket + 2 * G.EDGE_PAD)
        if self._gestsync_fn is None:
            self._gestsync_fn = jax.jit(
                functools.partial(G.extract_features, chunk=160)
            )
        feats = self._gestsync_fn(self.gestsync_params, jnp.asarray(frames, self.dtype))
        return feats[:t] if as_device else np.asarray(feats[:t])

    def gestsync_features(self, frames: np.ndarray,
                          chin_rows: np.ndarray | None = None,
                          as_device: bool = False) -> np.ndarray:
        """Dispatching front door for the single-clip tower: raw uint8
        decoder frames (T, 270, 480, 3) -> gestsync_features_from_raw
        (mask+repack on device); host-repacked planar uint8 (T, 90, 27,
        160) (host.media.s2d_repack output, already masked; chin_rows must
        be None) -> gestsync_features_from_planar; float frames (T + 24,
        270, 480, 3) in [0, 1] (already face-masked AND edge-padded) ->
        gestsync_features_masked. Identical results."""
        if frames.shape[1:] == (90, 27, 160):
            if chin_rows is not None:
                # ClientError (not assert): survives python -O and maps to
                # a 400, never a silently-ignored mask request
                raise ClientError("planar input is already masked; "
                                  "chin_rows must be None")
            return self.gestsync_features_from_planar(frames,
                                                      as_device=as_device)
        if np.issubdtype(frames.dtype, np.floating):
            if chin_rows is not None:
                raise ClientError("float frames are pre-masked and "
                                  "edge-padded; chin_rows must be None")
            return self.gestsync_features_masked(frames, as_device=as_device)
        return self.gestsync_features_from_raw(frames, chin_rows,
                                               as_device=as_device)

    def gestsync_features_from_raw(self, frames_u8: np.ndarray,
                                   chin_rows: np.ndarray | None = None,
                                   as_device: bool = False) -> np.ndarray:
        """Fast path: decoder-resized uint8 frames (T, 270, 480, 3) ->
        (T, 1024), with the face mask applied ON DEVICE (one uint8
        host->device transfer; the reference's 32 ms/frame host masking loop
        disappears into the jit graph — see jegal_tpu/ops/video.py)."""
        from jegal_tpu.ops.video import mask_frames_device

        if self.gestsync_params is None:
            raise RuntimeError("engine has no GestSync parameters")
        t = frames_u8.shape[0]
        t_bucket = next_bucket(t, T_BUCKETS)
        # edge-repeat pad to the bucket on host (uint8, cheap)
        if t_bucket != t:
            frames_u8 = np.concatenate(
                [frames_u8,
                 np.repeat(frames_u8[-1:], t_bucket - t, axis=0)], axis=0)
        if self._gestsync_raw_fn is None:
            use_pallas = jax.default_backend() == "tpu"

            def fn(params, frames, cut):
                if use_pallas:
                    # fused mask + s2d repack feeding the Pallas stem
                    from jegal_tpu.ops.video import mask_frames_s2d

                    x = mask_frames_s2d(frames, cut, dtype=self.dtype)
                    return G.extract_features_x(params, x, chunk=160)
                masked = mask_frames_device(frames, cut).astype(self.dtype)
                return G.extract_features(params, masked, chunk=160)

            self._gestsync_raw_fn = {
                True: jax.jit(lambda p, f, c: fn(p, f, c)),
                False: jax.jit(lambda p, f: fn(p, f, None)),
            }
        if chin_rows is not None:
            # pad with the LAST chin row: bucket-pad frames repeat the last
            # real frame, so its mask must repeat too (tail windows read them)
            chin_rows = np.asarray(chin_rows, np.int32)
            cut = np.concatenate(
                [chin_rows,
                 np.full(t_bucket - t, chin_rows[-1], np.int32)])
            feats = self._gestsync_raw_fn[True](
                self.gestsync_params, jnp.asarray(frames_u8),
                jnp.asarray(cut))
        else:
            feats = self._gestsync_raw_fn[False](
                self.gestsync_params, jnp.asarray(frames_u8))
        return feats[:t] if as_device else np.asarray(feats[:t])

    def gestsync_features_from_planar(self, planar_u8: np.ndarray,
                                      as_device: bool = False) -> np.ndarray:
        """Fastest single-clip path: host-repacked s2d planar input
        (T, 90, 27, 160) uint8 (host.media.s2d_repack — repacked AND
        face-masked in C++ on the decode thread) -> (T, 1024). The Pallas
        stem consumes the uint8 bytes directly (DMA + in-VMEM cast, /255
        folded into the conv weights — ops/pallas/stem.stem_mgrid_planar),
        so the device graph has zero pre-stem convert/layout work;
        numerically equivalent to gestsync_features_from_raw on the same
        frames (only the /255 bf16 rounding site differs — tested)."""
        if self.gestsync_params is None:
            raise RuntimeError("engine has no GestSync parameters")
        t = planar_u8.shape[0]
        assert planar_u8.shape[1:] == (90, 27, 160), planar_u8.shape
        t_bucket = next_bucket(t, T_BUCKETS)
        if t_bucket != t:
            planar_u8 = np.concatenate(
                [planar_u8,
                 np.repeat(planar_u8[-1:], t_bucket - t, axis=0)], axis=0)
        if self._gestsync_planar_fn is None:
            interpret = jax.default_backend() != "tpu"

            def fn(params, planar):
                return G.extract_features_planar(params, planar, chunk=160,
                                                 dtype=self.dtype,
                                                 interpret=interpret)

            self._gestsync_planar_fn = jax.jit(fn)
        feats = self._gestsync_planar_fn(self.gestsync_params,
                                         jnp.asarray(planar_u8))
        return feats[:t] if as_device else np.asarray(feats[:t])

    def gestsync_features_from_raw_many(
            self, clips: list, batch_size: int = 16, mesh=None,
            as_device: bool = False) -> list:
        """Cross-video tower batching: clips is a list of
        (frames_u8 (T, 270, 480, 3), chin_rows (T,) | None) tuples — or of
        (planar_u8 (T, 90, 27, 160), None) tuples when the caller repacked
        (and masked) on the host with host.media.s2d_repack (the
        extract-feats driver does; ~2 ms/clip less device work). A call
        must be homogeneous (all raw or all planar). Clip arrays may be
        jax.Arrays the caller already device_put (the extract-feats driver
        uploads on its decode threads) — the batch then stacks ON DEVICE
        with no further host->device traffic. Returns per-clip (T, 1024)
        features (device arrays when as_device=True).

        Same-T-bucket clips stack into ONE batched tower dispatch
        (models/gestsync.extract_features_batch) instead of one launch +
        host round-trip per video — the r1 driver's dominant per-clip
        overhead for short clips (VERDICT r1 item 2 / weak 5). Batches run
        a depth-1 software pipeline: batch k+1 is uploaded and dispatched
        BEFORE batch k's features are fetched, so the next batch's (large)
        host->device transfer overlaps the current batch's tower compute
        instead of serializing behind its fetch (VERDICT r3 item 2 — the
        batch-8 driver regression).

        mesh: a jax.sharding.Mesh with a 'data' axis — the batch shards
        over it via shard_map (clips are independent; params replicated),
        giving the FLOPs-dominant tower a multi-chip path
        (extract_features_batch_raw_sharded)."""
        from jegal_tpu.ops.video import FALLBACK_ROWS

        if self.gestsync_params is None:
            raise RuntimeError("engine has no GestSync parameters")
        is_planar = bool(clips) and clips[0][0].shape[1:] == (90, 27, 160)
        key = (None if mesh is None else mesh, is_planar)
        if self._gestsync_batch_fn is None:
            self._gestsync_batch_fn = {}
        if key not in self._gestsync_batch_fn:
            use_pallas = jax.default_backend() == "tpu"

            def fn(params, frames, cut):
                if is_planar:
                    # host-repacked+masked input: the stem kernel consumes
                    # the uint8 bytes directly (cut unused — already masked)
                    return G.extract_features_batch_planar(
                        params, frames, chunk=160, dtype=self.dtype,
                        interpret=not use_pallas)
                if use_pallas:
                    # mask + s2d fused into the chunk loop (no full repacked
                    # intermediate in HBM)
                    return G.extract_features_batch_raw(
                        params, frames, cut, chunk=160, dtype=self.dtype)
                from jegal_tpu.ops.video import mask_frames_device

                masked = jax.vmap(mask_frames_device)(frames, cut)
                return G.extract_features_batch(
                    params, masked.astype(self.dtype), chunk=160)

            if mesh is None:
                self._gestsync_batch_fn[key] = jax.jit(fn)
            else:
                self._gestsync_batch_fn[key] = jax.jit(
                    G.shard_batch_tower(fn, mesh))

        # group by T bucket; pad B to the power-of-two ladder (one jit per
        # (bucket, pow2-B) — bounded compiles, bounded tail waste)
        groups: dict = {}
        for i, (frames, _) in enumerate(clips):
            groups.setdefault(next_bucket(frames.shape[0], T_BUCKETS),
                              []).append(i)
        results: list = [None] * len(clips)
        shape = (90, 27, 160) if is_planar else (270, 480, 3)

        def assemble(t_bucket, chunk_idx, bsz):
            """Build the (bsz, t_bucket, ...) batch. Host clips: np stack +
            one (optionally 'data'-sharded) device_put. Device clips: pad +
            stack on device — zero further host->device traffic."""
            cut = np.full((bsz, t_bucket), FALLBACK_ROWS, np.int32)
            for bi, ci in enumerate(chunk_idx):
                chin = clips[ci][1]
                if chin is not None:
                    t = clips[ci][0].shape[0]
                    chin = np.asarray(chin, np.int32)
                    cut[bi, :t] = chin
                    cut[bi, t:] = chin[-1]
            if mesh is None and all(isinstance(clips[ci][0], jax.Array)
                                    for ci in chunk_idx):
                parts = []
                for ci in chunk_idx:
                    frames = clips[ci][0]
                    t = frames.shape[0]
                    if t < t_bucket:  # edge-repeat to the bucket
                        frames = jnp.concatenate(
                            [frames, jnp.repeat(frames[-1:], t_bucket - t,
                                                axis=0)], axis=0)
                    parts.append(frames)
                while len(parts) < bsz:
                    parts.append(jnp.zeros_like(parts[0]))
                return jnp.stack(parts), jnp.asarray(cut)
            fr = np.zeros((bsz, t_bucket) + shape, np.uint8)
            for bi, ci in enumerate(chunk_idx):
                frames = np.asarray(clips[ci][0])
                t = frames.shape[0]
                fr[bi, :t] = frames
                fr[bi, t:] = frames[-1]  # edge-repeat to the bucket
            from jegal_tpu.parallel.mesh import put_batch

            return put_batch((fr, cut), mesh)

        def settle(chunk_idx, feats):
            if not as_device:
                feats = np.asarray(feats)  # the pipeline's only sync point
            for bi, ci in enumerate(chunk_idx):
                results[ci] = feats[bi, : clips[ci][0].shape[0]]

        def dispatches():
            for t_bucket, idxs in groups.items():
                for lo in range(0, len(idxs), batch_size):
                    chunk_idx = idxs[lo : lo + batch_size]
                    bsz = _batch_ladder(len(chunk_idx), batch_size)
                    if mesh is not None:
                        d = mesh.shape.get("data", 1)
                        bsz = ((bsz + d - 1) // d) * d  # 'data'-shardable
                    fr, cutj = assemble(t_bucket, chunk_idx, bsz)
                    yield (chunk_idx, self._gestsync_batch_fn[key](
                        self.gestsync_params, fr, cutj))  # async dispatch

        self._pipeline(dispatches(), settle)
        return results

    # ------------------------------------------------------------------
    # Core forward (jitted per combo+bucket)
    # ------------------------------------------------------------------

    def _forward(self, combo_key, arrays):
        if combo_key not in self._combo_cache:
            use_v, use_t, use_a = combo_key[:3]

            def fn(jp, rp, **kw):
                return self._pack_emb(*J.forward_inference(
                    jp, rp, use_v=use_v, use_t=use_t, use_a=use_a,
                    roberta_cfg=self.roberta_cfg,
                    fusion_strategy=self.fusion_strategy, **kw,
                ))

            self._combo_cache[combo_key] = jax.jit(fn)
        self._account_graph(combo_key, arrays)
        return self._combo_cache[combo_key](
            self.jegal_params, self.roberta_params, **arrays
        )

    def _account_graph(self, combo_key, arrays):
        """LRU ledger of compiled (combo, shape-bucket) graphs. When the
        budget is exceeded, the least-recently-used COMBO's jit cache is
        dropped (jax caches per shape inside one jitted callable, so
        per-combo is the finest eviction granularity). The bucket tables
        keep the steady-state footprint far below the default budget — the
        bound exists so a pathological client (many exotic shapes) cannot
        grow device memory without limit."""
        sig = (combo_key,
               tuple(sorted((k, tuple(v.shape)) for k, v in arrays.items())))
        self._graph_seq += 1
        self._graph_ledger[sig] = self._graph_seq
        if len(self._graph_ledger) <= self.max_cached_graphs:
            return
        by_combo: dict = {}
        for (combo, _), seq in self._graph_ledger.items():
            by_combo[combo] = max(by_combo.get(combo, 0), seq)
        victim = min((c for c in by_combo if c != combo_key),
                     key=by_combo.get, default=None)
        if victim is None:
            # the ACTIVE combo alone exceeds the budget (e.g. one combo
            # served with ever-growing exotic shapes): the bound must still
            # hold, so drop its cache too — only the just-requested shape
            # survives in the ledger (it is being compiled right now)
            self._combo_cache[combo_key].clear_cache()
            self._graph_ledger = {sig: self._graph_seq}
            return
        self._combo_cache[victim].clear_cache()
        self._graph_ledger = {k: v for k, v in self._graph_ledger.items()
                              if k[0] != victim}

    @property
    def cached_graphs(self) -> list:
        """Compiled (combo, shapes) signatures, oldest first."""
        return [k for k, _ in sorted(self._graph_ledger.items(),
                                     key=lambda kv: kv[1])]

    # ------------------------------------------------------------------
    # Fused single-dispatch paths: frames -> tower -> JEGAL in ONE jit
    # ------------------------------------------------------------------

    def _fused_key(self, kind: str, use_t: bool, use_a: bool,
                   batched: bool, mesh=None):
        """Build (once) and return the cache key of the fused graph:
        GestSync tower + JEGAL forward compiled as ONE dispatch per
        (modalities, frame kind, shape bucket) — the engine-resident
        counterpart of bench.py's pipeline (VERDICT r3 item 1: the
        user-invocable paths previously fetched the (T, 1024) features to
        host between two dispatches; this is the workload of reference
        inference_embs.py:526-646 as a single graph).

        kind: 'planar' (host-repacked+masked s2d uint8) | 'raw' (decoder
        RGB uint8; mask+repack fused into the graph). batched: (B, T, ...)
        clips + batched JEGAL forward; mesh shards the tower over 'data'
        via shard_map and leaves the forward to GSPMD (same contract as
        gestsync_features_from_raw_many / extract_many)."""
        key = ("fused", kind, use_t, use_a, batched,
               None if mesh is None else mesh)
        if key in self._combo_cache:
            return key
        use_pallas = jax.default_backend() == "tpu"
        interpret = not use_pallas
        dtype = self.dtype

        def tower_single(gp, frames, cut):
            if kind == "planar":
                return G.extract_features_planar(
                    gp, frames, chunk=160, dtype=dtype, interpret=interpret)
            if use_pallas:
                from jegal_tpu.ops.video import mask_frames_s2d

                x = mask_frames_s2d(frames, cut, dtype=dtype)
                return G.extract_features_x(gp, x, chunk=160)
            from jegal_tpu.ops.video import mask_frames_device

            masked = mask_frames_device(frames, cut).astype(dtype)
            return G.extract_features(gp, masked, chunk=160,
                                      use_pallas=False)

        def tower_batch(gp, frames, cut):
            if kind == "planar":
                return G.extract_features_batch_planar(
                    gp, frames, chunk=160, dtype=dtype, interpret=interpret)
            if use_pallas:
                return G.extract_features_batch_raw(gp, frames, cut,
                                                    chunk=160, dtype=dtype)
            from jegal_tpu.ops.video import mask_frames_device

            masked = jax.vmap(mask_frames_device)(frames, cut)
            return G.extract_features_batch(gp, masked.astype(dtype),
                                            chunk=160)

        def fn(gp, jp, rp, frames, cut, visual_mask, **kw):
            if batched:
                tower = (tower_batch if mesh is None
                         else G.shard_batch_tower(tower_batch, mesh))
                feats = tower(gp, frames, cut)
            else:
                feats = tower_single(gp, frames, cut)[None]
            return self._pack_emb(*J.forward_inference(
                jp, rp, use_v=True, use_t=use_t, use_a=use_a,
                visual_feats=feats, visual_mask=visual_mask,
                roberta_cfg=self.roberta_cfg,
                fusion_strategy=self.fusion_strategy, **kw))

        self._combo_cache[key] = jax.jit(fn)
        return key

    @staticmethod
    def _frames_kind(frames) -> str:
        """'planar' | 'raw' with the same client validation as the
        two-stage front door (serving maps ClientError to 400)."""
        if frames.ndim != 4 or frames.shape[1:] not in ((90, 27, 160),
                                                        (270, 480, 3)):
            raise ClientError(
                "frames must be (T, 270, 480, 3) uint8 decoder-resized RGB "
                "or (T, 90, 27, 160) host-repacked planar, got "
                f"{frames.shape}")
        if frames.dtype != np.uint8:
            raise ClientError(f"frames must be uint8, got {frames.dtype}")
        return "planar" if frames.shape[1:] == (90, 27, 160) else "raw"

    def _extract_fused(self, modalities, frames, chin_rows, text,
                       word_boundaries, wav, fname):
        """Single-clip fused extraction: ONE device dispatch from frames to
        embeddings. frames may be a host np.uint8 array or an
        already-uploaded jax.Array (padding then happens on device).

        Numerically identical to gestsync_features + extract on the same
        frames (tested): bucket-padded tail frames produce edge-repeat
        features instead of the two-stage path's zero rows, but
        visual_mask excludes them from every valid position's attention,
        and rows past t_true are sliced off."""
        if self.gestsync_params is None:
            raise RuntimeError("engine has no GestSync parameters")
        use_t = "t" in modalities
        use_a = "a" in modalities
        kind = self._frames_kind(frames)
        if kind == "planar" and chin_rows is not None:
            raise ClientError("planar input is already masked; "
                              "chin_rows must be None")
        prep = self._prepare_sample(modalities.replace("v", ""), None,
                                    text, word_boundaries, wav)
        if prep is None:
            return None
        arrays, _, w_true = prep
        t = frames.shape[0]
        t_bucket = next_bucket(t, T_BUCKETS)
        if t_bucket != t:
            xp = jnp if isinstance(frames, jax.Array) else np
            frames = xp.concatenate(
                [frames, xp.repeat(frames[-1:], t_bucket - t, axis=0)],
                axis=0)
        if kind == "planar":
            cut = None
        else:
            from jegal_tpu.ops.video import FALLBACK_ROWS

            cr = (np.asarray(chin_rows, np.int32) if chin_rows is not None
                  else np.full((t,), FALLBACK_ROWS, np.int32))
            cut = np.concatenate(
                [cr, np.full(t_bucket - t, cr[-1], np.int32)])
        vmask = np.zeros((1, t_bucket), np.float32)
        vmask[0, :t] = 1.0
        key = self._fused_key(kind, use_t, use_a, batched=False)
        self._account_graph(key, dict(arrays, frames=frames))
        packed = self._fetch(self._combo_cache[key](
            self.gestsync_params, self.jegal_params, self.roberta_params,
            frames, cut, vmask, **arrays))
        gesture, content = self._unpack_emb(packed, t_bucket, True,
                                            use_t or use_a)
        return self._postprocess(gesture, content, 0, t, w_true, text,
                                 word_boundaries, fname)

    # ------------------------------------------------------------------
    # Host-side preparation per modality
    # ------------------------------------------------------------------

    def prepare_text(self, text: str):
        """-> (arrays dict, num_words) with bucket padding; None if the
        sample is invalid under reference rules (tokenizer/word mismatch).

        Arrays are HOST numpy (already in engine dtype): per-sample prep
        must not touch the device — each eager jnp op costs a dispatch
        (and a compile on first shape) per sample; batching uploads once
        per chunk instead (VERDICT r4 weak 2)."""
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (text modality)")
        with self._tok_lock:  # HF tokenizer is not thread-safe (see init)
            batch = self.tokenizer.encode_words([text])
        s_nat = batch.input_ids.shape[1]
        starts = P.text_word_starts(batch.input_ids, batch.offsets, batch.special_ids)
        n_words = len(batch.words[0])
        w_bucket = next_bucket(max(n_words, 1), W_BUCKETS)
        pool, valid, _ = P.build_text_pooling(starts, [n_words], s_nat, w_bucket)
        if not valid[0]:
            return None, 0
        s_bucket = next_bucket(s_nat, S_BUCKETS)
        ids = pad_axis(batch.input_ids, 1, s_bucket, value=self.tokenizer.pad_id)
        mask = pad_axis(batch.attention_mask, 1, s_bucket)
        pool = pad_axis(pool, 2, s_bucket)
        return {
            "input_ids": np.asarray(ids, np.int32),
            "text_mask": np.asarray(mask, np.float32),
            "text_pool": np.asarray(pool).astype(self._np_dtype, copy=False),
        }, n_words

    def prepare_audio(self, wav: np.ndarray, word_boundaries):
        """wav: (S,) float32 raw int16 scale -> (arrays dict, num_words).
        Host numpy throughout (see prepare_text): the mel runs on host
        (ops/audio.wav2filterbanks_np) — the jnp mel cost one XLA compile
        per distinct wav length plus a device round-trip PER SAMPLE."""
        from jegal_tpu.ops.audio import wav2filterbanks_np

        mel = wav2filterbanks_np(wav)
        t_mel = mel.shape[1]
        # token count of the audio CNN (two stride-2 convs with k=3, p=1):
        # (t-1)//4 + 1 — NOT t//4 (the reference's audio_mask uses floor but
        # its conv output, which pooling indexes, has the extra token
        # whenever t_mel % 4 != 0)
        t_audio = (t_mel - 1) // 4 + 1
        n_words = len(word_boundaries)
        w_bucket = next_bucket(max(n_words, 1), W_BUCKETS)
        pool, valid, _ = P.build_audio_pooling([word_boundaries], t_audio, w_bucket)
        if not valid[0]:
            return None, 0
        mel_bucket = next_bucket(t_mel, MEL_BUCKETS)
        mel = pad_axis(mel, 1, mel_bucket)
        pool = pad_axis(pool, 2, mel_bucket // 4)
        return {
            "audio_mel": mel.astype(self._np_dtype, copy=False),
            "audio_pool": np.asarray(pool).astype(self._np_dtype, copy=False),
            "audio_valid": np.asarray([t_mel], np.int32),
        }, n_words

    @property
    def _np_dtype(self):
        """Engine compute dtype as a numpy dtype (ml_dtypes handles bf16) —
        host prep casts BEFORE upload so a bf16 engine moves half the
        bytes and the jit signature matches the device graph."""
        return np.dtype(self.dtype)

    def prepare_visual(self, visual_feats: np.ndarray):
        """visual_feats: (T, 1024) GestSync features -> arrays dict. Host
        numpy for host inputs; device-resident features stay on device
        (padded with jnp — fetching them would re-introduce the round trip
        the on-device feature path exists to avoid)."""
        t = visual_feats.shape[0]
        t_bucket = next_bucket(t, T_BUCKETS)
        feats = pad_axis(visual_feats[None], 1, t_bucket)
        mask = np.zeros((1, t_bucket), np.float32)
        mask[0, :t] = 1.0
        if isinstance(feats, jax.Array):
            if feats.dtype != self.dtype:
                feats = feats.astype(self.dtype)
        else:
            feats = np.asarray(feats).astype(self._np_dtype, copy=False)
        return {
            "visual_feats": feats,
            "visual_mask": mask,
        }, t

    # ------------------------------------------------------------------
    # Public extraction API
    # ------------------------------------------------------------------

    def _prepare_sample(self, modalities, visual_feats=None, text=None,
                        word_boundaries=None, wav=None):
        """-> (arrays dict, t_true, w_true) or None if invalid."""
        use_v = "v" in modalities
        use_t = "t" in modalities
        use_a = "a" in modalities
        arrays: dict = {}
        t_true = w_true = None

        if use_v:
            if visual_feats is None:
                raise ClientError("modality 'v' requires visual_feats")
            # device-resident features validate by metadata only: np.asarray
            # on a jax.Array would fetch (T, 1024) floats to host — the
            # round trip the on-device feature path exists to avoid
            vf = (visual_feats if isinstance(visual_feats, jax.Array)
                  else np.asarray(visual_feats))
            # jnp.issubdtype, not np: a bf16 engine's own features are
            # ml_dtypes.bfloat16 numpy arrays, which numpy does not class
            # under np.number (r4 on-chip drive caught the rejection)
            if vf.ndim != 2 or vf.shape[1] != 1024 or vf.shape[0] == 0 \
                    or not jnp.issubdtype(vf.dtype, jnp.number):
                # validated HERE so malformed client tensors surface as
                # 400s; ValueErrors deeper in the engine are server faults
                raise ClientError(
                    f"visual_feats must be a non-empty (T, 1024) numeric "
                    f"array, got shape {vf.shape} dtype {vf.dtype}")
            va, t_true = self.prepare_visual(vf)
            arrays.update(va)
        if use_t:
            if text is None:
                raise ClientError("modality 't' requires text")
            if not isinstance(text, str) or not text.strip():
                raise ClientError("text must be a non-empty string")
            ta, n_words = self.prepare_text(text)
            if ta is None:
                return None
            arrays.update(ta)
            w_true = n_words
        if use_a:
            if wav is None or word_boundaries is None:
                raise ClientError("modality 'a' requires wav and word_boundaries")
            wv = np.asarray(wav)
            if wv.ndim != 1 or wv.size < 640 \
                    or not np.issubdtype(wv.dtype, np.number):
                raise ClientError(
                    f"wav must be a 1-D numeric array of >= 640 samples "
                    f"(one 40 ms frame at 16 kHz), got shape {wv.shape} "
                    f"dtype {wv.dtype}")
            try:
                wbs_ok = all(len(w) >= 3 and float(w[1]) <= float(w[2])
                             for w in word_boundaries)
            except (TypeError, ValueError, KeyError):
                wbs_ok = False
            if not wbs_ok or len(word_boundaries) == 0:
                raise ClientError(
                    "word_boundaries must be a non-empty list of "
                    "(word, start, end) with start <= end")
            aa, n_words = self.prepare_audio(wv.astype(np.float32),
                                             word_boundaries)
            if aa is None:
                return None
            arrays.update(aa)
            # When text is also present, the two pooling matrices must agree
            # on the word count: the reference fails loudly on a torch.cat
            # shape mismatch (models/jegal.py:407-408) if the phrase's word
            # count differs from len(word_boundaries). Reject the sample
            # rather than silently fusing one modality with zero rows.
            if w_true is not None and n_words != w_true:
                return None
            w_true = n_words if w_true is None else w_true

        # align text/audio word-bucket if both present (host numpy — the
        # pools come out of prepare_text/prepare_audio as numpy)
        if use_t and use_a:
            wt = arrays["text_pool"].shape[1]
            wa = arrays["audio_pool"].shape[1]
            w = max(wt, wa)
            arrays["text_pool"] = pad_axis(arrays["text_pool"], 1, w)
            arrays["audio_pool"] = pad_axis(arrays["audio_pool"], 1, w)
        return arrays, t_true, w_true

    @staticmethod
    def _pack_emb(gesture, content):
        """IN-GRAPH: pack forward_inference's (gesture, content) pair into
        ONE array along the row axis so a chunk's results come back in a
        single device->host RPC. Every fetch pays the platform's per-call
        sync floor on top of bytes (BENCH platform_sync_floor_ms; two
        fetches per chunk were ~55% of the warm corpus wall in the r5
        profile) — the concat is a ~2 MB on-device copy XLA folds into the
        producers. The host splits at the caller-known T bucket
        (_unpack_emb); combos with one branch return that branch alone."""
        if gesture is None:
            return content
        if content is None:
            return gesture
        return jnp.concatenate([gesture, content], axis=1)

    @staticmethod
    def _unpack_emb(packed, t_split, has_gesture, has_content):
        """Host-side inverse of _pack_emb on the fetched numpy array:
        gesture rows are the first t_split (= the combo's T bucket)."""
        if not has_content:
            return packed, None
        if not has_gesture:
            return None, packed
        return packed[:, :t_split], packed[:, t_split:]

    @staticmethod
    def _fetch(packed):
        """ONE host fetch (single RPC, single sync) for a dispatched
        chunk's packed outputs -> numpy. All per-sample slicing then
        happens in numpy: slicing a jax.Array per sample (`x[i, :n]`)
        compiles and dispatches one tiny XLA graph per distinct (i, n) —
        240 compiles / 229 s of a 48-row corpus run in the r4 profile
        (VERDICT r4 weak 2a). Fetches in the DEVICE dtype (bf16 engines
        move half the bytes); _postprocess converts to the f32 .pkl
        contract on host."""
        return jax.device_get(packed)

    @staticmethod
    def _postprocess(gesture, content, i, t_true, w_true, text,
                     word_boundaries, fname):
        """Slice the sample's valid rows (HOST numpy — see _fetch) and
        L2-normalize IN FLOAT32 ON HOST: a bf16 engine normalizing on device
        leaves row norms at 1 +- 0.4% (bf16 rsqrt/divide rounding), which
        shifts the downstream spotting/ASD logits (G @ C^T / 0.07) — the
        .pkl contract is exactly unit-norm float32 rows (reference
        inference_embs.py:629-646)."""
        def norm_rows(x, n):
            out = np.asarray(x[i, :n], np.float32)
            return out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)

        out_g = None if gesture is None else norm_rows(gesture, t_true)
        out_c = None if content is None else norm_rows(content, w_true)
        info = {"fname": fname, "word_boundaries": word_boundaries,
                "text": text}
        return {"gesture_emb": out_g, "content_emb": out_c, "info": info}

    def extract(
        self,
        modalities: str = "vta",
        visual_feats: np.ndarray | None = None,
        text: str | None = None,
        word_boundaries: list | None = None,
        wav: np.ndarray | None = None,
        fname: str | None = None,
        frames: np.ndarray | None = None,
        chin_rows: np.ndarray | None = None,
    ) -> dict | None:
        """-> {"gesture_emb": (T,512) | None, "content_emb": (W,512) | None,
        "info": {...}} with L2-normalized float32 numpy embeddings
        (reference .pkl schema, inference_embs.py:629-646).

        For 'v' combos, pass EITHER precomputed visual_feats (T, 1024) OR
        decoder frames ((T, 270, 480, 3) raw uint8 + optional chin_rows, or
        (T, 90, 27, 160) host-repacked planar uint8) — frames run the FUSED
        single-dispatch path: GestSync tower + JEGAL forward as ONE jit,
        with no features round-tripping through host between stages
        (the two-stage path's device->host->device fetch cost more than the
        whole graph on slow-fetch links — docs/ARCHITECTURE.md).

        Returns None when the sample is invalid under reference rules.
        """
        if frames is not None:
            if "v" not in modalities:
                raise ClientError("frames given but modalities lack 'v'")
            if visual_feats is not None:
                raise ClientError(
                    "pass either frames or visual_feats, not both")
            return self._extract_fused(modalities, frames, chin_rows, text,
                                       word_boundaries, wav, fname)
        if chin_rows is not None:
            raise ClientError("chin_rows requires frames")
        prep = self._prepare_sample(modalities, visual_feats, text,
                                    word_boundaries, wav)
        if prep is None:
            return None
        arrays, t_true, w_true = prep
        use = ("v" in modalities, "t" in modalities, "a" in modalities)
        packed = self._fetch(self._forward(use, arrays))
        gesture, content = self._unpack_emb(
            packed, arrays["visual_feats"].shape[1] if use[0] else None,
            use[0], use[1] or use[2])
        return self._postprocess(gesture, content, 0, t_true, w_true, text,
                                 word_boundaries, fname)

    @staticmethod
    def _stack_parts(parts, b, mesh):
        """Stack per-sample arrays into a (b, ...) batch, zero-padding to b.
        Device-resident parts (on-device feature path) stack with jnp — no
        host round trip; host parts stack in np and ride ONE (optionally
        'data'-sharded) device_put."""
        if mesh is None and any(isinstance(p, jax.Array) for p in parts):
            parts = [jnp.asarray(p) for p in parts]
            while len(parts) < b:
                parts.append(jnp.zeros_like(parts[0]))
            return jnp.stack(parts)
        parts = [np.asarray(p) for p in parts]
        while len(parts) < b:
            parts.append(np.zeros_like(parts[0]))
        from jegal_tpu.parallel.mesh import put_batch

        out, = put_batch((np.stack(parts),), mesh)
        return out

    def _prep_map(self, fn, items):
        """Order-preserving map over per-sample host prep. Small batches
        (the serving batcher's ~20 ms windows) run inline — spawning and
        joining a pool per call would cost more than it saves; larger
        corpora share ONE lazily-created 4-worker pool for the engine's
        lifetime (prep is host numpy; FFT/BLAS release the GIL)."""
        if len(items) <= 4:
            return [fn(t) for t in items]
        if self._prep_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._prep_pool = ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="jegal-prep")
        return list(self._prep_pool.map(fn, items))

    @staticmethod
    def _pipeline(dispatches, settle, chunk_label=None):
        """Depth-1 software pipeline: chunk k+1 is assembled, uploaded, and
        dispatched BEFORE chunk k's outputs are fetched, so host stacking +
        host->device transfer overlap the previous chunk's device compute
        instead of serializing behind its fetch. The ONE definition of the
        drain-last-chunk invariant (extract_many, _extract_many_fused,
        gestsync_features_from_raw_many — ADVICE r4 item 2).

        dispatches: iterator yielding (chunk_idx, *dispatched_outputs);
        settle(*item) fetches + postprocesses (the sync point). With
        pipelining a settle error surfaces one chunk late, so failures are
        annotated with the failing chunk's sample labels (ADVICE r4 item 3);
        chunk_label maps a chunk's index list to that string."""
        def guarded(item):
            try:
                settle(*item)
            except Exception as e:
                if chunk_label is not None and hasattr(e, "add_note"):
                    e.add_note("while settling pipelined chunk "
                               + chunk_label(item[0]))
                raise

        inflight = None
        for item in dispatches:
            if inflight is not None:
                guarded(inflight)
            inflight = item
        if inflight is not None:
            guarded(inflight)

    @staticmethod
    def _chunk_fnames(samples):
        """chunk_label factory for _pipeline: sample indices -> fnames."""
        def label(chunk):
            return str([samples[i].get("fname") or f"#{i}" for i in chunk])

        return label

    def _chunk_b(self, n: int, batch_size: int, ladder: bool, mesh) -> int:
        """Padded batch length for an n-sample chunk: pow-2 ladder when
        right-sizing stragglers is allowed, rounded to a 'data'-axis
        multiple under a mesh."""
        b = _batch_ladder(n, batch_size) if ladder else batch_size
        if mesh is not None:
            d = mesh.shape.get("data", 1)
            b = ((max(b, n) + d - 1) // d) * d
        return b

    def extract_many(self, samples: list[dict], modalities: str = "vta",
                     batch_size: int = 16, mesh=None,
                     ladder: bool = True) -> list[dict | None]:
        """Batched extraction: samples sharing a shape bucket run as one
        device batch (optionally sharded over the mesh 'data' axis — the
        pjit data-parallel path for v5e-8 batch sweeps).

        samples: dicts with visual_feats/text/word_boundaries/wav/fname;
        for 'v' combos a sample may instead carry decoder frames ("frames"
        (T, 270, 480, 3) raw / (T, 90, 27, 160) planar uint8 + optional
        "chin_rows"), which run the FUSED batched path: tower + JEGAL
        forward as ONE dispatch per chunk, features never leaving the
        device (VERDICT r3 item 1). Returns per-sample result dicts (None
        for invalid samples), numerically identical to per-sample extract
        (batch padding is exactly neutral).

        ladder=True right-sizes straggler chunks to the pow-2 ladder
        (less tail compute, <= log2 graphs per sig — the batch-corpus
        default). ladder=False always pads to batch_size: ONE graph per
        sig, for latency-bound callers that precompiled it (the serving
        batcher warms exactly batch_size and must never compile a new
        ladder size inside a live request).
        """
        use = ("v" in modalities, "t" in modalities, "a" in modalities)
        results: list = [None] * len(samples)

        # --- fused path: samples that arrived as frames ---
        if use[0] and self.gestsync_params is None and any(
                s.get("visual_feats") is None and s.get("frames") is not None
                for s in samples):
            # server misconfiguration, not a bad sample: fail loudly
            raise RuntimeError("engine has no GestSync parameters")
        fused: dict[int, tuple] = {}
        is_fused = [use[0] and self.gestsync_params is not None
                    and s.get("visual_feats") is None
                    and s.get("frames") is not None
                    for s in samples]

        def prep_fused(s):
            try:
                frames = s["frames"]
                if not isinstance(frames, jax.Array):
                    frames = np.asarray(frames)
                kind = self._frames_kind(frames)
                chin = s.get("chin_rows")
                if kind == "planar" and chin is not None:
                    raise ClientError("planar input is already masked; "
                                      "chin_rows must be None")
                prep = self._prepare_sample(
                    modalities.replace("v", ""), None, s.get("text"),
                    s.get("word_boundaries"), s.get("wav"))
            except ClientError:
                return None  # ledgered as a None result (batch contract)
            return (None if prep is None
                    else (kind, frames, chin, prep[0], prep[2]))

        def prep_two_stage(s):
            try:
                # same input contract as single-sample extract(): frames
                # with a non-'v' combo, frames+visual_feats together, or
                # chin_rows without frames are client errors — under the
                # batch contract they map to a None result, never to a
                # silently-ignored tensor
                if s.get("frames") is not None:
                    if not use[0]:
                        raise ClientError(
                            "frames given but modalities lack 'v'")
                    raise ClientError(
                        "pass either frames or visual_feats, not both")
                if s.get("chin_rows") is not None:
                    raise ClientError("chin_rows requires frames")
                return self._prepare_sample(
                    modalities, s.get("visual_feats"), s.get("text"),
                    s.get("word_boundaries"), s.get("wav"))
            except ClientError:
                # batch contract: one malformed sample maps to a None
                # result (ledgered by the CLI drivers), never fails the
                # corpus run; single-sample extract() keeps raising so
                # serving can answer 400
                return None

        # per-sample host prep in a thread pool: the mel FFT and the
        # pooling/BLAS work release the GIL, so 4 workers cut the serial
        # prep wall ~2-3x on big chunks (prep was ~25% of the warm corpus
        # wall in the r5 profile); order is preserved by executor.map
        preps = self._prep_map(
            lambda t: prep_fused(t[1]) if is_fused[t[0]]
            else prep_two_stage(t[1]), list(enumerate(samples)))
        prepared = {}
        for i, prep in enumerate(preps):
            if is_fused[i]:
                fused[i] = prep
            else:
                prepared[i] = prep
        if fused:
            self._extract_many_fused(samples, fused, use, results,
                                     batch_size, mesh, ladder)

        # group compatible shapes
        groups: dict = {}
        for idx, prep in prepared.items():
            if prep is None:
                continue
            sig = tuple(sorted((k, tuple(v.shape[1:]))
                               for k, v in prep[0].items()))
            groups.setdefault(sig, []).append(idx)

        def settle(chunk, packed):
            """ONE fetch (single RPC) + numpy postprocess per chunk."""
            packed = self._fetch(packed)
            t_split = (prepared[chunk[0]][0]["visual_feats"].shape[1]
                       if use[0] else None)
            gesture, content = self._unpack_emb(packed, t_split, use[0],
                                                use[1] or use[2])
            for bi, i in enumerate(chunk):
                _, t_true, w_true = prepared[i]
                s = samples[i]
                results[i] = self._postprocess(
                    gesture, content, bi, t_true, w_true, s.get("text"),
                    s.get("word_boundaries"), s.get("fname"))

        def dispatches():
            for idxs in groups.values():
                for lo in range(0, len(idxs), batch_size):
                    chunk = idxs[lo : lo + batch_size]
                    # pow-2 ladder: a straggler chunk compiles/pays a
                    # right-sized graph (<= log2 graphs per (combo, sig)),
                    # not a full batch
                    b = self._chunk_b(len(chunk), batch_size, ladder, mesh)
                    keys = prepared[chunk[0]][0].keys()
                    arrays = {
                        kname: self._stack_parts(
                            [prepared[i][0][kname][0] for i in chunk], b,
                            mesh)
                        for kname in keys}
                    yield (chunk, self._forward(use, arrays))

        self._pipeline(dispatches(), settle, self._chunk_fnames(samples))
        return results

    def _extract_many_fused(self, samples, fused, use, results,
                            batch_size, mesh, ladder):
        """extract_many's frames-carrying samples: per (kind, T-bucket,
        content-sig) chunk, ONE fused dispatch (batched tower + batched
        JEGAL forward — bench.py's build_batched pipeline as an engine
        path). Writes into `results` in place."""
        from jegal_tpu.ops.video import FALLBACK_ROWS

        fgroups: dict = {}
        for i, prep in fused.items():
            if prep is None:
                continue
            kind, frames, _, arrays, _ = prep
            sig = (kind, next_bucket(frames.shape[0], T_BUCKETS),
                   tuple(sorted((k, tuple(v.shape[1:]))
                                for k, v in arrays.items())))
            fgroups.setdefault(sig, []).append(i)

        def settle(chunk, t_bucket, packed):
            packed = self._fetch(packed)
            gesture, content = self._unpack_emb(packed, t_bucket, True,
                                                use[1] or use[2])
            for bi, i in enumerate(chunk):
                _, frames, _, _, w_true = fused[i]
                s = samples[i]
                results[i] = self._postprocess(
                    gesture, content, bi, frames.shape[0], w_true,
                    s.get("text"), s.get("word_boundaries"),
                    s.get("fname"))

        # depth-1 pipeline: the NEXT chunk's (large) frames upload overlaps
        # the current chunk's fused tower+forward compute (see _pipeline)
        def dispatches():
            for (kind, t_bucket, _), idxs in fgroups.items():
                shape = (90, 27, 160) if kind == "planar" else (270, 480, 3)
                for lo in range(0, len(idxs), batch_size):
                    chunk = idxs[lo : lo + batch_size]
                    b = self._chunk_b(len(chunk), batch_size, ladder, mesh)
                    fr = np.zeros((b, t_bucket) + shape, np.uint8)
                    cut = np.full((b, t_bucket), FALLBACK_ROWS, np.int32)
                    vmask = np.zeros((b, t_bucket), np.float32)
                    for bi, i in enumerate(chunk):
                        _, frames, chin, _, _ = fused[i]
                        frames = np.asarray(frames)
                        t = frames.shape[0]
                        fr[bi, :t] = frames
                        fr[bi, t:] = frames[-1]  # edge-repeat to the bucket
                        vmask[bi, :t] = 1.0
                        if chin is not None:
                            chin = np.asarray(chin, np.int32)
                            cut[bi, :t] = chin
                            cut[bi, t:] = chin[-1]
                    keys = list(fused[chunk[0]][3].keys())
                    from jegal_tpu.parallel.mesh import put_batch

                    frj, cutj, vmaskj = put_batch((fr, cut, vmask), mesh)
                    arrays = {
                        kname: self._stack_parts(
                            [fused[i][3][kname][0] for i in chunk], b, mesh)
                        for kname in keys}
                    key = self._fused_key(kind, use[1], use[2], batched=True,
                                          mesh=mesh)
                    self._account_graph(key, dict(arrays, frames=frj))
                    yield (chunk, t_bucket, self._combo_cache[key](
                        self.gestsync_params, self.jegal_params,
                        self.roberta_params, frj, cutj, vmaskj, **arrays))

        self._pipeline(dispatches(), settle, self._chunk_fnames(samples))

    def warmup(self, modalities: str = "vta", t: int = 128, s: int = 64,
               w: int = 16, mel: int = 512, batch: int = 1,
               mesh=None, frames_kind: str | None = None) -> None:
        """Precompile the jit graph for one (combo, bucket) so the first real
        request doesn't pay compile latency (serving warm-start; pairs with
        the persistent compilation cache). Shapes are bucket values from
        jegal_tpu.data.bucketing.

        mesh: warm the DATA-SHARDED graph instead — jit executables are
        keyed by input sharding, so a --data_parallel server warmed with
        replicated inputs would still compile the sharded graph inside the
        first live request. batch is rounded up to a multiple of the
        'data' axis size (matching extract_many's rounding).

        frames_kind ('planar' | 'raw'): warm the FUSED frames->embeddings
        graph instead of the two-stage forward — batch==1 without a mesh
        warms the single-clip fused graph (serving without a batcher /
        CLI infer), otherwise the batched fused graph (extract_many /
        serving batcher).

        Array PLACEMENT here must mirror the live paths exactly: jit
        executables are keyed on committed-ness as well as shape/dtype, so
        a warmup that passes committed jnp arrays where live traffic passes
        host numpy (single-sample prep is host numpy end-to-end since the
        eager-op-storm fix) warms a graph no request ever hits and the
        first live request still pays the compile. Single-sample graphs
        therefore take HOST numpy (matching _prepare_sample /
        _extract_fused); batched graphs go through put_batch (matching
        _stack_parts / _extract_many_fused), which commits to device with
        or without a mesh."""
        from jegal_tpu.parallel.mesh import put_batch

        use_v = "v" in modalities
        use_t = "t" in modalities
        use_a = "a" in modalities
        if mesh is not None:
            d = mesh.shape.get("data", 1)
            batch = ((batch + d - 1) // d) * d
        batched = batch > 1 or mesh is not None

        def content_arrays():
            arrays: dict = {}
            if use_t:
                ids = np.full((batch, s), 1, np.int32)
                ids[:, 0] = 0
                arrays["input_ids"] = ids
                arrays["text_mask"] = (ids != 1).astype(np.float32)
                arrays["text_pool"] = np.zeros((batch, w, s), self._np_dtype)
            if use_a:
                arrays["audio_mel"] = np.zeros((batch, mel, 80),
                                               self._np_dtype)
                arrays["audio_pool"] = np.zeros((batch, w, mel // 4),
                                                self._np_dtype)
                arrays["audio_valid"] = np.full((batch,), mel, np.int32)
            return arrays

        if frames_kind is not None:
            if not use_v:
                raise ValueError("frames_kind requires a 'v' combo")
            from jegal_tpu.ops.video import FALLBACK_ROWS

            shape = ((90, 27, 160) if frames_kind == "planar"
                     else (270, 480, 3))
            arrays = content_arrays()
            if not batched:
                frames = np.zeros((t,) + shape, np.uint8)
                cut = (None if frames_kind == "planar"
                       else np.full((t,), FALLBACK_ROWS, np.int32))
                vmask = np.ones((1, t), np.float32)
            else:
                frames = np.zeros((batch, t) + shape, np.uint8)
                cut = np.full((batch, t), FALLBACK_ROWS, np.int32)
                vmask = np.ones((batch, t), np.float32)
                frames, cut, vmask = put_batch((frames, cut, vmask), mesh)
                arrays = dict(zip(arrays,
                                  put_batch(list(arrays.values()), mesh)))
            key = self._fused_key(frames_kind, use_t, use_a,
                                  batched=batched, mesh=mesh)
            self._account_graph(key, dict(arrays, frames=frames))
            out = self._combo_cache[key](
                self.gestsync_params, self.jegal_params,
                self.roberta_params, frames, cut, vmask, **arrays)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf).ravel()[:1]  # force compile + execute
            return
        arrays = content_arrays()
        if use_v:
            arrays["visual_feats"] = np.zeros((batch, t, 1024),
                                              self._np_dtype)
            arrays["visual_mask"] = np.ones((batch, t), np.float32)
        if batched:
            arrays = dict(zip(arrays, put_batch(list(arrays.values()), mesh)))
        out = self._forward((use_v, use_t, use_a), arrays)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf).ravel()[:1]  # force compile + execute

    def warmup_all(self, combos=("vta", "vt", "va", "ta", "v", "t", "a"),
                   t_buckets=(128,), s_buckets=(64,), w_buckets=(16,),
                   mel_buckets=(512,), batch: int = 1) -> list[dict]:
        """Precompile the full serving surface: every modality combo at the
        given shape buckets (cross product per combo's relevant axes).
        Returns one record per graph with its compile+execute seconds —
        the warm-start budget table for docs/DEPLOYMENT.md."""
        import itertools
        import time

        records = []
        for combo in combos:
            axes: dict = {}
            if "v" in combo:
                axes["t"] = t_buckets
            if "t" in combo:
                axes["s"] = s_buckets
                axes["w"] = w_buckets
            if "a" in combo:
                axes["w"] = w_buckets
                axes["mel"] = mel_buckets
            keys = sorted(axes)
            for shape in itertools.product(*(axes[k] for k in keys)):
                kw = dict(zip(keys, shape))
                t0 = time.perf_counter()
                self.warmup(modalities=combo, batch=batch, **kw)
                records.append({"combo": combo, **kw, "batch": batch,
                                "seconds": round(time.perf_counter() - t0, 3)})
        return records

    def extract_to_pkl(self, res_dir: str, **kw) -> str | None:
        feats = self.extract(**kw)
        if feats is None:
            return None
        os.makedirs(res_dir, exist_ok=True)
        out = os.path.join(res_dir, (feats["info"]["fname"] or "sample") + ".pkl")
        with open(out, "wb") as f:
            pickle.dump(feats, f)
        return out
