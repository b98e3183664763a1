"""Full-size Pallas stem parity on the real chip (slow suite).

Pins the production path — fused mask+s2d repack -> Pallas stem kernel ->
m-grid dilated conv2 -> blocks 3-6 -> window head — against the XLA tower
at the real 270x480 geometry in bf16. Skipped on CPU (the kernel only
compiles for TPU; the interpret-mode logic is covered by
test_stem_pallas.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.models import gestsync as G

pytestmark = pytest.mark.slow


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
def test_full_size_parity_bf16():
    rng = np.random.default_rng(0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          G.init_params(jax.random.PRNGKey(0)))
    frames = jnp.asarray(rng.random((53, 270, 480, 3), np.float32),
                         jnp.bfloat16)

    def ref_fn(f):
        tokens = G.conv_tokens(params, f, chunk=160, use_pallas=False)
        return G.window_head(params, tokens)

    ref = np.asarray(jax.jit(ref_fn)(frames), np.float32)

    from jegal_tpu.ops.pallas.stem import s2d_lanes

    out = np.asarray(jax.jit(
        lambda f: G.extract_features_x(params, s2d_lanes(f), chunk=160)
    )(frames), np.float32)

    assert ref.shape == out.shape == (53 - 24, 1024)
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-12)
    # bf16-vs-bf16 with different (more accurate) stem accumulation
    assert cos.min() > 1 - 1e-4, cos.min()


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
def test_batch_raw_equals_per_video_bf16():
    """The fused-chunk batched raw path (uint8 in, mask+s2d inside the
    chunk loop) must equal the per-video raw path clip by clip."""
    from jegal_tpu.ops.video import mask_frames_s2d

    rng = np.random.default_rng(1)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          G.init_params(jax.random.PRNGKey(1)))
    frames = jnp.asarray(rng.integers(0, 255, (2, 17, 270, 480, 3)),
                         jnp.uint8)
    cut = jnp.asarray(rng.integers(90, 140, (2, 17)), jnp.int32)

    batched = np.asarray(jax.jit(
        lambda f, c: G.extract_features_batch_raw(params, f, c, chunk=160)
    )(frames, cut), np.float32)
    assert batched.shape == (2, 17, 1024)

    single = jax.jit(lambda f, c: G.extract_features_x(
        params, mask_frames_s2d(f, c), chunk=160))
    for b in range(2):
        ref = np.asarray(single(frames[b], cut[b]), np.float32)
        np.testing.assert_allclose(batched[b], ref, atol=2e-2, rtol=2e-2)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
def test_f32_stem_compiles_and_matches_planar():
    """f32 engines on chip: t_blk is halved for 4-byte dtypes so the stem
    kernel stays inside the scoped VMEM stack (t_blk=16 @ f32 needs
    18.75 MB > the ~18 MB limit and fails to compile — regression). Also
    pins the host-repacked planar input path == raw path at f32."""
    from jegal_tpu.host import media
    from jegal_tpu.ops.video import mask_frames_s2d, s2d_from_planar

    rng = np.random.default_rng(2)
    params = G.init_params(jax.random.PRNGKey(2))
    frames = rng.integers(0, 255, (20, 270, 480, 3)).astype(np.uint8)
    cut = rng.integers(90, 140, (20,)).astype(np.int32)

    raw = np.asarray(jax.jit(lambda f, c: G.extract_features_x(
        params, mask_frames_s2d(f, c, dtype=jnp.float32), chunk=160)
    )(jnp.asarray(frames), jnp.asarray(cut)))
    assert raw.shape == (20, 1024) and np.isfinite(raw).all()

    planar = jnp.asarray(media.s2d_repack(frames, cut))
    pl_out = np.asarray(jax.jit(lambda p: G.extract_features_x(
        params, s2d_from_planar(p, dtype=jnp.float32), chunk=160))(planar))
    np.testing.assert_allclose(pl_out, raw, rtol=2e-5, atol=2e-5)

    # uint8-ingesting stem kernel (stem_mgrid_planar: bytes DMA'd into the
    # kernel, cast in VMEM, /255 folded into lhs) — the production planar
    # path; f32 also pins the halved-t_blk u8 geometry on real hardware
    u8_out = np.asarray(jax.jit(lambda p: G.extract_features_planar(
        params, p, chunk=160, dtype=jnp.float32))(planar))
    # tolerance: the /255 fold moves one rounding site into the conv
    # weights, and the MXU's DEFAULT f32 precision (bf16 passes; the kernel
    # cannot request HIGHEST — Mosaic rejects the multi-pass emulation)
    # amplifies that through the tower to ~6e-4 abs (measured); interpret
    # mode pins the same comparison at 2e-5 in test_stem_pallas.py
    np.testing.assert_allclose(u8_out, raw, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
def test_engine_planar_paths_bf16_on_chip():
    """bf16 engine drive of the uint8-kernel planar paths on real hardware:
    single-clip raw vs planar cosine, and the cross-video batched planar
    tower vs per-clip planar (the extract-feats production path)."""
    from jegal_tpu.api import JegalEngine
    from jegal_tpu.host import media
    from jegal_tpu.models import jegal as J

    rng = np.random.default_rng(7)
    eng = JegalEngine(jegal_params=J.init_params(jax.random.PRNGKey(0)),
                      gestsync_params=G.init_params(jax.random.PRNGKey(1)),
                      dtype=jnp.bfloat16)
    t = 40
    fr = rng.integers(0, 255, (t, 270, 480, 3)).astype(np.uint8)
    chin = rng.integers(90, 140, (t,)).astype(np.int32)
    planar = media.s2d_repack(fr, chin)

    a = np.asarray(eng.gestsync_features(fr, chin), np.float32)
    b = np.asarray(eng.gestsync_features(planar), np.float32)
    assert a.shape == b.shape == (t, 1024)
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 1 - 1e-4, cos

    clips = [(media.s2d_repack(fr[:25 + 5 * i], chin[:25 + 5 * i]), None)
             for i in range(3)]
    outs = eng.gestsync_features_from_raw_many(clips, batch_size=4)
    for i, o in enumerate(outs):
        o = np.asarray(o, np.float32)
        s = np.asarray(eng.gestsync_features(clips[i][0]), np.float32)
        c = float((o * s).sum() / (np.linalg.norm(o) * np.linalg.norm(s)))
        assert o.shape == s.shape and c > 1 - 1e-4, (i, c)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a TPU backend")
def test_u8_direct_bit_equal_on_chip():
    """The production planar default (STEM_U8_DIRECT) fuses the u8 -> i32
    -> bf16 cast into the rhs window copy; Mosaic compiles a different
    copy/cast schedule than the two-pass block-cast form, but the dot
    K-order is identical, so the outputs must be BIT-EQUAL on real
    hardware — full array, both flags, real 270x480-derived geometry.
    (Interpret-mode equality is locked in test_stem_pallas.py; this pins
    the actual Mosaic codegen the flag flips — advisor r5 finding.)"""
    from jegal_tpu.host import media
    from jegal_tpu.ops.pallas import stem as S

    rng = np.random.default_rng(3)
    params = G.init_params(jax.random.PRNGKey(0))
    blk = params["net_vid"][0]
    lhs, scale, bias = S.stem_kernel_params(blk)
    fr = rng.integers(0, 255, (29, 270, 480, 3)).astype(np.uint8)
    chin = rng.integers(90, 140, (29,)).astype(np.int32)
    planar = jnp.asarray(media.s2d_repack(fr, chin))

    outs = {}
    for u8d in (False, True):
        outs[u8d] = np.asarray(jax.jit(
            lambda p, flag=u8d: S.stem_mgrid_planar(
                p, lhs, scale, bias, dtype=jnp.bfloat16, u8_direct=flag)
        )(planar), np.float32)
    assert outs[True].shape == outs[False].shape
    # compare the VALID lanes only (xp's compact width, 160): lanes past
    # w_valid are SLOT padding whose junk content legitimately differs
    # between the two copy schedules and is never read downstream
    w_v = planar.shape[-1]
    np.testing.assert_array_equal(outs[True][..., :w_v],
                                  outs[False][..., :w_v])
