"""Fused Pallas stem kernel: parity vs the XLA conv path (interpret mode).

The kernel replaces the reference stem conv1+BN+ReLU+maxpool
(reference models/gestsync.py:35-45,308-313). Small geometry keeps the
interpreter fast; full-size on-chip parity runs in the slow suite
(test_stem_pallas_chip.py::test_full_size_parity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jegal_tpu.core.layers import batch_norm_inference, conv3d, max_pool3d
from jegal_tpu.models import gestsync as G
from jegal_tpu.ops.pallas import stem as S


@pytest.fixture(scope="module")
def params():
    p = G.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    bn = p["net_vid"][0]["bn"]
    bn["mean"] = jnp.asarray(rng.standard_normal(64), jnp.float32) * 0.1
    bn["var"] = jnp.asarray(rng.random(64) + 0.5, jnp.float32)
    bn["scale"] = jnp.asarray(rng.standard_normal(64), jnp.float32)
    bn["bias"] = jnp.asarray(rng.standard_normal(64), jnp.float32) * 0.1
    return p


def xla_stem(blk, frames):
    y = conv3d(blk["conv"], frames[None], stride=(1, 3, 3), padding=(0, 0, 0))
    y = batch_norm_inference(blk["bn"], y)
    y = jax.nn.relu(y)
    return max_pool3d(y, kernel=(1, 3, 3), stride=(1, 2, 2))[0]


def test_fused_stem_parity_small(params, rng):
    """conv+BN+ReLU+pool == kernel, non-multiple-of-8 t (tail padding)."""
    blk = params["net_vid"][0]
    frames = jnp.asarray(rng.random((13, 54, 96, 3)), jnp.float32)
    ref = np.asarray(xla_stem(blk, frames), np.float32)
    lhs, scale, bias = S.stem_kernel_params(blk)
    out = np.asarray(
        S.fused_stem_pool(frames, lhs, scale, bias, interpret=True),
        np.float32)
    assert ref.shape == out.shape
    np.testing.assert_allclose(ref, out, atol=1e-4, rtol=1e-4)


def test_stem_chunking_is_neutral(params, rng):
    """The temporal chunk loop (4-frame halo) must be exactly neutral for
    the Pallas stem path: 3 chunks of 8 == one chunk. (Full-tower parity at
    the real 270x480 geometry runs on-chip in the slow suite.)"""
    blk = params["net_vid"][0]
    lhs, scale, bias = S.stem_kernel_params(blk)
    frames = jnp.asarray(rng.random((28, 54, 96, 3)), jnp.float32)  # t=24
    x = S.s2d_lanes(frames)

    def mgrid_chunked(x, chunk):
        t_out = x.shape[0] - 4
        num_chunks = -(-t_out // chunk)
        x = jnp.pad(x, ((0, num_chunks * chunk + 4 - x.shape[0]),
                        (0, 0), (0, 0), (0, 0)))
        outs = [
            S.stem_mgrid_x(x[i * chunk:(i + 1) * chunk + 4],
                           lhs, scale, bias, interpret=True)
            for i in range(num_chunks)
        ]
        return jnp.concatenate(outs, axis=0)[:t_out]

    one = np.asarray(mgrid_chunked(x, 24), np.float32)
    three = np.asarray(mgrid_chunked(x, 8), np.float32)
    # compare the m-grid's readable lanes only: the kernel's cross-frame
    # lane rolls contaminate conv lanes >= w_v-2 (hence pooled lanes
    # >= w_v-4) with the frame's T_BLK-block neighbor, which legitimately
    # depends on the chunking; consumers never read past lane 2*(w_pool-1)
    # <= w_v-5 (see _stem_kernel roll comment / mgrid_conv2).
    w_v = 160  # stem_mgrid_x default used above
    np.testing.assert_array_equal(one[..., :w_v - 4], three[..., :w_v - 4])


def test_conv_tokens_pallas_shape_with_tail_chunk(params):
    """conv_tokens must honor its (T_pad - 4, 512) contract on the Pallas
    path when t_out > chunk and t_out % chunk != 0 (regression: the branch
    once ran after chunk padding, inflating the output with garbage tail
    tokens at the 256/512 T buckets)."""
    frames = jax.ShapeDtypeStruct((204, 270, 480, 3), jnp.float32)
    out = jax.eval_shape(
        lambda f: G.conv_tokens(params, f, chunk=160, use_pallas=True),
        frames)
    assert out.shape == (200, 512)


def test_mask_frames_s2d_matches_separate(rng):
    """Fused mask+repack == mask_frames_device followed by s2d_lanes."""
    from jegal_tpu.ops.video import mask_frames_device, mask_frames_s2d

    u8 = jnp.asarray(rng.integers(0, 255, (7, 270, 480, 3)).astype(np.uint8))
    y2 = jnp.asarray(rng.integers(90, 140, (7,)), jnp.int32)
    a = np.asarray(S.s2d_lanes(
        mask_frames_device(u8, y2).astype(jnp.float32)))
    b = np.asarray(mask_frames_s2d(u8, y2, dtype=jnp.float32))
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_mgrid_conv2_matches_decimated_conv(params, rng):
    """Layer-2 dilated conv over the m-grid == plain conv over the
    decimated NHWC stem output."""
    blk = params["net_vid"][0]
    blk2 = params["net_vid"][1]
    frames = jnp.asarray(rng.random((9, 54, 96, 3)), jnp.float32)
    lhs, scale, bias = S.stem_kernel_params(blk)
    w_pool = (96 // 3 - 5) // 2 + 1
    m = S.stem_mgrid(frames, lhs, scale, bias, interpret=True)
    via_mgrid = np.asarray(
        S.mgrid_conv2(m, blk2["conv"]["kernel"][0], w_pool), np.float32)

    dec = S.fused_stem_pool(frames, lhs, scale, bias, interpret=True)
    via_plain = np.asarray(jax.lax.conv_general_dilated(
        dec, blk2["conv"]["kernel"][0], window_strides=(2, 2),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), np.float32)
    np.testing.assert_allclose(via_plain, via_mgrid, atol=1e-5, rtol=1e-5)


def test_stem_mgrid_planar_u8_matches_bf16_path(params, rng):
    """The uint8-ingesting stem (stem_mgrid_planar: bytes DMA'd into the
    kernel, cast in VMEM, /255 folded into lhs) must match the bf16
    s2d-lanes stem (stem_mgrid_x) on the same masked frames — only the
    /255 rounding site differs, so f32 compute pins them to ~1e-6."""
    from jegal_tpu.host import media
    from jegal_tpu.ops.video import mask_s2d_core

    blk = params["net_vid"][0]
    lhs, scale, bias = S.stem_kernel_params(blk)
    t4 = 13  # t_out=9 > t_blk=8 (f32) -> exercises the t-pad path too
    frames = rng.integers(0, 255, (t4, 270, 480, 3)).astype(np.uint8)
    cut = rng.integers(90, 140, (t4,)).astype(np.int32)

    x = mask_s2d_core(jnp.asarray(frames), jnp.asarray(cut),
                      dtype=jnp.float32)
    ref = np.asarray(S.stem_mgrid_x(x, lhs, scale, bias, w_valid=160,
                                    interpret=True))
    planar = jnp.asarray(media.s2d_repack(frames, cut))
    out = np.asarray(S.stem_mgrid_planar(planar, lhs, scale, bias,
                                         dtype=jnp.float32, interpret=True))
    assert out.shape == ref.shape
    # compare valid m-grid lanes only (even lanes < 2*w_pool; rest is
    # uninitialized-by-contract)
    w_pool = (160 - 5) // 2 + 1
    np.testing.assert_allclose(out[..., 0:2 * w_pool:2],
                               ref[..., 0:2 * w_pool:2],
                               atol=2e-5, rtol=2e-5)


def test_extract_features_planar_matches_raw(params, rng):
    """End-to-end single-clip planar path (uint8 kernel stem) == raw-frames
    path through the full tower at f32."""
    from jegal_tpu.host import media
    from jegal_tpu.ops.video import mask_frames_s2d

    t = 7
    frames = rng.integers(0, 255, (t, 270, 480, 3)).astype(np.uint8)
    cut = rng.integers(90, 140, (t,)).astype(np.int32)

    raw = np.asarray(G.extract_features_x(
        params, mask_frames_s2d(jnp.asarray(frames), jnp.asarray(cut),
                                dtype=jnp.float32),
        chunk=160, interpret=True))
    planar = jnp.asarray(media.s2d_repack(frames, cut))
    out = np.asarray(G.extract_features_planar(
        params, planar, chunk=160, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, raw, atol=2e-5, rtol=2e-5)


def test_band_kernel_matches_window_kernel(params, rng):
    """The band-rotation stem kernel (_stem_kernel_band: one 160-row K-band
    rebuilt per conv row, 3 phase-rotated lhs layouts, 2-row steady-state
    DMA) must match the window kernel on BOTH the float and the u8-planar
    entries, across tb transitions and both j parities of the band
    rotation."""
    from jegal_tpu.host import media

    blk = params["net_vid"][0]
    lhs, scale, bias = S.stem_kernel_params(blk)
    for (t4, h, w) in [(24, 33, 24), (13, 45, 48)]:
        frames = jnp.asarray(rng.random((t4, h, w, 3)), jnp.float32)
        x = S.s2d_lanes(frames)
        w_v = w // 3
        a = np.asarray(S.stem_mgrid_x(x, lhs, scale, bias, w_valid=w_v,
                                      interpret=True, impl="window"))
        b = np.asarray(S.stem_mgrid_x(x, lhs, scale, bias, w_valid=w_v,
                                      interpret=True, impl="band"))
        np.testing.assert_allclose(a[..., :w_v], b[..., :w_v],
                                   rtol=1e-5, atol=1e-5)

    fr_u8 = rng.integers(0, 255, (12, 27, 24, 3)).astype(np.uint8)
    planar = jnp.asarray(media.s2d_repack(fr_u8, None))
    pa = np.asarray(S.stem_mgrid_planar(planar, lhs, scale, bias,
                                        dtype=jnp.float32, interpret=True,
                                        impl="window"))
    pb = np.asarray(S.stem_mgrid_planar(planar, lhs, scale, bias,
                                        dtype=jnp.float32, interpret=True,
                                        impl="band"))
    np.testing.assert_allclose(pa[..., :8], pb[..., :8],
                               rtol=1e-5, atol=1e-5)


def test_u8direct_and_pairdot_match_window_kernel(params, rng):
    """The r5 window-kernel variants — u8_direct (rhs windows built
    straight from the u8 block, cast fused into the copy) and pair_dot
    (both new conv rows in one 2*nlanes-wide matmul) — must match the
    default window kernel exactly (same dot K-order; f32 pins to 1e-5),
    on both the float entry (pair_dot) and the u8-planar entry (each flag
    alone and combined), across tb transitions."""
    from jegal_tpu.host import media

    blk = params["net_vid"][0]
    lhs, scale, bias = S.stem_kernel_params(blk)
    for (t4, h, w) in [(24, 33, 24), (13, 45, 48)]:
        frames = jnp.asarray(rng.random((t4, h, w, 3)), jnp.float32)
        x = S.s2d_lanes(frames)
        w_v = w // 3
        a = np.asarray(S.stem_mgrid_x(x, lhs, scale, bias, w_valid=w_v,
                                      interpret=True, pair_dot=False))
        b = np.asarray(S.stem_mgrid_x(x, lhs, scale, bias, w_valid=w_v,
                                      interpret=True, pair_dot=True))
        np.testing.assert_allclose(a[..., :w_v], b[..., :w_v],
                                   rtol=1e-5, atol=1e-5)

    fr_u8 = rng.integers(0, 255, (12, 27, 24, 3)).astype(np.uint8)
    planar = jnp.asarray(media.s2d_repack(fr_u8, None))
    base = np.asarray(S.stem_mgrid_planar(planar, lhs, scale, bias,
                                          dtype=jnp.float32, interpret=True,
                                          u8_direct=False, pair_dot=False))
    for u8d, pd in [(True, False), (False, True), (True, True)]:
        v = np.asarray(S.stem_mgrid_planar(planar, lhs, scale, bias,
                                           dtype=jnp.float32,
                                           interpret=True,
                                           u8_direct=u8d, pair_dot=pd))
        np.testing.assert_allclose(v[..., :8], base[..., :8],
                                   rtol=1e-5, atol=1e-5)
