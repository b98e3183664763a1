"""GestSync visual tower: parity vs the reference torch model, and
equivalence of the shared-conv windowing redesign vs the reference's
per-window recompute."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from jegal_tpu.models import gestsync as G

from oracles import reference_available, ref_gestsync, to_numpy


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_forward_vid_parity(rng):
    """One 25-frame window through the full tower vs reference forward_vid."""
    gm = ref_gestsync()
    ref = gm.GestSync().eval()
    _randomize_bn(ref)

    clip = rng.random((1, 3, G.WINDOW, 270, 480), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        want = to_numpy(ref.forward_vid(torch.from_numpy(clip)))  # (1, 1024, 21)

    params = G.params_from_torch(ref.state_dict())
    clip_j = jnp.asarray(clip.transpose(0, 2, 3, 4, 1))  # NDHWC
    got = np.asarray(G.forward_vid_windowed(params, clip_j))

    assert got.shape == want.shape == (1, 1024, 21)
    # deep conv stack in fp32: allow small accumulation drift
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # and the windowed mean (the actual feature the pipeline consumes,
    # reference inference_embs.py:510-511)
    np.testing.assert_allclose(
        got.mean(axis=-1), want.mean(axis=-1), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_forward_aud_parity(rng):
    """The audio sync branch vs reference forward_aud (checkpoint-compat
    path, models/gestsync.py:164-168) — torch NCHW (B,1,F,T) maps to our
    NHWC (B,F,T,1)."""
    gm = ref_gestsync()
    ref = gm.GestSync().eval()
    _randomize_bn(ref)

    x = rng.random((1, 1, 80, 100), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        want = to_numpy(ref.forward_aud(torch.from_numpy(x)))  # (1,1024,T')

    params = G.params_from_torch(ref.state_dict())
    got = np.asarray(G.forward_aud(params, jnp.asarray(
        x.transpose(0, 2, 3, 1))))  # NHWC
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_shared_conv_equals_per_window(rng):
    """The shared-conv fast path must produce the same features as running the
    conv tower independently per sliding window (the reference's algorithm)."""
    import jax

    params = G.init_params(jax.random.PRNGKey(0))
    t = 3  # original frames -> T_pad = 27, 3 windows
    frames = jnp.asarray(
        rng.random((t + 2 * G.EDGE_PAD, 270, 480, 3), dtype=np.float64).astype(np.float32)
    )

    fast = np.asarray(G.extract_features(params, frames, chunk=8))
    assert fast.shape == (t, 1024)

    # reference algorithm: stack each 25-frame window, forward, mean tokens
    wins = jnp.stack([frames[i : i + G.WINDOW] for i in range(t)])  # (t,25,H,W,3)
    slow = np.asarray(G.forward_vid_windowed(params, wins).mean(axis=-1))

    # TPU fp32 ('highest') accumulates in a different order than XLA:CPU
    # fp32 — two equally-valid reductions of the same conv tower land
    # within ~1.5e-3 of each other on chip (JEGAL_TEST_TPU=1 run)
    tol = 2e-4 if jax.default_backend() == "cpu" else 4e-3
    np.testing.assert_allclose(fast, slow, rtol=tol, atol=tol)


@pytest.mark.slow
def test_batched_features_equal_per_video(rng):
    """Cross-video batching (extract_features_batch) must equal the
    per-video path clip by clip — the same neutrality contract as the
    JEGAL-side batch padding."""
    import jax

    params = G.init_params(jax.random.PRNGKey(2))
    t = 3
    frames = jnp.asarray(
        rng.random((2, t + 2 * G.EDGE_PAD, 270, 480, 3),
                   dtype=np.float64).astype(np.float32))
    batched = np.asarray(G.extract_features_batch(params, frames, chunk=8))
    assert batched.shape == (2, t, 1024)
    for b in range(2):
        single = np.asarray(G.extract_features(params, frames[b], chunk=8))
        tol = 1e-5 if jax.default_backend() == "cpu" else 4e-3
        np.testing.assert_allclose(batched[b], single, rtol=tol, atol=tol)


def test_window_head_shapes(rng):
    """window_head batching path (lax.map) must equal the unbatched path."""
    import jax

    params = G.init_params(jax.random.PRNGKey(1))
    tokens = jnp.asarray(rng.standard_normal((37 + 20, 512)).astype(np.float32))
    full = np.asarray(G.window_head(params, tokens))
    batched = np.asarray(G.window_head(params, tokens, batch=16))
    assert full.shape == (37, 1024)
    np.testing.assert_allclose(full, batched, rtol=1e-5, atol=1e-5)


def test_s2d_conv_equivalence(rng):
    """Generic space-to-depth strided conv must equal the direct conv for
    assorted (H, W, k, b) shapes including non-multiples of b."""
    import jax.numpy as jnp
    from jegal_tpu.core.layers import conv3d
    from jegal_tpu.models.gestsync import _s2d_kernel, _space_to_depth

    for (h, w, k, b) in [(43, 78, 5, 2), (44, 79, 5, 2), (21, 33, 3, 2),
                         (30, 41, 7, 3), (27, 36, 7, 3)]:
        x = jnp.asarray(rng.standard_normal((1, 4, h, w, 4)).astype(np.float32))
        kern = jnp.asarray(rng.standard_normal((1, k, k, 4, 8)).astype(np.float32))
        ref = conv3d({"kernel": kern}, x, stride=(1, b, b), padding=(0, 0, 0))
        got = conv3d({"kernel": _s2d_kernel(kern, b)}, _space_to_depth(x, b),
                     stride=(1, 1, 1), padding=(0, 0, 0))
        assert ref.shape == got.shape, (h, w, k, b, ref.shape, got.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
