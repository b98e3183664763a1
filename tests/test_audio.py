"""Audio frontend parity: our framing/STFT vs torch.stft, and the full
wav->log-mel path vs a torch oracle built on our mel matrix (librosa itself
is unavailable in this image; the mel construction is validated structurally
and the STFT bit-for-bit against torch)."""

import numpy as np
import torch

import jax.numpy as jnp

from jegal_tpu.ops import audio as A


def _torch_stft_mag(wav: np.ndarray) -> np.ndarray:
    spect = torch.stft(
        torch.from_numpy(wav),
        return_complex=True,
        n_fft=A.N_FFT,
        hop_length=A.HOP_LENGTH,
        win_length=A.WIN_LENGTH,
        window=torch.hann_window(A.WIN_LENGTH),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
    )
    return torch.abs(spect).numpy()  # (B, F, T)


def test_stft_parity(rng):
    wav = (rng.standard_normal((2, 16000)) * 3000).astype(np.float32)
    want = _torch_stft_mag(wav)
    got = np.asarray(A.stft_magnitude(jnp.asarray(wav)))
    assert got.shape == want.shape == (2, 257, 101)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-2)


def test_mel_filterbank_structure():
    fb = A.mel_filterbank()
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # triangles: peak bin index strictly non-decreasing; every filter nonzero
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # Slaney norm: integral over Hz of each triangle ~ 1
    df = (A.SAMPLE_RATE / 2) / (fb.shape[1] - 1)
    areas = fb.sum(axis=1) * df
    # interior filters should integrate close to 1 (discretization error at edges)
    assert np.all(np.abs(areas[5:-5] - 1.0) < 0.2)


def test_wav2filterbanks_parity_vs_torch_oracle(rng):
    """Full mel path vs a torch reimplementation of the reference pipeline
    (utils/audio_utils.py:28-66), sharing the mel matrix."""
    wav = (rng.standard_normal((1, 16320)) * 1000).astype(np.float32)

    mag = _torch_stft_mag(wav)[:, :, :-1]  # reference drops last frame
    mel_basis = A.mel_filterbank()
    want = np.log(mel_basis @ mag + 1e-20).transpose(0, 2, 1)  # (B, T, 80)

    got = np.asarray(A.wav2filterbanks(jnp.asarray(wav)))
    assert got.shape == want.shape == (1, 16320 // 160, 80)
    # fp32 FFT summation-order differences (torch pocketfft vs XLA) bound the
    # achievable tolerance of the log-mel output
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-2)


def test_audio_token_rate():
    """hop 160 @ 16 kHz -> 100 Hz mel; /4 -> 25 Hz tokens == video fps, so
    word boundaries in frame units index audio tokens directly."""
    seconds = 3.0
    n = int(seconds * A.SAMPLE_RATE)
    mel_t = n // A.HOP_LENGTH
    assert A.audio_token_mask(mel_t).shape[0] == int(seconds * 25)


def test_mag_phase_and_reconstruct(rng):
    """Round trip: wav -> |STFT|,phase -> istft recovers the interior."""
    from jegal_tpu.ops.audio import reconstruct_wav, stft_mag_phase

    wav = (rng.standard_normal((1, 8000)) * 1000).astype(np.float32)
    mag, phase = stft_mag_phase(jnp.asarray(wav))
    assert mag.shape == phase.shape == (1, 257, 8000 // 160)
    rec = reconstruct_wav(np.asarray(mag[0]), np.asarray(phase[0]))
    n = min(len(rec), 8000)
    err = np.abs(rec[400 : n - 400] - wav[0, 400 : n - 400])
    assert err.max() < 2.0, err.max()


def test_wav2filterbanks_np_matches_jnp(rng):
    """The host (numpy) mel twin used by api.prepare_audio must match the
    in-graph jnp version (same window, filterbank, drop-last-frame)."""
    for s in (8000, 16320, 80000):
        wav = (rng.standard_normal(s) * 1000).astype(np.float32)
        want = np.asarray(A.wav2filterbanks(jnp.asarray(wav)[None]))
        got = A.wav2filterbanks_np(wav)
        assert got.shape == want.shape
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
    # 2-D input passes through unchanged
    wav2 = (rng.standard_normal((2, 8000)) * 1000).astype(np.float32)
    np.testing.assert_allclose(
        A.wav2filterbanks_np(wav2),
        np.asarray(A.wav2filterbanks(jnp.asarray(wav2))),
        rtol=2e-4, atol=2e-3)
