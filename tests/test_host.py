"""Host runtime tests: native media encode/decode roundtrip, masking,
tracker/crop pipeline with a fake detector (no external model deps)."""

import os
import pickle

import numpy as np
import pytest

from jegal_tpu.host import masking, preprocess


def _have_toolchain():
    import shutil

    return shutil.which("g++") is not None


media = pytest.importorskip("jegal_tpu.host.media")


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory, rng):
    """A 2-second synthetic 'speaker' video: a bright moving square on gray,
    plus a 440 Hz tone, encoded with the native encoder."""
    d = tmp_path_factory.mktemp("media")
    t, h, w = 50, 240, 320
    frames = np.full((t, h, w, 3), 64, np.uint8)
    for i in range(t):
        x = 80 + i  # slow horizontal drift
        frames[i, 60:200, x : x + 100] = (200, 150, 100)
    path = str(d / "synth.avi")
    media.encode_video(path, frames, fps=25.0)
    wav = (np.sin(2 * np.pi * 440 * np.arange(32000) / 16000) * 8000).astype(np.int16)
    media.write_wav(str(d / "synth.wav"), wav)
    return path, frames, wav, str(d)


def test_video_roundtrip(synth_video):
    path, frames, _, _ = synth_video
    decoded, fps = media.decode_video(path)
    assert fps == pytest.approx(25.0, abs=0.5)
    assert decoded.shape == frames.shape
    # lossy codec: average error small, structure preserved
    err = np.abs(decoded.astype(np.int32) - frames.astype(np.int32)).mean()
    assert err < 8.0, err


def test_video_decode_resize_and_fps(synth_video):
    path, frames, _, _ = synth_video
    decoded, fps = media.decode_video(path, target_w=160, target_h=120,
                                      target_fps=12.5)
    assert decoded.shape[1:] == (120, 160, 3)
    assert abs(decoded.shape[0] - 25) <= 1  # 2 s at 12.5 fps


def test_audio_decode_from_container(synth_video, tmp_path):
    _, _, wav, d = synth_video
    got = media.decode_audio(os.path.join(d, "synth.wav"), 16000)
    assert got.shape == (32000,)
    np.testing.assert_allclose(got, wav.astype(np.float32), atol=1.0)
    # resample path: 8 kHz
    got8 = media.decode_audio(os.path.join(d, "synth.wav"), 8000)
    assert abs(len(got8) - 16000) < 50


def test_mask_frames_fallback(rng):
    frames = (rng.random((5, 120, 160, 3)) * 255).astype(np.uint8)
    masked = masking.mask_frames(frames, keypoints=None)
    assert masked.shape == (5 + 24, 270, 480, 3)
    assert masked.dtype == np.float32
    assert masked.max() <= 1.0
    # top strip blacked out
    assert (masked[:, :110] == 0).all()
    # edge padding replicates first/last frames
    np.testing.assert_array_equal(masked[0], masked[12])
    np.testing.assert_array_equal(masked[-1], masked[-13])


def test_resize_bilinear_identity_and_downscale(rng):
    img = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    same = masking.resize_bilinear(img, 48, 64)
    np.testing.assert_array_equal(same, img)
    half = masking.resize_bilinear(img, 24, 32)
    assert half.shape == (32, 24, 3)
    # constant image stays constant
    const = np.full((30, 40, 3), 77, np.uint8)
    np.testing.assert_array_equal(masking.resize_bilinear(const, 17, 13),
                                  np.full((13, 17, 3), 77, np.uint8))


def test_iou():
    assert preprocess.iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert preprocess.iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    # the reference's typo'd version would return 0 here; the fixed one 1/7
    assert preprocess.iou([0, 0, 10, 10], [5, 5, 15, 15]) == pytest.approx(25 / 175)


def test_tracker_and_crop(synth_video):
    path, frames, _, d = synth_video

    def fake_detector(frame):
        # find the bright square
        mask = frame[:, :, 0] > 150
        ys, xs = np.where(mask)
        if len(xs) == 0:
            return []
        return [(xs.min(), ys.min(), xs.max(), ys.max(), 0.99)]

    result = preprocess.process_video(
        path, os.path.join(d, "out"), detector=fake_detector, keypoint_fn=None)
    assert result["tracks"] == 1
    dest = result["dest"]
    assert os.path.exists(os.path.join(dest, "00000.avi"))
    # synthetic .avi has no audio stream -> no .wav emitted (graceful)
    assert not os.path.exists(os.path.join(dest, "00000.wav"))
    with open(os.path.join(dest, "tracks.pkl"), "rb") as f:
        tracks = pickle.load(f)
    assert len(tracks) == 1
    assert len(tracks[0]["track"]["frame"]) == 50
    crop, _ = media.decode_video(os.path.join(dest, "00000.avi"))
    assert crop.shape[0] == 50


def test_av_mux_roundtrip(tmp_path, rng):
    """Native A/V encode (mpeg4 + AAC in one .mp4) decodes with BOTH streams
    and full frame count (reference filter_and_merge outputs,
    dataset/preprocess_videos.py:503-545)."""
    t, h, w = 30, 64, 96
    frames = (rng.random((t, h, w, 3)) * 255).astype(np.uint8)
    wav = (np.sin(2 * np.pi * 440 * np.arange(19200) / 16000) * 8000
           ).astype(np.int16)
    path = str(tmp_path / "merged.mp4")
    media.encode_av(path, frames, wav, fps=25.0)
    decoded, fps = media.decode_video(path)
    assert decoded.shape == (t, h, w, 3)
    assert fps == pytest.approx(25.0, abs=0.1)
    audio = media.decode_audio(path, 16000)
    # AAC pads to its 1024-sample frame grid; length within one frame
    assert abs(len(audio) - len(wav)) <= 1024
    # the tone survives the lossy codec: dominant frequency is ~440 Hz
    spec = np.abs(np.fft.rfft(audio[2048:18432]))
    peak_hz = np.argmax(spec) * 16000 / len(audio[2048:18432])
    assert abs(peak_hz - 440) < 10, peak_hz


def test_preprocess_merge_dir(synth_video, tmp_path, rng):
    """preprocess --merge_dir parity with the reference's filter_and_merge:
    per track, a merged .mp4 whose video matches the crop .avi and whose
    audio matches the track's .wav slice."""

    def fake_detector(frame):
        mask = frame[:, :, 0] > 150
        ys, xs = np.where(mask)
        if len(xs) == 0:
            return []
        return [(xs.min(), ys.min(), xs.max(), ys.max(), 0.99)]

    # build an input WITH an audio stream (the module fixture's avi has none)
    _, frames, wav, _ = synth_video
    src = str(tmp_path / "speaker.mp4")
    media.encode_av(src, frames, wav, fps=25.0)

    merge = str(tmp_path / "merged")
    result = preprocess.process_video(
        src, str(tmp_path / "out"), detector=fake_detector,
        keypoint_fn=None, merge_dir=merge)
    assert result["tracks"] == 1
    merged = os.path.join(merge, "speaker_00000.mp4")
    assert os.path.exists(merged)
    vid, fps = media.decode_video(merged)
    crop, _ = media.decode_video(os.path.join(result["dest"], "00000.avi"))
    assert vid.shape == crop.shape
    assert fps == pytest.approx(25.0, abs=0.1)
    got = media.decode_audio(merged, 16000)
    from jegal_tpu.ops.audio import load_wav

    want = load_wav(os.path.join(result["dest"], "00000.wav"))
    assert abs(len(got) - len(want)) <= 1024


@pytest.mark.slow
def test_native_runtime_sanitizers(tmp_path):
    """The C++ media runtime under ASan+UBSan (SURVEY.md §5.2): every C-ABI
    entry point incl. failure paths, zero leaks/UB (csrc/media_sanity.cc)."""
    import subprocess

    if not _have_toolchain():
        pytest.skip("no g++")
    csrc = os.path.join(os.path.dirname(media.__file__), "csrc")
    binary = str(tmp_path / "media_sanity")
    build = subprocess.run(
        ["g++", "-std=c++17", "-g", "-O1",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
         os.path.join(csrc, "decoder.cc"),
         os.path.join(csrc, "media_sanity.cc"),
         "-o", binary,
         "-lavformat", "-lavcodec", "-lavutil", "-lswscale", "-lswresample"],
        capture_output=True, text=True)
    if build.returncode != 0 and "asan" in build.stderr.lower():
        pytest.skip("toolchain lacks libasan")
    assert build.returncode == 0, build.stderr
    run = subprocess.run([binary, str(tmp_path)], capture_output=True,
                         text=True)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "media_sanity OK" in run.stdout


def test_tracker_gap_and_min_track():
    # two clusters separated by a >25-frame gap -> two tracks (2nd too short)
    dets = []
    for f in range(60):
        if f < 20:
            dets.append([{"frame": f, "bbox": [10, 10, 100, 100], "conf": 0.9}])
        elif f >= 55:
            dets.append([{"frame": f, "bbox": [10, 10, 100, 100], "conf": 0.9}])
        else:
            dets.append([])
    tracks = preprocess.track_speakers(dets)
    assert len(tracks) == 1  # the 5-frame tail is below min_track
    assert tracks[0]["frame"][0] == 0 and tracks[0]["frame"][-1] == 19


def test_device_masking_matches_host(rng):
    """Fallback-branch device masking must equal the host path on
    decoder-resized frames."""
    import jax.numpy as jnp

    from jegal_tpu.ops.video import mask_frames_device

    frames = (rng.random((5, 270, 480, 3)) * 255).astype(np.uint8)
    host = masking.mask_frames(frames, keypoints=None)
    dev = np.asarray(mask_frames_device(jnp.asarray(frames)))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)

    # per-frame chin lines: masked rows exactly [0, cut)
    cut = np.array([50, 120, 0, 270, 200], np.int32)
    dev2 = np.asarray(mask_frames_device(jnp.asarray(frames), jnp.asarray(cut)))
    core = dev2[12:-12]
    for i, c in enumerate(cut):
        assert (core[i, :c] == 0).all()
        if c < 270:
            assert core[i, c:].max() > 0


def test_native_s2d_repack_bit_exact(rng):
    """C++ jegal_s2d_repack (decode-thread repack + face mask) must be
    BIT-identical to the on-device mask+s2d path (ops/video.mask_s2d_core)
    — it is the host half of the stem kernel's input contract."""
    import jax.numpy as jnp

    from jegal_tpu.host import media
    from jegal_tpu.ops.video import mask_s2d_core, s2d_from_planar

    t = 6
    frames = (rng.random((t, 270, 480, 3)) * 255).astype(np.uint8)
    cuts = np.array([0, 50, 111, 269, 270, 135], np.int32)

    planar = media.s2d_repack(frames, cuts)
    assert planar.shape == (t, 90, 27, 160)
    ref = np.asarray(mask_s2d_core(jnp.asarray(frames), jnp.asarray(cuts),
                                   dtype=jnp.float32))
    got = np.asarray(s2d_from_planar(jnp.asarray(planar), dtype=jnp.float32,
                                     edge_pad=False))
    assert np.array_equal(ref, got)

    # no-mask call == cut rows 0 (repack only)
    planar_nc = media.s2d_repack(frames, None)
    ref_nc = np.asarray(mask_s2d_core(
        jnp.asarray(frames), jnp.zeros((t,), jnp.int32), dtype=jnp.float32))
    got_nc = np.asarray(s2d_from_planar(
        jnp.asarray(planar_nc), dtype=jnp.float32, edge_pad=False))
    assert np.array_equal(ref_nc, got_nc)
