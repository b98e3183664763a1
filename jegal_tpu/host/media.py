"""ctypes bindings to the native libav media runtime (csrc/decoder.cc).

Replaces decord / ffmpeg-subprocess usage in the reference
(inference_embs.py:123-151,433-473) with in-process C++ decode. The shared
library is built on demand with g++ (no pip/apt), cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_SRC_DIR, "libjegal_media.so")
_LIBS = "-lavformat -lavcodec -lavutil -lswscale -lswresample".split()

_lock = threading.Lock()
_lib = None


class _JegalVideo(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("nframes", ctypes.c_int64),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("fps", ctypes.c_double),
    ]


class _JegalAudio(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_int16)),
        ("nsamples", ctypes.c_int64),
        ("sample_rate", ctypes.c_int),
    ]


def build_library(force: bool = False) -> str:
    """Compile the decoder if needed; returns the .so path."""
    src = os.path.join(_SRC_DIR, "decoder.cc")
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    ):
        cmd = ["g++", "-O2", "-shared", "-fPIC", src, "-o", _LIB_PATH] + _LIBS
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build_library())
            lib.jegal_decode_video.restype = ctypes.POINTER(_JegalVideo)
            lib.jegal_decode_video.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double]
            lib.jegal_free_video.argtypes = [ctypes.POINTER(_JegalVideo)]
            lib.jegal_decode_audio.restype = ctypes.POINTER(_JegalAudio)
            lib.jegal_decode_audio.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.jegal_free_audio.argtypes = [ctypes.POINTER(_JegalAudio)]
            lib.jegal_encode_video.restype = ctypes.c_int
            lib.jegal_encode_video.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_double]
            lib.jegal_encode_av.restype = ctypes.c_int
            lib.jegal_encode_av.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int]
            lib.jegal_s2d_repack.restype = ctypes.c_int
            lib.jegal_s2d_repack.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
    return _lib


def decode_video(path: str, target_w: int = 0, target_h: int = 0,
                 target_fps: float = 0.0) -> tuple[np.ndarray, float]:
    """-> (frames (N, H, W, 3) uint8 RGB, fps). target dims/fps 0 = native."""
    lib = _get_lib()
    ptr = lib.jegal_decode_video(path.encode(), target_w, target_h, target_fps)
    if not ptr:
        raise IOError(f"could not decode video: {path}")
    try:
        v = ptr.contents
        n = int(v.nframes) * v.height * v.width * 3
        arr = np.ctypeslib.as_array(v.data, shape=(n,)).reshape(
            int(v.nframes), v.height, v.width, 3).copy()
        return arr, float(v.fps)
    finally:
        lib.jegal_free_video(ptr)


def decode_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """-> mono int16 samples at sample_rate (as float32 at raw int16 scale,
    matching the reference's wav convention — utils/audio_utils.py:20-25)."""
    lib = _get_lib()
    ptr = lib.jegal_decode_audio(path.encode(), sample_rate)
    if not ptr:
        raise IOError(f"could not decode audio: {path}")
    try:
        a = ptr.contents
        arr = np.ctypeslib.as_array(a.data, shape=(int(a.nsamples),)).copy()
        return arr.astype(np.float32)
    finally:
        lib.jegal_free_audio(ptr)


def s2d_repack(frames: np.ndarray, cut_rows: np.ndarray | None = None
               ) -> np.ndarray:
    """Host-side space-to-depth repack (+ face mask) into the stem kernel's
    channel layout: (T, H, W, 3) uint8 -> (T, H/3, 27, W/3) uint8 with
    c = (dh*3+dw)*3+ch, masked raw rows h < cut_rows[t] zeroed (reference
    mask semantics, inference_embs.py:262-286). Same permutation as the
    on-device ops.video.mask_s2d_core, done in C++ on the decode thread so
    the device graph starts at the stem kernel with zero layout work.
    ctypes releases the GIL for the native call."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3 and h % 3 == 0 and w % 3 == 0, frames.shape
    out = np.empty((t, h // 3, 27, w // 3), np.uint8)
    cuts = None
    if cut_rows is not None:
        cuts = np.ascontiguousarray(cut_rows, dtype=np.int32)
        assert cuts.shape == (t,), cuts.shape
    lib = _get_lib()
    rc = lib.jegal_s2d_repack(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w,
        cuts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if cuts is not None else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"s2d repack failed ({rc}): shape {frames.shape}")
    return out


def encode_video(path: str, frames: np.ndarray, fps: float = 25.0) -> None:
    """frames: (N, H, W, 3) uint8 RGB -> video file (mpeg4; .avi parity with
    the reference's XVID track writer)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    lib = _get_lib()
    rc = lib.jegal_encode_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, fps)
    if rc != 0:
        raise IOError(f"video encode failed ({rc}): {path}")


def encode_av(path: str, frames: np.ndarray, samples: np.ndarray,
              fps: float = 25.0, sample_rate: int = 16000) -> None:
    """Mux video + audio into one container (mpeg4 + AAC; .mp4 expected) —
    the native counterpart of the reference's merge step
    (dataset/preprocess_videos.py:503-545 ffmpeg two-input shell-out).

    frames: (N, H, W, 3) uint8 RGB; samples: mono int16-scale audio."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    n, h, w, c = frames.shape
    assert c == 3
    lib = _get_lib()
    rc = lib.jegal_encode_av(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, fps,
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        len(samples), sample_rate)
    if rc != 0:
        raise IOError(f"a/v encode failed ({rc}): {path}")


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    from scipy.io import wavfile

    wavfile.write(path, sample_rate, samples.astype(np.int16))


def load_audio_any(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Audio from .wav (scipy fast path) or any container (native decode)."""
    if path.endswith(".wav"):
        from jegal_tpu.ops.audio import load_wav

        return load_wav(path)
    return decode_audio(path, sample_rate)
