"""Transcription drivers with an injected fake ASR backend: reference file
format (Text:/Lang: + 'WORD, START, END, SCORE' rows,
extract_transcripts_whisperx.py:46-64), folder-batch resume, error ledger,
and round-trip through the text loader."""

import os

import pytest

from jegal_tpu.host.transcribe import (
    transcribe_folder,
    transcribe_to_file,
    write_transcript,
)
from jegal_tpu.text.normalize import load_text


def fake_backend(audio_path, batch_size=8):
    if "broken" in audio_path:
        raise IOError("corrupt audio")
    return {
        "text": " hello brave new world",
        "language": "en",
        "words": [("hello", 0.05, 0.31, 0.9), ("brave", 0.40, 0.72, 0.8),
                  ("new", 0.80, 0.99, 0.85), ("world", 1.10, 1.60, 0.95)],
    }


def test_single_file_format_roundtrip(tmp_path):
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"\0")
    out = transcribe_to_file(str(wav), str(tmp_path / "res"),
                             backend=fake_backend)
    lines = open(out).read().splitlines()
    assert lines[0] == "Text:  hello brave new world"
    assert lines[1] == "Lang: en"
    assert lines[2] == ""
    assert lines[3] == "WORD, START, END, SCORE"
    assert lines[4] == "hello, 0.05, 0.31, 0.9"
    # the engine's text loader consumes it directly (sec -> frame @ 25 fps)
    text, wbs = load_text(out)
    assert text == "hello brave new world"
    assert wbs[0] == ["hello", round(0.05 * 25), round(0.31 * 25)]
    assert len(wbs) == 4


def test_unaligned_word_row(tmp_path):
    """Words whisperx could not align get a bare-word row (reference
    extract_transcripts_whisperx.py:60-61)."""
    out = tmp_path / "t.txt"
    write_transcript({"text": "x y", "language": "en",
                      "words": [("x", 0.0, 0.1, 0.5), ("y", None, None, None)]},
                     str(out))
    assert "\ny\n" in out.read_text()


def test_folder_batch_resume_and_ledger(tmp_path, capsys):
    root = tmp_path / "audio" / "clips"
    root.mkdir(parents=True)
    for name in ("a.wav", "b.wav", "broken.wav"):
        (root / name).write_bytes(b"\0")
    res = tmp_path / "out"

    stats = transcribe_folder(str(tmp_path / "audio"), str(res),
                              backend=fake_backend)
    assert stats == {"done": 2, "skipped": 0, "failed": 1}
    assert "corrupt audio" in capsys.readouterr().err
    assert (res / "clips" / "a.txt").exists()
    assert (res / "clips" / "b.txt").exists()

    # second run: everything done is skipped, the broken file retries
    stats2 = transcribe_folder(str(tmp_path / "audio"), str(res),
                               backend=fake_backend)
    assert stats2 == {"done": 0, "skipped": 2, "failed": 1}


def test_folder_batch_no_deep_tree_collisions(tmp_path):
    """Distinct files sharing <parent>/<stem> at different depths must get
    distinct outputs (the reference keys only on the immediate parent's
    basename and silently collides)."""
    for sub in ("a/x", "b/x"):
        d = tmp_path / "audio" / sub
        d.mkdir(parents=True)
        (d / "f.wav").write_bytes(b"\0")
    res = tmp_path / "out"
    stats = transcribe_folder(str(tmp_path / "audio"), str(res),
                              backend=fake_backend)
    assert stats == {"done": 2, "skipped": 0, "failed": 0}
    assert (res / "a" / "x" / "f.txt").exists()
    assert (res / "b" / "x" / "f.txt").exists()


def test_missing_backend_is_actionable(tmp_path):
    try:
        import whisperx  # noqa: F401
        pytest.skip("whisperx unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="text_path"):
        transcribe_to_file(str(tmp_path / "a.wav"), str(tmp_path))
