"""Word-boundary transcription backend (pluggable ASR).

The reference shells into WhisperX large-v3 on CPU (utils/
extract_transcripts_whisperx.py:17-64; inference_embs.py:379-430) to produce
'Text:/Lang:' headers plus 'WORD, START, END, SCORE' rows. WhisperX is an
external pretrained model; we wrap it when installed and otherwise raise a
clear error telling the user to provide --text_path.
"""

from __future__ import annotations

import os


def transcribe_to_file(audio_path: str, res_dir: str,
                       batch_size: int = 8) -> str:
    """-> path of the written transcript file (reference format)."""
    try:
        import whisperx
    except ImportError as e:
        raise RuntimeError(
            "no ASR backend installed (whisperx); provide --text_path with "
            "word boundaries instead, or install an ASR backend"
        ) from e

    os.makedirs(res_dir, exist_ok=True)
    out_path = os.path.join(res_dir, "word_boundaries.txt")

    model = whisperx.load_model("large-v3", device="cpu", compute_type="float32")
    audio = whisperx.load_audio(audio_path)
    result = model.transcribe(audio, batch_size=batch_size)
    lang = result["language"]

    align_model, metadata = whisperx.load_align_model(language_code=lang, device="cpu")
    aligned = whisperx.align(result["segments"], align_model, metadata, audio,
                             "cpu", return_char_alignments=False)

    with open(out_path, "w") as f:
        f.write("Text: ")
        for seg in result["segments"]:
            f.write(seg["text"])
        f.write("\nLang: " + lang)
        f.write("\n\nWORD, START, END, SCORE\n")
        for seg in aligned["segments"]:
            for w in seg["words"]:
                if "start" not in w:
                    f.write(w["word"] + "\n")
                else:
                    f.write(f"{w['word']}, {w['start']}, {w['end']}, {w['score']}\n")
    return out_path
