"""Typed configuration (single source of truth for the pipeline constants).

The reference scatters hyperparameters across per-script argparse defaults
and hard-coded dicts (SURVEY.md §5.6). Every constant here cites where the
reference pins the same value.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class AudioConfig:
    """utils/audio_utils.py:11-17."""
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 320
    hop_length: int = 160
    n_mels: int = 80
    log_offset: float = 1e-20


@dataclass(frozen=True)
class VideoConfig:
    """inference_embs.py:235-283; preprocess defaults :18-27."""
    fps: float = 25.0
    mask_width: int = 480
    mask_height: int = 270
    edge_pad_frames: int = 12
    window: int = 25           # GestSync sync window (inference_embs.py:488)
    window_batch: int = 48     # reference batching (informational)


@dataclass(frozen=True)
class PreprocessConfig:
    """preprocess/inference_preprocess.py:18-27 + tracker constants."""
    crop_scale: float = 0.0
    min_track: int = 10
    min_frame_size: int = 64
    num_failed_det: int = 25
    iou_threshold: float = 0.5
    detector_conf: float = 0.6
    tight_scale: float = 0.9
    medfilt_kernel: int = 13


@dataclass(frozen=True)
class ModelConfig:
    """models/jegal.py:18 defaults."""
    d_model: int = 512
    d_model_text: int = 768
    num_heads: int = 8
    num_layers_rgb: int = 6
    num_layers_text: int = 3
    dropout: float = 0.1
    fusion_strategy: str = "concat"
    pe_max_len: int = 500
    temperature: float = 0.07  # eval temperature (evaluate_*.py)


@dataclass(frozen=True)
class EvalConfig:
    """evaluation/evaluate_spotting.py:13-14 etc."""
    spot_threshold: float = 0.5
    spot_frame_threshold: int = 9
    asd_speakers: tuple = (2, 4, 6)
    heatmap_threshold: float = 0.8
    heatmap_alpha: float = 0.6


@dataclass(frozen=True)
class JegalConfig:
    audio: AudioConfig = field(default_factory=AudioConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT = JegalConfig()
