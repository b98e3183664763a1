"""Static-shape bucketing: XLA compiles one graph per shape, so ragged
inputs (video length T, token count S, word count W, mel length) are padded
up to a small set of buckets to bound the jit cache (SURVEY.md §7 hard part
6: bounded recompiles)."""

from __future__ import annotations

T_BUCKETS = (32, 64, 128, 256, 512)        # video frames (PE cap is 500)
S_BUCKETS = (16, 32, 64, 128, 256)         # subword tokens
W_BUCKETS = (8, 16, 32, 64, 128)           # words
MEL_BUCKETS = tuple(4 * t for t in T_BUCKETS)  # mel frames (4x token rate)


def next_bucket(n: int, buckets=T_BUCKETS) -> int:
    """Smallest bucket >= n; doubles past the table end."""
    if n <= 0:
        raise ValueError(f"bucketing requires n >= 1, got {n}")
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


def pad_axis(arr, axis: int, target: int, value=0.0):
    """Zero-pad `arr` along `axis` up to `target` length (numpy or jax)."""
    import numpy as np

    cur = arr.shape[axis]
    if cur == target:
        return arr
    if cur > target:
        raise ValueError(f"axis {axis} length {cur} exceeds bucket {target}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - cur)
    return np.pad(np.asarray(arr), widths, constant_values=value)
