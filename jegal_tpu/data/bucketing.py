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
    """Smallest bucket >= n; past the table end, the next multiple of the
    last bucket (doubling wasted up to ~50% — a 2-minute 3000-frame video
    would pad to 4096; multiples of 512 cap the waste at one bucket while
    long inputs stay rare enough that the extra shapes don't bloat the jit
    cache)."""
    if n <= 0:
        raise ValueError(f"bucketing requires n >= 1, got {n}")
    for b in buckets:
        if n <= b:
            return b
    last = buckets[-1]
    return -(-n // last) * last


def pow2_bucket(n: int, floor: int = 1, cap: int | None = None) -> int:
    """Smallest power of two >= max(n, floor), optionally capped: the one
    rounding rule behind tail-batch ladders (api._batch_ladder) and
    device-eval shape buckets — bounds distinct compile shapes to
    log2(cap/floor)+1 per site."""
    b = max(1, floor)
    while b < n and (cap is None or b < cap):
        b *= 2
    return b if cap is None else min(b, cap)


def pad_axis(arr, axis: int, target: int, value=0.0):
    """Zero-pad `arr` along `axis` up to `target` length. jax arrays pad ON
    DEVICE (jnp.pad) — np.asarray here would silently fetch device-resident
    features to host, re-introducing the device->host->device round trip the
    engine's on-device feature path exists to avoid."""
    import numpy as np

    cur = arr.shape[axis]
    if cur == target:
        return arr
    if cur > target:
        raise ValueError(f"axis {axis} length {cur} exceeds bucket {target}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - cur)
    import jax

    if isinstance(arr, jax.Array):
        import jax.numpy as jnp

        return jnp.pad(arr, widths, constant_values=value)
    return np.pad(np.asarray(arr), widths, constant_values=value)
