"""Core sample model: dtypes, rates, channel counts.

TPU-native equivalent of the reference's core sample model
(/root/reference/src/common.rs:7-48): ``Sample`` is f32 by default (f64 via
``set_float64(True)``, the analog of the reference's ``64bit`` feature),
sample rates and channel counts are positive ints, silence is 0.0 and the
nominal range is [-1, 1] with clipping only at type-conversion boundaries.

Unlike the reference, samples never exist as scalars on the hot path: audio
flows as frame-major blocks ``[channels, T]`` (see :mod:`rodio_tpu.core.block`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

#: Default sample rate (reference: src/common.rs:10).
DEFAULT_SAMPLE_RATE: int = 48_000

#: Maximum span length the uniform stage will buffer for unbounded spans
#: (reference: src/source/uniform.rs:56, src/source/buffered.rs:104).
MAX_SPAN_LEN: int = 32_768

_FLOAT64 = False


def set_float64(enabled: bool) -> None:
    """Select f64 samples (the reference's ``64bit`` cargo feature).

    Requires ``jax.config.update('jax_enable_x64', True)`` for device paths.
    """
    global _FLOAT64
    _FLOAT64 = bool(enabled)


def float64_enabled() -> bool:
    return _FLOAT64


def float_dtype():
    """The ``Float``/``Sample`` dtype (reference: src/common.rs:18-48)."""
    return np.float64 if _FLOAT64 else np.float32


def sample_dtype():
    return float_dtype()


def check_sample_rate(rate: int) -> int:
    rate = int(rate)
    if rate <= 0:
        raise ValueError(f"sample rate must be positive, got {rate}")
    return rate


def check_channels(channels: int) -> int:
    channels = int(channels)
    if channels <= 0:
        raise ValueError(f"channel count must be positive, got {channels}")
    if channels > 0xFFFF:
        raise ValueError(f"channel count must fit u16, got {channels}")
    return channels


def check_bit_depth(bits: int) -> int:
    bits = int(bits)
    if bits <= 0 or bits > 32:
        raise ValueError(f"bit depth must be in 1..=32, got {bits}")
    return bits


@dataclasses.dataclass(frozen=True)
class StreamSpec:
    """Static format of a stream: (channels, sample_rate).

    The analog of the reference's per-span (channels(), sample_rate())
    metadata pair (src/source/mod.rs:208-213). In the block engine a stream's
    spec is fixed after the uniformization stage; span changes are handled at
    ingest (host side) by re-segmenting the stream.
    """

    channels: int
    sample_rate: int

    def __post_init__(self):
        object.__setattr__(self, "channels", check_channels(self.channels))
        object.__setattr__(self, "sample_rate", check_sample_rate(self.sample_rate))

    def frames_for(self, seconds: float) -> int:
        return int(round(seconds * self.sample_rate))


NANOS_PER_SEC = 1_000_000_000


def duration_to_nanos(seconds: float) -> int:
    """Convert float seconds to integer nanoseconds (round-half-even like
    ``Duration::from_secs_f64``)."""
    if seconds < 0:
        raise ValueError("duration must be non-negative")
    return int(round(seconds * NANOS_PER_SEC))


def nanos_to_secs_f32(nanos: int) -> float:
    """Mirror of Rust ``Duration::as_secs_f32`` (used by duration_to_float,
    reference src/math.rs:118-127): f32(secs) computed as f32 division."""
    return float(np.float32(nanos) / np.float32(NANOS_PER_SEC))


def nanos_to_secs(nanos: int) -> float:
    return nanos / NANOS_PER_SEC


@dataclasses.dataclass(frozen=True)
class SpanInfo:
    """Metadata for one span of a segmented stream (host side).

    Mirrors the reference's span protocol (src/source/mod.rs:180-200):
    parameters may only change at span boundaries; ``total_samples`` counts
    interleaved samples, ``None`` means unbounded.
    """

    spec: StreamSpec
    total_samples: Optional[int] = None
