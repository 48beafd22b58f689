"""Scalar reference engine: core Source protocol.

This subpackage is the *semantic oracle* of rodio_tpu: a pure-Python,
per-sample (f32-faithful) re-implementation of the reference's pull-based
Source iterator protocol (/root/reference/src/source/mod.rs:179-758). The
block engine (the actual TPU framework) is tested for 1e-6 parity against
these iterators, which themselves are pinned by the sample-exact unit-test
vectors embedded in the reference's test suites.

It is NOT a performance path. All arithmetic uses np.float32 scalars so
rounding matches the reference's f32 math.

Durations are integer nanoseconds throughout (mirroring Rust ``Duration``).
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from ..core.types import DEFAULT_SAMPLE_RATE, NANOS_PER_SEC

F = np.float32


class SeekError(Exception):
    """Raised when a source cannot seek (src/source/mod.rs:767-787)."""

    def __init__(self, underlying_source: str = "", intact: bool = True):
        super().__init__(f"Seeking is not supported by source: {underlying_source}")
        self.underlying_source = underlying_source
        self._intact = intact

    def source_intact(self) -> bool:
        return self._intact


class Source:
    """Pull-based source of f32 samples (src/source/mod.rs:179).

    Subclasses implement ``next()`` returning an np.float32 or None when
    exhausted, plus the metadata methods. A helper ``__iter__`` adapts to
    Python iteration.
    """

    def next(self) -> Optional[np.float32]:
        raise NotImplementedError

    def current_span_len(self) -> Optional[int]:
        raise NotImplementedError

    def channels(self) -> int:
        raise NotImplementedError

    def sample_rate(self) -> int:
        raise NotImplementedError

    def total_duration_ns(self) -> Optional[int]:
        raise NotImplementedError

    def try_seek(self, pos_ns: int) -> None:
        raise SeekError(type(self).__name__)

    def is_exhausted(self) -> bool:
        return self.current_span_len() == 0

    def __iter__(self) -> Iterator[np.float32]:
        while True:
            s = self.next()
            if s is None:
                return
            yield s

    def collect(self, limit: Optional[int] = None) -> np.ndarray:
        out = []
        for i, s in enumerate(self):
            if limit is not None and i >= limit:
                break
            out.append(s)
        return np.asarray(out, dtype=np.float32)


def padding_samples_needed(samples_in_current_frame: int, channels: int) -> int:
    """Silence samples needed to complete the current frame
    (src/source/mod.rs:853-862)."""
    if samples_in_current_frame > 0:
        return channels - samples_in_current_frame
    return 0


class SpanTracker:
    """Per-source span-boundary detector (src/source/span.rs:34-119)."""

    def __init__(self, sample_rate: int, channels: int):
        self.samples_counted = 0
        self.cached_span_len: Optional[int] = None
        self.last_sample_rate = sample_rate
        self.last_channels = channels

    def advance(self, source: Source):
        self.samples_counted += 1
        input_span_len = source.current_span_len()

        parameters_changed = False
        at_span_boundary = False
        if input_span_len is not None:
            known_boundary = None
            if self.cached_span_len is not None:
                known_boundary = self.samples_counted >= self.cached_span_len
            if known_boundary is None or known_boundary:
                current_channels = source.channels()
                current_sample_rate = source.sample_rate()
                parameters_changed = (
                    current_channels != self.last_channels
                    or current_sample_rate != self.last_sample_rate
                )
                self.last_channels = current_channels
                self.last_sample_rate = current_sample_rate
            at_span_boundary = (
                known_boundary if known_boundary is not None else parameters_changed
            )

        if at_span_boundary:
            self.samples_counted = 0
            self.cached_span_len = input_span_len

        return at_span_boundary, parameters_changed

    def seek(self, pos_ns: int, source: Source) -> None:
        self.samples_counted = 0
        self.last_sample_rate = source.sample_rate()
        self.last_channels = source.channels()
        self.cached_span_len = source.current_span_len() if pos_ns == 0 else None


class SamplesBuffer(Source):
    """In-memory interleaved sample buffer (src/buffer.rs:23-200).

    Seek is O(1) and frame-aligned (rounds the target sample down to a frame
    boundary, src/buffer.rs:101-120); seeking past the end saturates.
    """

    def __init__(self, channels: int, sample_rate: int, data: Sequence[float]):
        assert channels > 0 and sample_rate > 0
        self._channels = channels
        self._rate = sample_rate
        self._data = np.asarray(data, dtype=np.float32)
        self._pos = 0

    def next(self):
        if self._pos >= len(self._data):
            return None
        v = self._data[self._pos]
        self._pos += 1
        return v

    def current_span_len(self):
        return max(0, len(self._data) - self._pos)

    def channels(self):
        return self._channels

    def sample_rate(self):
        return self._rate

    def total_duration_ns(self):
        frames = len(self._data) // self._channels
        return frames * NANOS_PER_SEC // self._rate

    def try_seek(self, pos_ns: int) -> None:
        # O(1) seek preserving the CURRENT channel phase
        # (src/buffer.rs:101-121): the target sample index is rounded UP
        # to a frame boundary and then rewound by the channel offset the
        # reader is mid-way through, so the L/R sequence stays correct
        curr_channel = self._pos % self._channels
        target = int(
            float(np.float32(pos_ns / NANOS_PER_SEC))
            * self._rate * self._channels
        )
        target = min(target, len(self._data))
        target = -(-target // self._channels) * self._channels
        self._pos = target - curr_channel


class TestSource(Source):
    """Test helper that may end mid-frame (src/source/mod.rs:871-929)."""

    def __init__(self, samples: Sequence[float], channels: int, sample_rate: int):
        self._samples = np.asarray(samples, dtype=np.float32)
        self._pos = 0
        self._channels = channels
        self._rate = sample_rate
        self._total_span_len = len(self._samples)

    def next(self):
        if self._pos >= len(self._samples):
            self._pos += 1
            return None
        v = self._samples[self._pos]
        self._pos += 1
        return v

    def current_span_len(self):
        return self._total_span_len

    def channels(self):
        return self._channels

    def sample_rate(self):
        return self._rate

    def total_duration_ns(self):
        return None


class Empty(Source):
    """Zero-length source (src/source/empty.rs:10)."""

    def next(self):
        return None

    def current_span_len(self):
        return 0

    def channels(self):
        return 1

    def sample_rate(self):
        return DEFAULT_SAMPLE_RATE

    def total_duration_ns(self):
        return 0


class EmptyCallback(Source):
    """Empty source invoking a callback on every (empty) pull
    (src/source/empty_callback.rs:9)."""

    def __init__(self, callback: Callable[[], None]):
        self._callback = callback

    def next(self):
        self._callback()
        return None

    def current_span_len(self):
        return 0

    def channels(self):
        return 1

    def sample_rate(self):
        return DEFAULT_SAMPLE_RATE

    def total_duration_ns(self):
        return 0


class Zero(Source):
    """Silence, infinite or N samples (frame-aligned) (src/source/zero.rs:19)."""

    def __init__(self, channels: int, sample_rate: int,
                 num_samples: Optional[int] = None):
        if num_samples is not None and num_samples % channels != 0:
            raise ValueError("num_samples must be a multiple of the channel count")
        self._channels = channels
        self._rate = sample_rate
        self._total = num_samples
        self._position = 0

    def next(self):
        if self._total is not None:
            if self._position < self._total:
                self._position += 1
            else:
                return None
        return F(0.0)

    def current_span_len(self):
        return self._total

    def channels(self):
        return self._channels

    def sample_rate(self):
        return self._rate

    def total_duration_ns(self):
        if self._total is None:
            return None
        frames = self._total // self._channels
        return frames * NANOS_PER_SEC // self._rate

    def try_seek(self, pos_ns: int) -> None:
        if self._total is not None:
            total_ns = self.total_duration_ns()
            target = min(pos_ns, total_ns)
            secs_f32 = np.float32(target) / np.float32(NANOS_PER_SEC)
            target_samples = int(
                np.float32(secs_f32 * np.float32(self._rate) * np.float32(self._channels))
            )
            self._position = min(target_samples, self._total)


class SignalGenerator(Source):
    """Phase-accumulator waveform generator
    (src/source/signal_generator.rs:73-170). Mono, infinite.

    NOTE: rodio accumulates phase in f32 per sample; this mirrors it exactly.
    The block engine uses a drift-free closed form instead and is tested
    against this only over short windows (see tests for the deviation bound).
    """

    def __init__(self, sample_rate: int, frequency: float, function: str):
        assert frequency > 0.0
        self._rate = sample_rate
        self._function = function
        period = F(sample_rate) / F(frequency)
        self._period = period
        self._phase_step = F(1.0) / period
        self._phase = F(0.0)

    @staticmethod
    def _eval(function: str, phase: np.float32) -> np.float32:
        if function == "sine":
            return F(np.sin(F(F(2.0 * np.pi) * phase)))
        if function == "triangle":
            return F(4.0) * np.abs(phase - np.floor(F(phase + F(0.5)))) - F(1.0)
        if function == "square":
            return F(1.0) if phase % F(1.0) < F(0.5) else F(-1.0)
        if function == "sawtooth":
            return F(2.0) * (phase - np.floor(F(phase + F(0.5))))
        raise ValueError(function)

    def next(self):
        val = self._eval(self._function, self._phase)
        p = self._phase + self._phase_step
        self._phase = F(p - np.floor(p))  # rem_euclid(1.0)
        return F(val)

    def current_span_len(self):
        return None

    def channels(self):
        return 1

    def sample_rate(self):
        return self._rate

    def total_duration_ns(self):
        return None

    def try_seek(self, pos_ns: int) -> None:
        secs = np.float32(pos_ns) / np.float32(NANOS_PER_SEC)
        seek = F(secs * F(self._rate)) / self._period
        self._phase = F(seek - np.floor(seek))


class SineWave(SignalGenerator):
    """440Hz-style sine at 48 kHz (src/source/sine.rs:16)."""

    def __init__(self, frequency: float):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "sine")


class SquareWave(SignalGenerator):
    def __init__(self, frequency: float):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "square")


class TriangleWave(SignalGenerator):
    def __init__(self, frequency: float):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "triangle")


class SawtoothWave(SignalGenerator):
    def __init__(self, frequency: float):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "sawtooth")


class Chirp(Source):
    """Linear sine sweep (src/source/chirp.rs:22-103)."""

    def __init__(self, sample_rate: int, start_frequency: float,
                 end_frequency: float, duration_ns: int):
        self._rate = sample_rate
        self._start = F(start_frequency)
        self._end = F(end_frequency)
        self._total = int((duration_ns / NANOS_PER_SEC) * sample_rate)
        self._elapsed = 0

    def next(self):
        i = self._elapsed
        if i >= self._total:
            return None
        ratio = F(i / self._total)
        freq = self._start * (F(1.0) - ratio) + self._end * ratio
        t = F(i / self._rate) * F(2.0 * np.pi) * freq
        self._elapsed += 1
        return F(np.sin(t))

    def current_span_len(self):
        return None

    def channels(self):
        return 1

    def sample_rate(self):
        return self._rate

    def total_duration_ns(self):
        return int(self._total * NANOS_PER_SEC // self._rate)

    def try_seek(self, pos_ns: int) -> None:
        target = int((pos_ns / NANOS_PER_SEC) * self._rate)
        self._elapsed = min(target, self._total)


class FromIter(Source):
    """Concatenate a lazy sequence of sources (src/source/from_iter.rs:8-19)."""

    def __init__(self, iterator):
        self._iterator = iter(iterator)
        self._current: Optional[Source] = next(self._iterator, None)

    def next(self):
        while True:
            if self._current is not None:
                v = self._current.next()
                if v is not None:
                    return v
            nxt = next(self._iterator, None)
            if nxt is None:
                return None
            self._current = nxt

    def current_span_len(self):
        if self._current is not None and not self._current.is_exhausted():
            return self._current.current_span_len()
        return None

    def channels(self):
        return self._current.channels() if self._current is not None else 2

    def sample_rate(self):
        return (
            self._current.sample_rate()
            if self._current is not None
            else DEFAULT_SAMPLE_RATE
        )

    def total_duration_ns(self):
        return None

    def try_seek(self, pos_ns: int) -> None:
        if self._current is not None:
            self._current.try_seek(pos_ns)


def from_iter(iterator) -> FromIter:
    return FromIter(iterator)


def from_factory(factory: Callable[[], Optional[Source]]) -> FromIter:
    """Concatenate sources produced by a factory (src/source/from_factory.rs:4)."""

    def gen():
        while True:
            s = factory()
            if s is None:
                return
            yield s

    return FromIter(gen())


class Buffered(Source):
    """Lazily materializes spans into a shared cache; clones replay
    (src/source/buffered.rs:11-125)."""

    class _Span:
        __slots__ = ("data", "channels", "rate", "next", "is_end", "pending_input")

        def __init__(self):
            self.data = None
            self.channels = 1
            self.rate = DEFAULT_SAMPLE_RATE
            self.next = None
            self.is_end = False
            self.pending_input = None

    @staticmethod
    def _extract(input_source: Optional[Source]) -> "Buffered._Span":
        span = Buffered._Span()
        if input_source is None:
            span.is_end = True
            return span
        span_len = input_source.current_span_len()
        if span_len == 0:
            span.is_end = True
            return span
        channels = input_source.channels()
        rate = input_source.sample_rate()
        max_samples = span_len if span_len is not None else 32768
        data = []
        for _ in range(max_samples):
            v = input_source.next()
            if v is None:
                break
            data.append(v)
        if not data:
            span.is_end = True
            return span
        span.data = np.asarray(data, dtype=np.float32)
        span.channels = channels
        span.rate = rate
        nxt = Buffered._Span()
        nxt.pending_input = input_source
        span.next = nxt
        return span

    def __init__(self, input_source: Optional[Source] = None, *, _span=None,
                 _total_ns=None):
        if _span is not None:
            self._current = _span
            self._total_ns = _total_ns
        else:
            self._total_ns = (
                input_source.total_duration_ns() if input_source is not None else 0
            )
            self._current = Buffered._extract(input_source)
        self._pos = 0

    def clone(self) -> "Buffered":
        return Buffered(_span=self._current, _total_ns=self._total_ns)

    def _advance_span(self):
        nxt = self._current.next
        if nxt.pending_input is not None:
            inp = nxt.pending_input
            nxt.pending_input = None
            resolved = Buffered._extract(inp)
            # splice resolved span contents into the placeholder node so all
            # clones see it
            nxt.data = resolved.data
            nxt.channels = resolved.channels
            nxt.rate = resolved.rate
            nxt.next = resolved.next
            nxt.is_end = resolved.is_end
        self._current = nxt
        self._pos = 0

    def next(self):
        if self._current.is_end:
            return None
        v = self._current.data[self._pos]
        self._pos += 1
        if self._pos >= len(self._current.data):
            self._advance_span()
        return v

    def current_span_len(self):
        return 0 if self._current.is_end else len(self._current.data)

    def channels(self):
        return 1 if self._current.is_end else self._current.channels

    def sample_rate(self):
        return DEFAULT_SAMPLE_RATE if self._current.is_end else self._current.rate

    def total_duration_ns(self):
        return self._total_ns


class Repeat(Source):
    """Infinite loop over a buffered source (src/source/repeat.rs:10-44)."""

    def __init__(self, input_source: Source):
        buffered = input_source if isinstance(input_source, Buffered) else Buffered(
            input_source
        )
        self._inner = buffered.clone()
        self._next = buffered

    def next(self):
        v = self._inner.next()
        if v is not None:
            return v
        self._inner = self._next.clone()
        return self._inner.next()

    def current_span_len(self):
        if self._inner.is_exhausted():
            return self._next.current_span_len()
        return self._inner.current_span_len()

    def channels(self):
        if self._inner.is_exhausted():
            return self._next.channels()
        return self._inner.channels()

    def sample_rate(self):
        if self._inner.is_exhausted():
            return self._next.sample_rate()
        return self._inner.sample_rate()

    def total_duration_ns(self):
        return None

    def try_seek(self, pos_ns: int) -> None:
        self._inner.try_seek(pos_ns)
