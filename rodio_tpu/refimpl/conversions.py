"""Scalar reference engine: format-unification converters.

Per-sample mirrors of the reference's conversion layer:
- SampleRateConverter (/root/reference/src/conversions/sample_rate.rs:52-201)
- ChannelCountConverter (/root/reference/src/conversions/channels.rs:28-102)
- UniformSourceIterator (/root/reference/src/source/uniform.rs:33-145)
"""
from __future__ import annotations

import math
from collections import deque
from typing import Optional

import numpy as np

from ..core.math import lerp
from .core import Source

F = np.float32


class _Take:
    """Bounded pull adapter (src/source/uniform.rs:147-199)."""

    def __init__(self, source: Source, n: Optional[int]):
        self.source = source
        self.n = n

    def next(self):
        if self.n is not None:
            if self.n == 0:
                return None
            self.n -= 1
        return self.source.next()


class SampleRateConverter:
    """Rational linear-interpolation resampler, iterator over an inner
    iterator-like object with ``next()``.

    Reduces to/from by their gcd (src/conversions/sample_rate.rs:74), then for
    every chunk of ``from`` input frames emits ``to`` output frames, where
    output j interpolates between input frames floor(from*j/to) and the next
    with fraction ((from*j) mod to)/to; on downsample whole input frames are
    skipped (src/conversions/sample_rate.rs:131-201). End-of-stream: the zip
    against a partial next_frame truncates and the remaining current_span is
    drained as-is (src/conversions/sample_rate.rs:192-200).
    """

    def __init__(self, inner, from_rate: int, to_rate: int, channels: int):
        assert from_rate > 0 and to_rate > 0 and channels > 0
        self.input = inner
        g = math.gcd(from_rate, to_rate)
        self.from_ = from_rate // g
        self.to = to_rate // g
        self.channels = channels
        if from_rate == to_rate:
            self.current_span = []
            self.next_frame = []
        else:
            self.current_span = self._take_frame()
            self.next_frame = self._take_frame()
        self.current_span_pos_in_chunk = 0
        self.next_output_span_pos_in_chunk = 0
        self.output_buffer = deque()

    def _take_frame(self):
        frame = []
        for _ in range(self.channels):
            v = self.input.next()
            if v is None:
                break
            frame.append(v)
        return frame

    def _next_input_span(self):
        self.current_span_pos_in_chunk += 1
        self.current_span = self.next_frame
        self.next_frame = self._take_frame()

    def next(self):
        if self.from_ == self.to:
            return self.input.next()

        if self.output_buffer:
            return self.output_buffer.popleft()

        if self.next_output_span_pos_in_chunk == self.to:
            self.next_output_span_pos_in_chunk = 0
            self._next_input_span()
            while self.current_span_pos_in_chunk != self.from_:
                self._next_input_span()
            self.current_span_pos_in_chunk = 0
        else:
            req_left_sample = (
                self.from_ * self.next_output_span_pos_in_chunk // self.to
            ) % self.from_
            while self.current_span_pos_in_chunk != req_left_sample:
                self._next_input_span()
                assert self.current_span_pos_in_chunk < self.from_

        result = None
        numerator = (self.from_ * self.next_output_span_pos_in_chunk) % self.to
        for off, (cur, nxt) in enumerate(zip(self.current_span, self.next_frame)):
            sample = lerp(cur, nxt, numerator, self.to)
            if off == 0:
                result = sample
            else:
                self.output_buffer.append(sample)

        self.next_output_span_pos_in_chunk += 1

        if result is not None:
            return result
        # draining current_span
        if not self.current_span:
            return None
        r = self.current_span[0]
        self.output_buffer.extend(self.current_span[1:])
        self.current_span = []
        return r


class ChannelCountConverter:
    """Positional up/down-mix (src/conversions/channels.rs:57-84): mono->N
    duplicates ch0 into ch1 and zero-fills ch>=2; N->M drops extra channels."""

    def __init__(self, inner, from_channels: int, to_channels: int):
        assert from_channels > 0 and to_channels > 0
        self.input = inner
        self.from_ = from_channels
        self.to = to_channels
        self.sample_repeat = None
        self.next_output_sample_pos = 0

    def next(self):
        pos = self.next_output_sample_pos
        if pos == 0:
            value = self.input.next()
            self.sample_repeat = value
            result = value
        elif pos < self.from_:
            result = self.input.next()
        elif pos == 1:
            result = self.sample_repeat
        else:
            result = F(0.0)

        if result is not None:
            self.next_output_sample_pos += 1

        if self.next_output_sample_pos == self.to:
            self.next_output_sample_pos = 0
            if self.from_ > self.to:
                for _ in range(self.to, self.from_):
                    self.input.next()

        return result


class UniformSourceIterator(Source):
    """Wraps any Source into a fixed (channels, rate) stream forever
    (src/source/uniform.rs:33-145).

    Per input span it re-bootstraps ChannelCount(SampleRate(Take(input)))
    with the span capped at 32768 samples; reports current_span_len=None.
    """

    def __init__(self, input_source: Source, target_channels: int,
                 target_sample_rate: int):
        self._target_channels = target_channels
        self._target_rate = target_sample_rate
        self._total_ns = input_source.total_duration_ns()
        self._pending: Optional[Source] = input_source
        self._inner: Optional[ChannelCountConverter] = None

    @staticmethod
    def _bootstrap(input_source: Source, channels: int, rate: int):
        span_len = input_source.current_span_len()
        if span_len is not None:
            span_len = min(span_len, 32768)
        from_channels = input_source.channels()
        from_rate = input_source.sample_rate()
        take = _Take(input_source, span_len)
        src = SampleRateConverter(take, from_rate, rate, from_channels)
        return ChannelCountConverter(src, from_channels, channels)

    def next(self):
        if self._inner is not None:
            v = self._inner.next()
            if v is not None:
                return v
            input_source = self._inner.input.input.source
        else:
            input_source = self._pending
            self._pending = None
            assert input_source is not None, "pending is Some when inner is None"

        inner = UniformSourceIterator._bootstrap(
            input_source, self._target_channels, self._target_rate
        )
        value = inner.next()
        self._inner = inner
        return value

    def current_span_len(self):
        return None

    def channels(self):
        return self._target_channels

    def sample_rate(self):
        return self._target_rate

    def total_duration_ns(self):
        return self._total_ns

    def try_seek(self, pos_ns: int) -> None:
        if self._inner is not None:
            self._inner.input.input.source.try_seek(pos_ns)
        elif self._pending is not None:
            self._pending.try_seek(pos_ns)
