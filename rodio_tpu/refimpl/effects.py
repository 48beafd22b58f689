"""Scalar reference engine: effects and control-flow wrappers.

Per-sample mirrors of the reference's src/source/* effect iterators. Each
class documents the file it models. All durations are integer nanoseconds.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from ..core.math import db_to_linear, duration_to_coefficient, linear_to_db
from ..core.types import NANOS_PER_SEC, nanos_to_secs_f32
from .conversions import UniformSourceIterator
from .core import Source, SpanTracker, padding_samples_needed

F = np.float32
TINY = np.float32(np.finfo(np.float32).tiny)  # Sample::MIN_POSITIVE


class _Passthrough(Source):
    """Base for effects that delegate all metadata to their input."""

    def __init__(self, input_source: Source):
        self.input = input_source

    def current_span_len(self):
        return self.input.current_span_len()

    def channels(self):
        return self.input.channels()

    def sample_rate(self):
        return self.input.sample_rate()

    def total_duration_ns(self):
        return self.input.total_duration_ns()

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)


class Amplify(_Passthrough):
    """sample * factor (src/source/amplify.rs:10-22)."""

    def __init__(self, input_source: Source, factor: float):
        super().__init__(input_source)
        self.factor = F(factor)

    def set_factor(self, factor: float):
        self.factor = F(factor)

    def set_log_factor(self, factor: float):
        self.factor = db_to_linear(F(factor))

    def next(self):
        v = self.input.next()
        return None if v is None else F(v * self.factor)


class Distortion(_Passthrough):
    """Hard clip (x*gain).clamp(-t, t) (src/source/distortion.rs:66-72)."""

    def __init__(self, input_source: Source, gain: float, threshold: float):
        super().__init__(input_source)
        self.gain = F(gain)
        self.threshold = F(threshold)

    def next(self):
        v = self.input.next()
        if v is None:
            return None
        return F(np.clip(F(v * self.gain), -self.threshold, self.threshold))


class LinearGainRamp(_Passthrough):
    """Linear gain over a duration (src/source/linear_ramp.rs:9-120).

    The elapsed clock advances by one *frame* duration each time sample_idx
    crosses a channel boundary, using nanosecond integer arithmetic; the gain
    factor is start*(1-p) + end*p with p = secs_f32(elapsed)/secs_f32(total).
    """

    def __init__(self, input_source: Source, duration_ns: int, start_gain: float,
                 end_gain: float, clamp_end: bool):
        assert duration_ns > 0, "duration must be greater than zero"
        super().__init__(input_source)
        self.elapsed_ns = 0
        self.total_ns = duration_ns
        self.start_gain = F(start_gain)
        self.end_gain = F(end_gain)
        self.clamp_end = clamp_end
        self.sample_idx = 0
        self.span = SpanTracker(input_source.sample_rate(), input_source.channels())

    def next(self):
        self.span.advance(self.input)

        if self.elapsed_ns >= self.total_ns:
            factor = self.end_gain if self.clamp_end else F(1.0)
        else:
            self.sample_idx += 1
            p = F(
                nanos_to_secs_f32(self.elapsed_ns)
            ) / F(nanos_to_secs_f32(self.total_ns))
            factor = F(self.start_gain * (F(1.0) - p) + self.end_gain * p)

        if self.sample_idx % self.input.channels() == 0:
            self.elapsed_ns += NANOS_PER_SEC // self.input.sample_rate()

        v = self.input.next()
        return None if v is None else F(v * factor)

    def try_seek(self, pos_ns: int) -> None:
        self.elapsed_ns = pos_ns
        self.input.try_seek(pos_ns)
        self.span.seek(pos_ns, self.input)


def fade_in(input_source: Source, duration_ns: int) -> LinearGainRamp:
    """(src/source/fadein.rs:8)"""
    return LinearGainRamp(input_source, duration_ns, 0.0, 1.0, False)


def fade_out(input_source: Source, duration_ns: int) -> LinearGainRamp:
    """(src/source/fadeout.rs:8)"""
    return LinearGainRamp(input_source, duration_ns, 1.0, 0.0, True)


class TakeDuration(Source):
    """Stop after a duration, padding the final frame with silence
    (src/source/take.rs:10-216). duration_per_sample = floor(1e9/(rate*ch)) ns."""

    def __init__(self, input_source: Source, duration_ns: int):
        self.input = input_source
        self.remaining_ns = duration_ns
        self.requested_ns = duration_ns
        self.filter_fadeout = False
        self.dps_ns = self._get_dps()
        self.span = SpanTracker(input_source.sample_rate(), input_source.channels())
        self.samples_in_current_frame = 0
        self.silence_samples_remaining = 0

    def _get_dps(self):
        return NANOS_PER_SEC // (
            self.input.sample_rate() * self.input.channels()
        )

    def set_filter_fadeout(self):
        self.filter_fadeout = True

    def next(self):
        while True:
            if self.silence_samples_remaining > 0:
                self.silence_samples_remaining -= 1
                return F(0.0)

            if self.remaining_ns < self.dps_ns:
                self.silence_samples_remaining = padding_samples_needed(
                    self.samples_in_current_frame, self.span.last_channels
                )
                if self.silence_samples_remaining > 0:
                    self.samples_in_current_frame = 0
                    continue
                return None

            sample = self.input.next()
            if sample is None:
                return None

            at_boundary, params_changed = self.span.advance(self.input)
            if at_boundary and params_changed:
                self.dps_ns = self._get_dps()
                self.samples_in_current_frame = 0

            self.samples_in_current_frame = (
                self.samples_in_current_frame + 1
            ) % self.input.channels()

            if self.filter_fadeout:
                # as_millis truncates to integer milliseconds (src/source/take.rs:36-38)
                remaining = F(self.remaining_ns // 1_000_000)
                total = F(self.requested_ns // 1_000_000)
                sample = F(F(sample * remaining) / total)

            self.remaining_ns -= self.dps_ns
            return F(sample)

    def current_span_len(self):
        if self.dps_ns == 0 or self.remaining_ns == 0:
            return 0
        remaining_samples = self.remaining_ns // self.dps_ns
        inner = self.input.current_span_len()
        if inner is not None and inner < remaining_samples:
            return inner
        return remaining_samples

    def channels(self):
        return self.input.channels()

    def sample_rate(self):
        return self.input.sample_rate()

    def total_duration_ns(self):
        inner = self.input.total_duration_ns()
        if inner is None:
            return None
        return min(inner, self.requested_ns)

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)
        self.remaining_ns = max(0, self.requested_ns - pos_ns)
        self.span.seek(pos_ns, self.input)
        self.samples_in_current_frame = 0


def skip_duration(input_source: Source, duration_ns: int) -> "SkipDuration":
    """Eagerly drain a duration span-by-span (src/source/skip.rs:275-339)."""
    duration = duration_ns
    while duration > 0:
        span_len = input_source.current_span_len()
        if span_len is None:
            samples_per_channel = (
                duration * input_source.sample_rate()
            ) // NANOS_PER_SEC
            n = samples_per_channel * input_source.channels()
            for _ in range(n):
                if input_source.next() is None:
                    break
            break
        if span_len == 0:
            break
        rate = input_source.sample_rate()
        channels = input_source.channels()
        samples_per_channel = duration * rate // NANOS_PER_SEC
        samples_to_skip = samples_per_channel * channels
        if span_len > samples_to_skip:
            for _ in range(samples_to_skip):
                if input_source.next() is None:
                    break
            break
        duration -= NANOS_PER_SEC * span_len // channels // rate
        for _ in range(span_len):
            if input_source.next() is None:
                break
    return SkipDuration(input_source, duration_ns)


class SkipDuration(_Passthrough):
    """Post-skip passthrough wrapper (src/source/skip.rs:341-416)."""

    def __init__(self, input_source: Source, skipped_ns: int):
        super().__init__(input_source)
        self.skipped_ns = skipped_ns

    def next(self):
        return self.input.next()

    def total_duration_ns(self):
        inner = self.input.total_duration_ns()
        return None if inner is None else max(0, inner - self.skipped_ns)

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns + self.skipped_ns)


class Delay(_Passthrough):
    """Emit d*rate*ch zeros before the input (src/source/delay.rs:522-637)."""

    def __init__(self, input_source: Source, duration_ns: int):
        super().__init__(input_source)
        self.requested_ns = duration_ns
        self.remaining_samples = self._remaining(duration_ns)

    def _remaining(self, until_playback_ns: int) -> int:
        return (
            until_playback_ns
            * self.input.channels()
            * self.input.sample_rate()
            // NANOS_PER_SEC
        )

    def next(self):
        if self.remaining_samples >= 1:
            self.remaining_samples -= 1
            return F(0.0)
        return self.input.next()

    def current_span_len(self):
        inner = self.input.current_span_len()
        return None if inner is None else inner + self.remaining_samples

    def total_duration_ns(self):
        inner = self.input.total_duration_ns()
        return None if inner is None else inner + self.requested_ns

    def try_seek(self, pos_ns: int) -> None:
        if pos_ns < self.requested_ns:
            self.input.try_seek(0)
            self.remaining_samples = self._remaining(self.requested_ns - pos_ns)
        self.input.try_seek(max(0, pos_ns - self.requested_ns))


class Mix(Source):
    """Pairwise sum; both inputs uniformized to input1's format; continues
    while either side yields (src/source/mix.rs:10-56)."""

    def __init__(self, input1: Source, input2: Source):
        channels = input1.channels()
        rate = input1.sample_rate()
        self.input1 = UniformSourceIterator(input1, channels, rate)
        self.input2 = UniformSourceIterator(input2, channels, rate)

    def next(self):
        s1 = self.input1.next()
        s2 = self.input2.next()
        if s1 is not None and s2 is not None:
            return F(s1 + s2)
        if s1 is not None:
            return s1
        return s2

    def current_span_len(self):
        f1 = self.input1.current_span_len()
        f2 = self.input2.current_span_len()
        if f1 is not None and f2 is not None:
            return min(f1, f2)
        return None

    def channels(self):
        return self.input1.channels()

    def sample_rate(self):
        return self.input1.sample_rate()

    def total_duration_ns(self):
        f1 = self.input1.total_duration_ns()
        f2 = self.input2.total_duration_ns()
        if f1 is not None and f2 is not None:
            return max(f1, f2)
        return None


def reverb(source_factory_a: Source, source_factory_b: Source,
           duration_ns: int, amplitude: float) -> Mix:
    """Echo combinator self.mix(clone.amplify(a).delay(d))
    (src/source/mod.rs:628-634). Callers pass two clones of a Buffered."""
    echo = Delay(Amplify(source_factory_b, amplitude), duration_ns)
    return Mix(source_factory_a, echo)


class _BltApplier:
    __slots__ = ("b0", "b1", "b2", "a1", "a2")

    def __init__(self, b0, b1, b2, a1, a2):
        self.b0, self.b1, self.b2, self.a1, self.a2 = (
            F(b0), F(b1), F(b2), F(a1), F(a2),
        )

    def apply(self, x, x1, x2, y1, y2):
        return F(
            self.b0 * x + self.b1 * x1 + self.b2 * x2 - self.a1 * y1 - self.a2 * y2
        )


def blt_coefficients(kind: str, sample_rate: int, freq: float, q: float) -> _BltApplier:
    """Audio-EQ-Cookbook biquad synthesis in f32 (src/source/blt.rs:502-545)."""
    w0 = F(F(2.0) * F(np.pi) * F(freq) / F(sample_rate))
    alpha = F(F(np.sin(w0)) / F(2.0 * F(q)))
    cos_w0 = F(np.cos(w0))
    if kind == "low_pass":
        b1 = F(1.0) - cos_w0
        b0 = F(b1 / F(2.0))
        b2 = b0
        a0 = F(1.0) + alpha
        a1 = F(-2.0) * cos_w0
        a2 = F(1.0) - alpha
    elif kind == "high_pass":
        b0 = F((F(1.0) + cos_w0) / F(2.0))
        b1 = F(-1.0) - cos_w0
        b2 = b0
        a0 = F(1.0) + alpha
        a1 = F(-2.0) * cos_w0
        a2 = F(1.0) - alpha
    else:
        raise ValueError(kind)
    return _BltApplier(
        F(b0 / a0), F(b1 / a0), F(b2 / a0), F(a1 / a0), F(a2 / a0)
    )


class BltFilter(_Passthrough):
    """Direct-form-I biquad with per-channel history (src/source/blt.rs:56-493).

    Coefficients are recomputed when the sample rate changes at a span
    boundary; channel-count changes rebuild zeroed state.
    """

    def __init__(self, input_source: Source, kind: str, freq: float, q: float = 0.5):
        super().__init__(input_source)
        self.kind = kind
        self.freq = freq
        self.q = q
        self.span = SpanTracker(input_source.sample_rate(), input_source.channels())
        self._rebuild(input_source.channels(), input_source.sample_rate())

    def _rebuild(self, channels: int, rate: int):
        self.applier = blt_coefficients(self.kind, rate, self.freq, self.q)
        n = channels
        self.x1 = [F(0.0)] * n
        self.x2 = [F(0.0)] * n
        self.y1 = [F(0.0)] * n
        self.y2 = [F(0.0)] * n
        self.position = 0

    def to_low_pass(self, freq: float, q: float = 0.5):
        self.kind, self.freq, self.q = "low_pass", freq, q
        self.applier = blt_coefficients(
            self.kind, self.input.sample_rate(), freq, q
        )

    def to_high_pass(self, freq: float, q: float = 0.5):
        self.kind, self.freq, self.q = "high_pass", freq, q
        self.applier = blt_coefficients(
            self.kind, self.input.sample_rate(), freq, q
        )

    def next(self):
        sample = self.input.next()
        if sample is None:
            return None

        c = self.position
        self.position = (self.position + 1) % len(self.x1)
        result = self.applier.apply(
            sample, self.x1[c], self.x2[c], self.y1[c], self.y2[c]
        )
        self.y2[c] = self.y1[c]
        self.x2[c] = self.x1[c]
        self.y1[c] = result
        self.x1[c] = sample

        at_boundary, params_changed = self.span.advance(self.input)
        if at_boundary and params_changed:
            # NOTE: the reference filters the *current* sample with the old
            # coefficients and reconfigures afterwards (src/source/blt.rs:119-140)
            current_rate = self.input.sample_rate()
            current_channels = self.input.channels()
            if current_channels != len(self.x1):
                self._rebuild(current_channels, current_rate)
            else:
                self.applier = blt_coefficients(
                    self.kind, current_rate, self.freq, self.q
                )

        return result

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)
        n = len(self.x1)
        self.x1 = [F(0.0)] * n
        self.x2 = [F(0.0)] * n
        self.y1 = [F(0.0)] * n
        self.y2 = [F(0.0)] * n
        self.position = 0
        self.span.seek(pos_ns, self.input)


class LimitSettings:
    """(src/source/limit.rs:209-245) threshold dBFS, knee dB, attack/release ns."""

    def __init__(self, threshold=-1.0, knee_width=4.0,
                 attack_ns=5_000_000, release_ns=100_000_000):
        self.threshold = threshold
        self.knee_width = knee_width
        self.attack_ns = attack_ns
        self.release_ns = release_ns

    @classmethod
    def default(cls):
        return cls()

    @classmethod
    def dynamic_content(cls):
        return cls(threshold=-3.0, knee_width=6.0)

    @classmethod
    def broadcast(cls):
        return cls(knee_width=2.0, attack_ns=3_000_000, release_ns=50_000_000)

    @classmethod
    def mastering(cls):
        return cls(threshold=-0.5, knee_width=1.0, attack_ns=1_000_000,
                   release_ns=200_000_000)

    @classmethod
    def live_performance(cls):
        return cls(threshold=-2.0, knee_width=3.0, attack_ns=500_000,
                   release_ns=30_000_000)

    @classmethod
    def gaming(cls):
        return cls(threshold=-3.0, knee_width=3.0, attack_ns=2_000_000,
                   release_ns=75_000_000)


def _limit_process_sample(sample, threshold, knee_width, inv_knee_8):
    """Soft-knee gain computer in dB (src/source/limit.rs:854-873)."""
    bias_db = F(linear_to_db(F(np.abs(sample) + TINY)) - threshold)
    knee_boundary_db = F(bias_db * F(2.0))
    if knee_boundary_db < -knee_width:
        return F(0.0)
    if np.abs(knee_boundary_db) <= knee_width:
        x = F(knee_boundary_db + knee_width)
        return F(F(x * x) * inv_knee_8)
    return bias_db


class Limit(_Passthrough):
    """Feedforward peak limiter, Giannoulis et al. 2012
    (src/source/limit.rs:563-1159).

    Per-channel dual-stage envelope: integrator = max(db, rel*int+(1-rel)*db),
    peak = att*peak + (1-att)*int; coupled gain = db_to_linear(-max peaks).
    """

    def __init__(self, input_source: Source, settings: LimitSettings):
        super().__init__(input_source)
        rate = input_source.sample_rate()
        self.threshold = F(settings.threshold)
        self.knee_width = F(settings.knee_width)
        self.inv_knee_8 = F(F(1.0) / F(F(8.0) * self.knee_width))
        self.attack = duration_to_coefficient(0, rate, nanos=settings.attack_ns)
        self.release = duration_to_coefficient(0, rate, nanos=settings.release_ns)
        n = input_source.channels()
        self.integrators = [F(0.0)] * n
        self.peaks = [F(0.0)] * n
        self.position = 0
        self.span = SpanTracker(rate, n)

    def next(self):
        sample = self.input.next()
        if sample is None:
            return None

        c = self.position
        self.position = (self.position + 1) % len(self.integrators)

        limiter_db = _limit_process_sample(
            sample, self.threshold, self.knee_width, self.inv_knee_8
        )
        self.integrators[c] = F(
            max(
                limiter_db,
                F(
                    self.release * self.integrators[c]
                    + F(F(1.0) - self.release) * limiter_db
                ),
            )
        )
        self.peaks[c] = F(
            self.attack * self.peaks[c]
            + F(F(1.0) - self.attack) * self.integrators[c]
        )

        if len(self.peaks) == 1:
            max_peak = self.peaks[0]
        elif len(self.peaks) == 2:
            max_peak = max(self.peaks[0], self.peaks[1])
        else:
            max_peak = F(0.0)
            for p in self.peaks:
                max_peak = max(max_peak, p)
        out = F(sample * db_to_linear(F(-max_peak)))

        at_boundary, params_changed = self.span.advance(self.input)
        if at_boundary and params_changed:
            n = self.input.channels()
            if n != len(self.integrators):
                self.integrators = [F(0.0)] * n
                self.peaks = [F(0.0)] * n
                self.position = 0

        return out

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)
        n = len(self.integrators)
        self.integrators = [F(0.0)] * n
        self.peaks = [F(0.0)] * n
        self.span.seek(pos_ns, self.input)


RMS_WINDOW_SIZE = 8192


class AgcSettings:
    """(src/source/agc.rs:57-82)"""

    def __init__(self, target_level=1.0, attack_ns=4_000_000_000,
                 release_ns=0, absolute_max_gain=7.0):
        self.target_level = target_level
        self.attack_ns = attack_ns
        self.release_ns = release_ns
        self.absolute_max_gain = absolute_max_gain


class AutomaticGainControl(_Passthrough):
    """AGC with peak detector + 8192-sample RMS window + asymmetric smoothing
    (src/source/agc.rs:89-557). State is shared across channels (interleaved
    samples all feed one window), matching the reference."""

    def __init__(self, input_source: Source, settings: AgcSettings):
        super().__init__(input_source)
        rate = input_source.sample_rate()
        # Source::automatic_gain_control clamps times to 10 s
        # (src/source/mod.rs:432-433)
        attack_ns = min(settings.attack_ns, 10_000_000_000)
        release_ns = min(settings.release_ns, 10_000_000_000)
        self.attack_ns = attack_ns
        self.release_ns = release_ns
        self.target_level = F(settings.target_level)
        self.absolute_max_gain = F(settings.absolute_max_gain)
        self.attack_coeff = duration_to_coefficient(0, rate, nanos=attack_ns)
        self.release_coeff = duration_to_coefficient(0, rate, nanos=release_ns)
        self.current_gain = F(1.0)
        self.peak_level = F(0.0)
        self.floor = F(0.0)
        self.rms_window = np.zeros(RMS_WINDOW_SIZE, dtype=np.float32)
        self.rms_sum = F(0.0)
        self.rms_index = 0
        self.is_enabled = True
        self.span = SpanTracker(rate, input_source.channels())

    def next(self):
        at_boundary, params_changed = self.span.advance(self.input)
        if at_boundary and params_changed:
            rate = self.input.sample_rate()
            self.attack_coeff = duration_to_coefficient(0, rate, nanos=self.attack_ns)
            self.release_coeff = duration_to_coefficient(0, rate, nanos=self.release_ns)
            self.rms_window[:] = 0.0
            self.rms_sum = F(0.0)
            self.rms_index = 0
            self.peak_level = F(0.0)
            self.current_gain = F(1.0)

        sample = self.input.next()
        if sample is None:
            return None
        if not self.is_enabled:
            return sample

        sample_value = F(np.abs(sample))

        # peak detector: instant attack, slow release (src/source/agc.rs:397-407)
        coeff = F(0.0) if sample_value > self.peak_level else self.release_coeff
        self.peak_level = F(
            self.peak_level * coeff + sample_value * F(F(1.0) - coeff)
        )

        # RMS over circular window with running sum (src/source/agc.rs:133-171)
        squared = F(sample_value * sample_value)
        old = self.rms_window[self.rms_index]
        self.rms_sum = F(F(self.rms_sum - old) + squared)
        self.rms_window[self.rms_index] = squared
        self.rms_index = (self.rms_index + 1) & (RMS_WINDOW_SIZE - 1)
        rms = F(np.sqrt(F(self.rms_sum / F(RMS_WINDOW_SIZE))))

        rms_gain = (
            F(self.target_level / rms) if rms > 0.0 else self.absolute_max_gain
        )
        if self.peak_level > 0.0:
            peak_gain = F(
                min(F(self.target_level / self.peak_level), self.absolute_max_gain)
            )
        else:
            peak_gain = self.absolute_max_gain

        desired_gain = F(max(min(rms_gain, peak_gain), self.floor))

        attack_speed = (
            self.attack_coeff if desired_gain > self.current_gain
            else self.release_coeff
        )
        self.current_gain = F(
            self.current_gain * attack_speed
            + desired_gain * F(F(1.0) - attack_speed)
        )
        self.current_gain = F(
            np.clip(self.current_gain, F(0.1), self.absolute_max_gain)
        )

        return F(sample * self.current_gain)

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)
        self.span.seek(pos_ns, self.input)


class ChannelVolume(Source):
    """Downmix each frame to mono (mean), emit mono*volume[ch] per output
    channel (src/source/channel_volume.rs:12-115)."""

    def __init__(self, input_source: Source, channel_volumes: Sequence[float]):
        self.input = input_source
        self.channel_volumes = [F(v) for v in channel_volumes]
        self.current_channel = len(self.channel_volumes)
        self.current_sample: Optional[np.float32] = None

    def set_volume(self, channel: int, volume: float):
        self.channel_volumes[channel] = F(volume)

    def next(self):
        if self.current_channel >= len(self.channel_volumes):
            self.current_channel = 0
            self.current_sample = None
            for _ in range(self.input.channels()):
                s = self.input.next()
                if s is None:
                    self.current_sample = None
                    break
                base = self.current_sample if self.current_sample is not None else F(0.0)
                self.current_sample = F(base + s)
            else:
                self.current_sample = F(
                    self.current_sample / F(self.input.channels())
                )
            if self.current_sample is None:
                self.current_channel = len(self.channel_volumes)
                return None
        result = F(self.current_sample * self.channel_volumes[self.current_channel])
        self.current_channel += 1
        return result

    def current_span_len(self):
        return self.input.current_span_len()

    def channels(self):
        return len(self.channel_volumes)

    def sample_rate(self):
        return self.input.sample_rate()

    def total_duration_ns(self):
        return self.input.total_duration_ns()

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)


def spatial_volumes(emitter_pos, left_ear, right_ear):
    """L/R gains from emitter/ear geometry (src/source/spatial.rs:48-69):
    inverse-square distance x interaural difference modifier. f32 math."""
    e = np.asarray(emitter_pos, dtype=np.float32)
    l = np.asarray(left_ear, dtype=np.float32)
    r = np.asarray(right_ear, dtype=np.float32)

    def dist_sq(a, b):
        d = a - b
        return F(np.sum(d * d, dtype=np.float32))

    def rust_min(a, b):
        # f32::min semantics: if one operand is NaN, return the other.
        # Python's min() would propagate a NaN first argument instead.
        if np.isnan(a):
            return b
        if np.isnan(b):
            return a
        return min(a, b)

    left_dist_sq = dist_sq(l, e)
    right_dist_sq = dist_sq(r, e)
    max_diff = F(np.sqrt(dist_sq(l, r)))
    left_dist = F(np.sqrt(left_dist_sq))
    right_dist = F(np.sqrt(right_dist_sq))
    with np.errstate(divide="ignore", invalid="ignore"):
        # coincident ears (max_diff=0) give 0/0=NaN -> modifier 1.0 via
        # rust_min; emitter at an ear (dist_sq=0) gives 1/0=inf -> 1.0
        left_diff_modifier = rust_min(
            F(F(F(F(left_dist - right_dist) / max_diff + F(1.0)) / F(4.0)) + F(0.5)),
            F(1.0),
        )
        right_diff_modifier = rust_min(
            F(F(F(F(right_dist - left_dist) / max_diff + F(1.0)) / F(4.0)) + F(0.5)),
            F(1.0),
        )
        left_dist_modifier = rust_min(F(F(1.0) / left_dist_sq), F(1.0))
        right_dist_modifier = rust_min(F(F(1.0) / right_dist_sq), F(1.0))
    return (
        F(left_diff_modifier * left_dist_modifier),
        F(right_diff_modifier * right_dist_modifier),
    )


class Spatial(ChannelVolume):
    """ChannelVolume with gains from 3D geometry (src/source/spatial.rs:12-44)."""

    def __init__(self, input_source: Source, emitter_position, left_ear, right_ear):
        super().__init__(input_source, [0.0, 0.0])
        self.set_positions(emitter_position, left_ear, right_ear)

    def set_positions(self, emitter_pos, left_ear, right_ear):
        lvol, rvol = spatial_volumes(emitter_pos, left_ear, right_ear)
        self.set_volume(0, lvol)
        self.set_volume(1, rvol)


class Pausable(_Passthrough):
    """Emits frames of zeros while paused (src/source/pausable.rs:7-96)."""

    def __init__(self, input_source: Source, initially_paused: bool):
        super().__init__(input_source)
        self.paused_channels = input_source.channels() if initially_paused else None
        self.remaining_paused_samples = 0

    def set_paused(self, paused: bool):
        if paused and self.paused_channels is None:
            self.paused_channels = self.input.channels()
        elif not paused:
            self.paused_channels = None

    def is_paused(self):
        return self.paused_channels is not None

    def next(self):
        if self.remaining_paused_samples > 0:
            self.remaining_paused_samples -= 1
            return F(0.0)
        if self.paused_channels is not None:
            self.remaining_paused_samples = self.paused_channels - 1
            return F(0.0)
        return self.input.next()


class Stoppable(_Passthrough):
    """Flag-based early end (src/source/stoppable.rs:8-27)."""

    def __init__(self, input_source: Source):
        super().__init__(input_source)
        self.stopped = False

    def stop(self):
        self.stopped = True

    def next(self):
        return None if self.stopped else self.input.next()

    def current_span_len(self):
        return 0 if self.stopped else self.input.current_span_len()


class Skippable(_Passthrough):
    """skip() makes next() return None (src/source/skippable.rs:10-37)."""

    def __init__(self, input_source: Source):
        super().__init__(input_source)
        self.do_skip = False

    def skip(self):
        self.do_skip = True

    def skipped(self):
        return self.do_skip

    def next(self):
        return None if self.do_skip else self.input.next()

    def current_span_len(self):
        return 0 if self.do_skip else self.input.current_span_len()


class Done(_Passthrough):
    """Invoke callback once on exhaustion (src/source/done.rs:10-32)."""

    def __init__(self, input_source: Source, callback: Callable[[Source], None]):
        super().__init__(input_source)
        self.callback = callback
        self.signal_sent = False

    def next(self):
        v = self.input.next()
        if v is None and not self.signal_sent:
            self.signal_sent = True
            self.callback(self.input)
        return v


class PeriodicAccess(_Passthrough):
    """Run a modifier every `period` of playback time, sample-counted
    (src/source/periodic.rs:14-86). First access happens on the first pull."""

    def __init__(self, input_source: Source, period_ns: int,
                 modifier: Callable[[Source], None]):
        super().__init__(input_source)
        secs = np.float32(period_ns) / np.float32(NANOS_PER_SEC)
        freq = int(
            F(secs)
            * np.float32(input_source.sample_rate())
            * np.float32(input_source.channels())
        )
        self.update_frequency = max(freq, 1)
        self.samples_until_update = 1
        self.modifier = modifier

    def next(self):
        self.samples_until_update -= 1
        if self.samples_until_update == 0:
            self.modifier(self.input)
            self.samples_until_update = self.update_frequency
        return self.input.next()


class TrackPosition(_Passthrough):
    """Playback position tracking (src/source/position.rs:10-100)."""

    def __init__(self, input_source: Source):
        super().__init__(input_source)
        self.offset_duration = 0.0
        self.span = SpanTracker(input_source.sample_rate(), input_source.channels())

    def get_pos_secs(self) -> float:
        return (
            self.span.samples_counted
            / self.input.sample_rate()
            / self.input.channels()
            + self.offset_duration
        )

    def next(self):
        item = self.input.next()
        if item is None:
            return None
        samples_before = self.span.samples_counted
        old_rate = self.span.last_sample_rate
        old_channels = self.span.last_channels
        at_boundary, _ = self.span.advance(self.input)
        if at_boundary:
            completed = samples_before + 1
            self.offset_duration += completed / old_rate / old_channels
        return item

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(pos_ns)
        self.offset_duration = pos_ns / NANOS_PER_SEC
        self.span.seek(pos_ns, self.input)


class Speed(_Passthrough):
    """Metadata-only speed change (src/source/speed.rs:56-144)."""

    def __init__(self, input_source: Source, factor: float):
        super().__init__(input_source)
        self.factor = factor

    def set_factor(self, factor: float):
        self.factor = factor

    def next(self):
        return self.input.next()

    def sample_rate(self):
        return max(1, int(self.input.sample_rate() * np.float32(self.factor)))

    def total_duration_ns(self):
        inner = self.input.total_duration_ns()
        return None if inner is None else int(inner / self.factor)

    def try_seek(self, pos_ns: int) -> None:
        self.input.try_seek(int(pos_ns * self.factor))


def take_crossfade_with(input_fadeout: Source, input_fadein: Source,
                        duration_ns: int) -> Mix:
    """Crossfade (src/source/crossfade.rs:10-30)."""
    out = TakeDuration(input_fadeout, duration_ns)
    out.set_filter_fadeout()
    fin = fade_in(TakeDuration(input_fadein, duration_ns), duration_ns)
    return Mix(out, fin)
