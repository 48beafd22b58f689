"""Generator sources: waveforms, chirp, silence, buffers.

TPU-native rebuild of the reference's generator layer
(src/source/signal_generator.rs, sine.rs, square.rs, triangle.rs,
sawtooth.rs, chirp.rs, zero.rs, empty.rs, buffer.rs).

Design note: the reference accumulates generator phase one f32 add per
sample (src/source/signal_generator.rs:133), which drifts by ~1e-4 over
minutes. The block engine instead uses a drift-free closed form: per-block
phase increments are computed in f64 at TRACE time (block offsets are
static), and only one f32 carry rounding happens per block. This is both
more accurate than the reference and fully parallel — no scan needed.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State, clip_valid, mask_block
from ..core.types import DEFAULT_SAMPLE_RATE, StreamSpec, float_dtype


def _frac64(x: np.ndarray) -> np.ndarray:
    return x - np.floor(x)


class SignalGenerator(Node):
    """Periodic waveform generator: sine/triangle/square/sawtooth.

    Mono, infinite, codomain [-1, 1] (src/source/signal_generator.rs:73-170).
    """

    def __init__(self, sample_rate: int, frequency: float, function,
                 *, rodio_compat: bool = False):
        """``function`` is a name or a callable phase->sample over jnp
        arrays (the GeneratorFunction extension point,
        src/source/signal_generator.rs:36).

        ``rodio_compat=True`` reproduces the reference's per-sample f32
        phase accumulator ``phase = (phase + step).rem_euclid(1.0)``
        (src/source/signal_generator.rs:133) as a lax.scan, including its
        ~1e-4/minute drift — for parity testing against rodio renders.
        The default closed form is drift-free (more accurate) and fully
        parallel."""
        if frequency <= 0.0:
            raise ValueError("frequency must be greater than zero")
        if not callable(function) and function not in (
            "sine", "triangle", "square", "sawtooth"
        ):
            raise ValueError(f"unknown generator function {function!r}")
        self.spec = StreamSpec(1, sample_rate)
        self.frequency = float(frequency)
        self.function = function
        self.rodio_compat = bool(rodio_compat)
        # reference computes period = rate/freq and step = 1/period in f32
        # (src/source/signal_generator.rs:113-114); we keep f64 for the
        # closed form and round per block.
        self._step64 = float(
            1.0 / (np.float64(sample_rate) / np.float64(frequency))
        )
        self._step32 = float(
            np.float32(1.0)
            / (np.float32(sample_rate) / np.float32(frequency))
        )

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return {"phase": jnp.zeros((), dtype=float_dtype())}

    def seek_state(self, seconds: float) -> State:
        """O(1) seek (src/source/signal_generator.rs:165-169)."""
        period = np.float64(self.spec.sample_rate) / np.float64(self.frequency)
        seek = np.float64(seconds) * self.spec.sample_rate / period
        return {"phase": jnp.asarray(_frac64(seek), dtype=float_dtype())}

    @staticmethod
    def waveform(function, phase):
        if callable(function):
            return function(phase)
        if function == "sine":
            return jnp.sin(2.0 * np.pi * phase)
        if function == "triangle":
            return 4.0 * jnp.abs(phase - jnp.floor(phase + 0.5)) - 1.0
        if function == "square":
            return jnp.where(phase % 1.0 < 0.5, 1.0, -1.0)
        if function == "sawtooth":
            return 2.0 * (phase - jnp.floor(phase + 0.5))
        raise ValueError(function)

    def emit(self, state: State, n: int):
        dt = float_dtype()
        if self.rodio_compat:
            import jax

            step = dt(self._step32)

            def body(p, _):
                pn = p + step
                pn = pn - jnp.floor(pn)  # rem_euclid(1.0), p >= 0
                return pn, p

            new_phase, phases = jax.lax.scan(
                body, state["phase"], None, length=n
            )
            block = SignalGenerator.waveform(self.function, phases)
            return (
                {"phase": new_phase},
                block[None, :].astype(dt),
                jnp.int32(n),
            )
        # per-block increment table, exact in f64 at trace time
        incr = jnp.asarray(
            _frac64(np.arange(n, dtype=np.float64) * self._step64), dtype=dt
        )
        p = state["phase"] + incr
        p = p - jnp.floor(p)
        block = SignalGenerator.waveform(self.function, p)[None, :].astype(dt)
        carry_inc = dt(_frac64(np.float64(n) * self._step64))
        new_phase = state["phase"] + carry_inc
        new_phase = new_phase - jnp.floor(new_phase)
        return {"phase": new_phase}, block, jnp.int32(n)


class SineWave(SignalGenerator):
    """(src/source/sine.rs:16) — 48 kHz sine."""

    def __init__(self, frequency: float, *, rodio_compat: bool = False):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "sine",
                         rodio_compat=rodio_compat)


class SquareWave(SignalGenerator):
    def __init__(self, frequency: float, *, rodio_compat: bool = False):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "square",
                         rodio_compat=rodio_compat)


class TriangleWave(SignalGenerator):
    def __init__(self, frequency: float, *, rodio_compat: bool = False):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "triangle",
                         rodio_compat=rodio_compat)


class SawtoothWave(SignalGenerator):
    def __init__(self, frequency: float, *, rodio_compat: bool = False):
        super().__init__(DEFAULT_SAMPLE_RATE, frequency, "sawtooth",
                         rodio_compat=rodio_compat)


class Chirp(Node):
    """Linear sine sweep over a duration (src/source/chirp.rs:22-103)."""

    def __init__(self, sample_rate: int, start_frequency: float,
                 end_frequency: float, duration: float):
        self.spec = StreamSpec(1, sample_rate)
        self.start_frequency = float(start_frequency)
        self.end_frequency = float(end_frequency)
        self._total = int(np.float64(duration) * sample_rate)

    def total_frames(self) -> Optional[int]:
        return self._total

    def init_state(self) -> State:
        return {"i": jnp.zeros((), dtype=jnp.int32)}

    def emit(self, state: State, n: int):
        dt = float_dtype()
        i = state["i"] + jnp.arange(n, dtype=jnp.int32)
        fi = i.astype(dt)
        ratio = fi / dt(self._total)
        freq = dt(self.start_frequency) * (1.0 - ratio) + dt(
            self.end_frequency
        ) * ratio
        t = (fi / dt(self.spec.sample_rate)) * dt(2.0 * np.pi) * freq
        block = jnp.sin(t)[None, :].astype(dt)
        valid = clip_valid(self._total - state["i"], n)
        block = mask_block(block, valid)
        return {"i": state["i"] + n}, block, valid


class Zero(Node):
    """Silence, infinite or a fixed number of frames (src/source/zero.rs:19)."""

    def __init__(self, channels: int, sample_rate: int,
                 num_frames: Optional[int] = None):
        self.spec = StreamSpec(channels, sample_rate)
        self._total = num_frames

    def total_frames(self) -> Optional[int]:
        return self._total

    def init_state(self) -> State:
        return {"i": jnp.zeros((), dtype=jnp.int32)}

    def emit(self, state: State, n: int):
        block = jnp.zeros((self.spec.channels, n), dtype=float_dtype())
        if self._total is None:
            valid = jnp.int32(n)
        else:
            valid = clip_valid(self._total - state["i"], n)
        return {"i": state["i"] + n}, block, valid


class Empty(Node):
    """Zero-length source (src/source/empty.rs:10)."""

    def __init__(self, channels: int = 1, sample_rate: int = DEFAULT_SAMPLE_RATE):
        self.spec = StreamSpec(channels, sample_rate)

    def total_frames(self) -> Optional[int]:
        return 0

    def init_state(self) -> State:
        return {}

    def emit(self, state: State, n: int):
        return state, jnp.zeros((self.spec.channels, n), dtype=float_dtype()), jnp.int32(0)


class SamplesBuffer(Node):
    """Device-resident PCM buffer source (src/buffer.rs:23-200).

    Accepts interleaved 1-D data (rodio layout) or a [channels, frames]
    array. The data lives in the state pytree (HBM), not baked into the
    compiled executable, so one compilation serves any buffer contents.

    RANDOM_ACCESS marks the node as gatherable: downstream stages (the
    resampler) read frames directly instead of streaming pulls.
    """

    RANDOM_ACCESS = True
    #: zero padding appended to the device array so contiguous reads are
    #: always in-bounds dynamic slices (never gathers — TPU gathers are slow)
    PAD_FRAMES = 8192

    def access_window(self, state: State):
        """(start_frame, frames_from_start) of the remaining stream."""
        return state["pos"], state["end"] - state["pos"]

    def gather_frames(self, state: State, idx):
        return jnp.take(state["data"], idx, axis=1, mode="fill", fill_value=0)

    def slice_frames(self, state: State, start, length: int):
        """Contiguous [C, length] window at dynamic start — a DMA-friendly
        dynamic_slice (start clamped into the zero padding when past end)."""
        import jax.lax as lax

        start = jnp.clip(start, 0, self._frames + self.PAD_FRAMES - length)
        return lax.dynamic_slice(
            state["data"], (jnp.int32(0), start.astype(jnp.int32)),
            (self.spec.channels, length),
        )

    def __init__(self, channels: int, sample_rate: int, data,
                 *, start_frame: int = 0,
                 pad_frames: Optional[int] = None):
        self.spec = StreamSpec(channels, sample_rate)
        if pad_frames is not None:
            # larger contiguous read windows (e.g. fused blocks past
            # T=8960 need K*fr+fr pad frames, flagship.py emit); the
            # class default stays small so ordinary buffers don't pay
            # extra host->device padding bytes
            assert pad_frames >= 1
            self.PAD_FRAMES = int(pad_frames)
        arr = np.asarray(data, dtype=float_dtype())
        if arr.ndim == 1:
            frames = len(arr) // channels
            arr = arr[: frames * channels].reshape(frames, channels).T
        elif arr.ndim != 2 or arr.shape[0] != channels:
            raise ValueError("data must be 1-D interleaved or [channels, frames]")
        arr = np.pad(arr, ((0, 0), (0, self.PAD_FRAMES)))
        self._data = jnp.asarray(arr)
        self._frames = arr.shape[1] - self.PAD_FRAMES
        self._start = int(start_frame)

    def total_frames(self) -> Optional[int]:
        return max(0, self._frames - self._start)

    def init_state(self) -> State:
        # the logical end index lives in the state (not baked into the
        # trace) so that batches of buffers with different lengths can share
        # one compiled program: pad `data` to a common shape and vary `end`.
        return {
            "data": self._data,
            "pos": jnp.asarray(self._start, dtype=jnp.int32),
            "end": jnp.asarray(self._frames, dtype=jnp.int32),
        }

    def seek_state(self, state: State, seconds: float) -> State:
        """Frame-aligned O(1) seek (src/buffer.rs:101-120), saturating."""
        frames = int(np.float64(seconds) * self.spec.sample_rate)
        return {
            **state,
            "pos": jnp.asarray(min(frames, self._frames), dtype=jnp.int32),
        }

    def emit(self, state: State, n: int):
        pos = state["pos"]
        if n <= self.PAD_FRAMES:
            block = self.slice_frames(state, pos, n)
        else:
            # oversized pull (e.g. a heavy-downsampling resampler feeding on
            # max_block outputs): gather fallback, correct at any size
            block = self.gather_frames(
                state, pos + jnp.arange(n, dtype=jnp.int32)
            )
        valid = clip_valid(state["end"] - pos, n)
        block = mask_block(block, valid)
        return {**state, "pos": pos + n}, block, valid
