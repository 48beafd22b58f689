"""Stateless and counter-based effects.

TPU-native rebuilds of the reference's simple effect iterators. Per-sample
loops become elementwise block ops; integer-duration bookkeeping is resolved
host-side into exact frame counts at node-build time (the quirky
nanosecond arithmetic of the reference is reproduced with host integers).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State, clip_valid, mask_block
from ..core.types import NANOS_PER_SEC, StreamSpec, duration_to_nanos, float_dtype


def _tree_select(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


class _Wrap(Node):
    """Effect base: delegates spec/length to its input."""

    def __init__(self, input_node: Node):
        self.input = input_node
        self.spec = input_node.spec

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        return self.input.init_state()


class Amplify(_Wrap):
    """sample * factor (src/source/amplify.rs:10-22). The factor lives in the
    state so the Player can retune it at block boundaries; it may be a
    scalar or a per-channel vector (the wide-channel batch layout uses
    per-channel gains for per-stream volumes)."""

    def __init__(self, input_node: Node, factor):
        super().__init__(input_node)
        self.factor = np.asarray(factor, dtype=float_dtype())

    def init_state(self) -> State:
        f = jnp.asarray(self.factor)
        if f.ndim == 1:
            f = f[:, None]  # broadcast over time
        return {"in": self.input.init_state(), "factor": f}

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state["in"], n)
        return (
            {"in": s, "factor": state["factor"]},
            block * state["factor"],
            valid,
        )


class Distortion(_Wrap):
    """(x*gain).clamp(-t, t) (src/source/distortion.rs:66-72)."""

    def __init__(self, input_node: Node, gain: float, threshold: float):
        super().__init__(input_node)
        self.gain = float(gain)
        self.threshold = float(threshold)

    def init_state(self) -> State:
        return {
            "in": self.input.init_state(),
            "gain": jnp.asarray(self.gain, dtype=float_dtype()),
            "threshold": jnp.asarray(self.threshold, dtype=float_dtype()),
        }

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state["in"], n)
        t = state["threshold"]
        out = jnp.clip(block * state["gain"], -t, t)
        # pad frames stay silent even if threshold clamps weirdly
        out = mask_block(out, valid)
        return {"in": s, "gain": state["gain"], "threshold": t}, out, valid


class LinearGainRamp(_Wrap):
    """Linear gain over a duration (src/source/linear_ramp.rs:9-120).

    The reference advances an integer-nanosecond clock by
    floor(1e9/rate) ns per frame and computes the gain fraction in f32
    (p = secs_f32(elapsed)/secs_f32(total)); here the per-frame fraction step
    is precomputed in f64 host-side (step = dpf_ns/total_ns), giving gains
    within ~1 ulp of the reference.
    """

    def __init__(self, input_node: Node, duration: float, start_gain: float,
                 end_gain: float, clamp_end: bool):
        super().__init__(input_node)
        total_ns = duration_to_nanos(duration)
        if total_ns <= 0:
            raise ValueError("duration must be greater than zero")
        self.start_gain = float(start_gain)
        self.end_gain = float(end_gain)
        self.clamp_end = bool(clamp_end)
        dpf_ns = NANOS_PER_SEC // self.spec.sample_rate
        #: frames for which elapsed < total (ramp active)
        self.ramp_frames = -(-total_ns // dpf_ns)  # ceil
        self.step_p = float(np.float64(dpf_ns) / np.float64(total_ns))

    def init_state(self) -> State:
        return {"in": self.input.init_state(),
                "frame": jnp.zeros((), dtype=jnp.int32)}

    def emit(self, state: State, n: int):
        dt = float_dtype()
        s, block, valid = self.input.emit(state["in"], n)
        f = state["frame"] + jnp.arange(n, dtype=jnp.int32)
        p = f.astype(dt) * dt(self.step_p)
        ramp = dt(self.start_gain) * (1.0 - p) + dt(self.end_gain) * p
        after = dt(self.end_gain) if self.clamp_end else dt(1.0)
        gain = jnp.where(f < self.ramp_frames, ramp, after)
        return (
            {"in": s, "frame": state["frame"] + n},
            block * gain[None, :],
            valid,
        )


class TakeDuration(_Wrap):
    """Stop after a duration (src/source/take.rs:10-216).

    The reference counts interleaved samples with duration_per_sample =
    floor(1e9/(rate*channels)) ns and pads the final partial frame with
    silence; here the exact interleaved sample budget is computed host-side
    and the final partial frame is channel-masked.

    With ``fadeout=True`` the take applies the crossfade gain
    remaining/total, truncating both to whole milliseconds exactly as the
    reference does (src/source/take.rs:36-38, as_millis): the per-sample
    gain is the staircase floor(remaining_ns/1e6)/floor(total_ns/1e6) in
    the reference's op order (sample * remaining, then / total). The
    remaining-ns position is carried across blocks as a (whole-ms, ns-
    within-ms) i32 pair so the traced arithmetic never exceeds i32 at any
    stream position (x64 stays off).
    """

    def __init__(self, input_node: Node, duration: float, *, fadeout: bool = False):
        super().__init__(input_node)
        self.duration_ns = duration_to_nanos(duration)
        c = self.spec.channels
        dps_ns = NANOS_PER_SEC // (self.spec.sample_rate * c)
        if dps_ns == 0:
            self.n_samples = 0
        else:
            self.n_samples = self.duration_ns // dps_ns
        self.dps_ns = dps_ns
        self.fadeout = bool(fadeout)
        self._valid_frames = -(-self.n_samples // c)  # ceil: final frame padded
        self._tail_channels = self.n_samples % c  # 0 => full final frame

    def total_frames(self) -> Optional[int]:
        inner = self.input.total_frames()
        if inner is None:
            return self._valid_frames
        return min(inner, self._valid_frames)

    def init_state(self) -> State:
        st = {"in": self.input.init_state(),
              "frame": jnp.zeros((), dtype=jnp.int32)}
        if self.fadeout and self.n_samples > 0:
            # remaining_ns carried as whole-ms + ns-within-ms (both i32)
            st["fade_ms"] = jnp.int32(self.duration_ns // 1_000_000)
            st["fade_r"] = jnp.int32(self.duration_ns % 1_000_000)
        return st

    def emit(self, state: State, n: int):
        dt = float_dtype()
        s, block, v_in = self.input.emit(state["in"], n)
        f = state["frame"] + jnp.arange(n, dtype=jnp.int32)
        new_state = {"in": s, "frame": state["frame"] + n}

        if self.fadeout and self.n_samples > 0:
            c = self.spec.channels
            d = self.dps_ns
            M = 1_000_000
            # i32-safe: per-block interleaved decrement must fit
            assert n * c * d < 2**31, (
                "fadeout block too large for i32 ns arithmetic")
            # remaining_ms at interleaved sample j (block-local) =
            # floor((fade_ms*1e6 + fade_r - j*dps)/1e6)
            # = fade_ms + floor((fade_r - j*dps)/1e6)   [exact, i32]
            j = (jnp.arange(n, dtype=jnp.int32)[None, :] * c
                 + jnp.arange(c, dtype=jnp.int32)[:, None])
            ms = state["fade_ms"] + jnp.floor_divide(
                state["fade_r"] - j * jnp.int32(d), jnp.int32(M))
            ms = jnp.maximum(ms, 0).astype(dt)
            # reference op order: (sample * remaining) / total, both in
            # whole milliseconds (src/source/take.rs:36-38)
            block = (block * ms) / dt(float(self.duration_ns // M))
            raw = state["fade_r"] - jnp.int32(n * c * d)
            q = jnp.floor_divide(raw, jnp.int32(M))
            new_state["fade_ms"] = state["fade_ms"] + q
            new_state["fade_r"] = raw - q * jnp.int32(M)

        valid = jnp.minimum(v_in, clip_valid(self._valid_frames - state["frame"], n))
        if self._tail_channels:
            # zero channels >= tail_channels on the final (padded) frame
            last = self._valid_frames - 1
            ch_idx = jnp.arange(self.spec.channels, dtype=jnp.int32)[:, None]
            pad_mask = (f[None, :] == last) & (ch_idx >= self._tail_channels)
            block = jnp.where(pad_mask, 0.0, block)
        block = mask_block(block, valid)
        return new_state, block, valid


class SkipDuration(_Wrap):
    """Skip a duration at construction (src/source/skip.rs:275-339).

    The skip amount in frames is exact integer math; the fast-forward happens
    in init_state via the input's own emit (or O(1) seek when available).
    """

    def __init__(self, input_node: Node, duration: float):
        super().__init__(input_node)
        self.skip_ns = duration_to_nanos(duration)
        self.skip_frames = (
            self.skip_ns * self.spec.sample_rate
        ) // NANOS_PER_SEC

    def total_frames(self) -> Optional[int]:
        inner = self.input.total_frames()
        if inner is None:
            return None
        return max(0, inner - self.skip_frames)

    def init_state(self) -> State:
        s = self.input.init_state()
        remaining = self.skip_frames
        # O(1) seeks for sources that support them
        from ..sources.generators import SamplesBuffer, SignalGenerator

        if isinstance(self.input, SamplesBuffer):
            # seek by the EXACT frame count, not through float seconds:
            # int(skip_ns/1e9 * rate) can truncate one frame low when
            # the product lands just under an integer (e.g. 18 ms at
            # 48 kHz -> int(863.9999...) = 863, not 864 — found by the
            # differential fuzzer, seed 8)
            pos = min(self.input._start + remaining, self.input._frames)
            return {**s, "pos": jnp.asarray(pos, dtype=jnp.int32)}
        if isinstance(self.input, SignalGenerator):
            # phase seek is continuous f64 (no int truncation cliff)
            return self.input.seek_state(self.skip_ns / NANOS_PER_SEC)
        step = 8192
        while remaining > 0:
            k = min(step, remaining)
            s, _, _ = self.input.emit(s, int(k))
            remaining -= k
        return s

    def emit(self, state: State, n: int):
        return self.input.emit(state, n)


class Delay(_Wrap):
    """Prepend silence (src/source/delay.rs:522-637). The delay line is a
    [channels, D] carry in HBM."""

    def __init__(self, input_node: Node, duration: float):
        super().__init__(input_node)
        ns = duration_to_nanos(duration)
        c = self.spec.channels
        n_interleaved = ns * c * self.spec.sample_rate // NANOS_PER_SEC
        self.delay_frames = int(n_interleaved // c)
        self.duration = duration

    def total_frames(self) -> Optional[int]:
        inner = self.input.total_frames()
        return None if inner is None else inner + self.delay_frames

    def init_state(self) -> State:
        c = self.spec.channels
        return {
            "in": self.input.init_state(),
            "buf": jnp.zeros((c, self.delay_frames), dtype=float_dtype()),
            "buffered_valid": jnp.asarray(self.delay_frames, dtype=jnp.int32),
            "ended": jnp.asarray(False),
        }

    def emit(self, state: State, n: int):
        d = self.delay_frames
        if d == 0:
            s, block, valid = self.input.emit(state["in"], n)
            return {**state, "in": s}, block, valid
        s, x, v_in = self.input.emit(state["in"], n)
        joined = jnp.concatenate([state["buf"], x], axis=1)  # [C, d+n]
        out = joined[:, :n]
        buf = joined[:, n:]  # last d frames
        avail = state["buffered_valid"] + v_in
        valid = clip_valid(avail, n)
        new_buffered = jnp.maximum(avail - n, 0)
        out = mask_block(out, valid)
        return (
            {"in": s, "buf": buf, "buffered_valid": new_buffered,
             "ended": state["ended"]},
            out,
            valid,
        )


class Speed(_Wrap):
    """Metadata-only speed change (src/source/speed.rs:56-144): the reported
    sample rate is scaled; actual resampling happens at the next uniform
    stage."""

    def __init__(self, input_node: Node, factor: float):
        super().__init__(input_node)
        self.factor = float(factor)
        new_rate = max(1, int(input_node.spec.sample_rate * np.float32(factor)))
        self.spec = StreamSpec(input_node.spec.channels, new_rate)

    def emit(self, state: State, n: int):
        return self.input.emit(state, n)


class ChannelVolume(Node):
    """Frame -> mono mean -> per-output-channel volumes
    (src/source/channel_volume.rs:12-115)."""

    def __init__(self, input_node: Node, volumes: Sequence[float]):
        self.input = input_node
        self.volumes = [float(v) for v in volumes]
        if not self.volumes:
            raise ValueError("need at least one channel volume")
        self.spec = StreamSpec(len(self.volumes), input_node.spec.sample_rate)

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        return {
            "in": self.input.init_state(),
            "volumes": jnp.asarray(self.volumes, dtype=float_dtype()),
        }

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state["in"], n)
        mono = jnp.mean(block, axis=0, keepdims=True)  # [1, n]
        out = mono * state["volumes"][:, None]
        return {"in": s, "volumes": state["volumes"]}, out, valid


class Spatial(ChannelVolume):
    """ChannelVolume driven by emitter/ear geometry (src/source/spatial.rs)."""

    def __init__(self, input_node: Node, emitter_position, left_ear, right_ear):
        from ..refimpl.effects import spatial_volumes

        lvol, rvol = spatial_volumes(emitter_position, left_ear, right_ear)
        super().__init__(input_node, [float(lvol), float(rvol)])

    @staticmethod
    def positions_state(state: State, emitter_pos, left_ear, right_ear) -> State:
        """Host-side reposition: returns state with updated volumes
        (src/source/spatial.rs:48-69)."""
        from ..refimpl.effects import spatial_volumes

        lvol, rvol = spatial_volumes(emitter_pos, left_ear, right_ear)
        return {**state,
                "volumes": jnp.asarray([lvol, rvol], dtype=float_dtype())}


class Pausable(_Wrap):
    """Zeros while paused, input frozen (src/source/pausable.rs:7-96)."""

    def __init__(self, input_node: Node, initially_paused: bool = False):
        super().__init__(input_node)
        self.initially_paused = bool(initially_paused)

    def init_state(self) -> State:
        return {
            "in": self.input.init_state(),
            "paused": jnp.asarray(self.initially_paused),
        }

    def emit(self, state: State, n: int):
        s2, block, valid = self.input.emit(state["in"], n)
        paused = state["paused"]
        out = jnp.where(paused, jnp.zeros_like(block), block)
        v = jnp.where(paused, jnp.int32(n), valid)
        s_new = _tree_select(paused, state["in"], s2)
        return {"in": s_new, "paused": paused}, out, v


class Stoppable(_Wrap):
    """Flag-based end (src/source/stoppable.rs:8-27)."""

    def init_state(self) -> State:
        return {"in": self.input.init_state(), "stopped": jnp.asarray(False)}

    def emit(self, state: State, n: int):
        s2, block, valid = self.input.emit(state["in"], n)
        stopped = state["stopped"]
        out = jnp.where(stopped, jnp.zeros_like(block), block)
        v = jnp.where(stopped, jnp.int32(0), valid)
        s_new = _tree_select(stopped, state["in"], s2)
        return {"in": s_new, "stopped": stopped}, out, v


class Skippable(_Wrap):
    """skip() ends the source (src/source/skippable.rs:10-37)."""

    def init_state(self) -> State:
        return {"in": self.input.init_state(), "skipped": jnp.asarray(False)}

    def emit(self, state: State, n: int):
        s2, block, valid = self.input.emit(state["in"], n)
        skipped = state["skipped"]
        out = jnp.where(skipped, jnp.zeros_like(block), block)
        v = jnp.where(skipped, jnp.int32(0), valid)
        s_new = _tree_select(skipped, state["in"], s2)
        return {"in": s_new, "skipped": skipped}, out, v


class TrackPosition(_Wrap):
    """Frame counter -> playback position (src/source/position.rs:10-100)."""

    def init_state(self) -> State:
        return {"in": self.input.init_state(),
                "frames": jnp.zeros((), dtype=jnp.int32)}

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state["in"], n)
        return {"in": s, "frames": state["frames"] + valid}, block, valid

    def get_pos(self, state: State) -> float:
        return float(state["frames"]) / self.spec.sample_rate


class Repeat(Node):
    """Loop a finite source forever (src/source/repeat.rs:10-44).

    Like the reference (which buffers the source), the input is materialized
    once at build time; playback is then a modular gather.
    """

    def __init__(self, input_node: Node):
        from ..graph.render import render

        data = render(input_node)  # [C, F] numpy
        if data.shape[1] == 0:
            raise ValueError("cannot repeat an empty source")
        self.spec = input_node.spec
        self._data = jnp.asarray(data)
        self._frames = data.shape[1]

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return {"data": self._data, "pos": jnp.zeros((), dtype=jnp.int32)}

    def emit(self, state: State, n: int):
        idx = (state["pos"] + jnp.arange(n, dtype=jnp.int32)) % self._frames
        block = jnp.take(state["data"], idx, axis=1)
        new_pos = (state["pos"] + n) % self._frames
        return {"data": state["data"], "pos": new_pos}, block, jnp.int32(n)
