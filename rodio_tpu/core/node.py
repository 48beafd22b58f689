"""Block-engine node protocol — the TPU-native Source trait.

The reference pulls ONE interleaved scalar sample per call through a dynamic
object graph (src/source/mod.rs:179, src/stream.rs:536-548). The block engine
inverts this: audio flows as frame-major blocks ``[channels, T]`` through a
statically-compiled graph. A node is a declarative description; its
``emit(state, T)`` method is pure and traceable, so an entire chain lowers to
a single XLA computation (one fused kernel chain per block) and batches of
identical chains vmap over a stream axis.

Protocol:

- ``spec`` — output :class:`~rodio_tpu.core.types.StreamSpec` (fixed; the
  reference's span-varying parameters are normalized at ingest).
- ``total_frames`` — known output length in frames, or ``None`` (infinite /
  unknown). The analog of ``total_duration`` + ``size_hint``.
- ``init_state()`` — returns the state pytree (JAX arrays / scalars). May
  invoke upstream ``emit`` for bootstrap reads (e.g. the resampler's first
  frame), mirroring the reference's constructor-time pulls
  (src/conversions/sample_rate.rs:58-71).
- ``emit(state, n)`` — returns ``(state', block, valid)`` where ``block`` is
  ``[channels, n]`` in the sample dtype and ``valid`` is an int32 count of
  valid leading frames. Frames at index >= valid MUST be zero (silence), so
  downstream sums need no masks. After a stream ends, further emits return
  ``valid == 0``.

Control knobs (volume, pause, seek targets) enter as state fields updated
host-side between blocks — the block-boundary analog of the reference's 5 ms
``PeriodicAccess`` control application (src/source/periodic.rs:78-86).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .types import StreamSpec, float_dtype

State = Any
Block = jnp.ndarray  # [channels, T]


class Node:
    """Base class for block-engine audio nodes."""

    #: Output format of this node.
    spec: StreamSpec

    def total_frames(self) -> Optional[int]:
        """Known output length in frames, or None."""
        return None

    def total_duration(self) -> Optional[float]:
        tf = self.total_frames()
        return None if tf is None else tf / self.spec.sample_rate

    def init_state(self) -> State:
        raise NotImplementedError

    def emit(self, state: State, n: int) -> Tuple[State, Block, jnp.ndarray]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Combinator surface, mirroring the reference's Source trait methods
    # (src/source/mod.rs:222-731). Each returns a new wrapping Node.
    # ------------------------------------------------------------------
    def amplify(self, factor: float) -> "Node":
        from ..effects.basic import Amplify

        return Amplify(self, factor)

    def amplify_decibel(self, db: float) -> "Node":
        from ..core.math import db_to_linear
        from ..effects.basic import Amplify

        return Amplify(self, float(db_to_linear(np.float32(db))))

    def amplify_normalized(self, value: float) -> "Node":
        from ..core.math import amplify_normalized_factor
        from ..effects.basic import Amplify

        return Amplify(self, float(amplify_normalized_factor(value)))

    def distortion(self, gain: float, threshold: float) -> "Node":
        from ..effects.basic import Distortion

        return Distortion(self, gain, threshold)

    def linear_gain_ramp(self, duration: float, start: float, end: float,
                         clamp_end: bool) -> "Node":
        from ..effects.basic import LinearGainRamp

        return LinearGainRamp(self, duration, start, end, clamp_end)

    def fade_in(self, duration: float) -> "Node":
        from ..effects.basic import LinearGainRamp

        return LinearGainRamp(self, duration, 0.0, 1.0, False)

    def fade_out(self, duration: float) -> "Node":
        from ..effects.basic import LinearGainRamp

        return LinearGainRamp(self, duration, 1.0, 0.0, True)

    def take_duration(self, duration: float, *, fadeout: bool = False) -> "Node":
        from ..effects.basic import TakeDuration

        return TakeDuration(self, duration, fadeout=fadeout)

    def skip_duration(self, duration: float) -> "Node":
        from ..effects.basic import SkipDuration

        return SkipDuration(self, duration)

    def delay(self, duration: float) -> "Node":
        from ..effects.basic import Delay

        return Delay(self, duration)

    def speed(self, factor: float) -> "Node":
        from ..effects.basic import Speed

        return Speed(self, factor)

    def low_pass(self, freq: float, q: float = 0.5) -> "Node":
        from ..effects.blt import BltFilter

        return BltFilter(self, "low_pass", freq, q)

    def high_pass(self, freq: float, q: float = 0.5) -> "Node":
        from ..effects.blt import BltFilter

        return BltFilter(self, "high_pass", freq, q)

    def low_pass_with_q(self, freq: float, q: float) -> "Node":
        return self.low_pass(freq, q)

    def high_pass_with_q(self, freq: float, q: float) -> "Node":
        return self.high_pass(freq, q)

    def limit(self, settings=None) -> "Node":
        from ..effects.limit import Limit, LimitSettings

        return Limit(self, settings or LimitSettings())

    def automatic_gain_control(self, settings=None) -> "Node":
        from ..effects.agc import AgcSettings, AutomaticGainControl

        return AutomaticGainControl(self, settings or AgcSettings())

    def channel_volume(self, volumes) -> "Node":
        from ..effects.basic import ChannelVolume

        return ChannelVolume(self, volumes)

    def spatial(self, emitter_pos, left_ear, right_ear) -> "Node":
        from ..effects.basic import Spatial

        return Spatial(self, emitter_pos, left_ear, right_ear)

    def mix(self, other: "Node") -> "Node":
        from ..effects.mix import Mix

        return Mix(self, other)

    def reverb(self, duration: float, amplitude: float) -> "Node":
        """Echo: self.mix(self.amplify(a).delay(d)) (src/source/mod.rs:628-634).

        Unlike the reference, block nodes are declarative and re-emittable, so
        no ``.buffered()`` is required before reverb.
        """
        return self.mix(self.amplify(amplitude).delay(duration))

    def dither(self, bits: int, algorithm: str = "tpdf", seed: int = 0) -> "Node":
        from ..effects.dither import Dither

        return Dither(self, bits, algorithm, seed)

    def uniform(self, channels: int, sample_rate: int) -> "Node":
        """Convert to a fixed (channels, rate) — UniformSourceIterator
        (src/source/uniform.rs:33)."""
        from ..conversions.uniform import Uniform

        return Uniform(self, channels, sample_rate)

    def resample(self, sample_rate: int) -> "Node":
        from ..conversions.resample import Resample

        return Resample(self, sample_rate)

    def rechannel(self, channels: int) -> "Node":
        from ..conversions.channels import RechannelNode

        return RechannelNode(self, channels)

    def repeat_infinite(self) -> "Node":
        from ..effects.basic import Repeat

        return Repeat(self)

    def track_position(self) -> "Node":
        from ..effects.basic import TrackPosition

        return TrackPosition(self)

    def pausable(self, initially_paused: bool = False) -> "Node":
        from ..effects.basic import Pausable

        return Pausable(self, initially_paused)

    def stoppable(self) -> "Node":
        from ..effects.basic import Stoppable

        return Stoppable(self)

    def skippable(self) -> "Node":
        from ..effects.basic import Skippable

        return Skippable(self)

    def buffered(self):
        """Lazy shared-cache buffering (src/source/buffered.rs): the result
        is host-driven; clones share the cache. Use .record() for an eager
        device-resident buffer."""
        from ..sources.buffered import Buffered

        return Buffered(self)

    def record(self) -> "Node":
        return self.buffered()

    def take_crossfade_with(self, other: "Node", duration: float) -> "Node":
        fo = self.take_duration(duration, fadeout=True)
        fi = other.take_duration(duration).fade_in(duration)
        return fo.mix(fi)

    # rendering conveniences
    def render(self, *, max_frames: Optional[int] = None,
               block_frames: int = 4096) -> np.ndarray:
        """Render to a [channels, frames] numpy array (pull to exhaustion)."""
        from ..graph.render import render

        return render(self, max_frames=max_frames, block_frames=block_frames)

    def to_file(self, path, **kw) -> None:
        from ..io.wav import wav_to_file

        wav_to_file(self, path, **kw)


def zero_block(channels: int, n: int) -> Block:
    return jnp.zeros((channels, n), dtype=float_dtype())


def mask_block(block: Block, valid) -> Block:
    """Zero out frames at index >= valid."""
    n = block.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(idx[None, :] < valid, block, 0)


def clip_valid(valid, n: int):
    return jnp.clip(valid, 0, n).astype(jnp.int32)
