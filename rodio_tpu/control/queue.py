"""Sequential playback queue — block-level control plane.

TPU-native rebuild of src/queue.rs. The reference plays queued sources back
to back on the audio thread, emitting keep-alive silence when empty
(src/queue.rs:221-240) and peeking the next source's metadata once the
current one is exhausted (src/queue.rs:166-192).

Block engine: the queue is host-driven (the control plane IS host code, as
in the reference — its per-sample scalar decisions live on the audio
thread). Each queued source keeps its own jitted step; at a transition the
tail of the block is stitched from the next source, so switching happens
mid-block exactly like the reference switches mid-stream. Each source's
DSP remains fully compiled.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional

import numpy as np

from ..core.node import Node
from ..core.types import DEFAULT_SAMPLE_RATE
from ..graph.render import compile_step


class DoneSignal(list):
    """One-element [bool] with an optional .callback fired on completion."""

    callback = None

    @property
    def done(self) -> bool:
        return self[0]


class SourcesQueueInput:
    """(src/queue.rs:52-111)"""

    def __init__(self, keep_alive_if_empty: bool):
        self.next_sounds: deque = deque()
        self.keep_alive_if_empty = keep_alive_if_empty

    def append(self, node: Node) -> None:
        self.next_sounds.append((node, None))

    def append_with_signal(self, node: Node,
                           callback=None) -> "DoneSignal":
        """The done-signal: flips to True when the sound finishes (the
        channel analog, src/queue.rs:79-89); an optional callback fires at
        that moment (the Done-wrapper analog, src/source/done.rs:10-32)."""
        signal = DoneSignal([False])
        signal.callback = callback
        self.next_sounds.append((node, signal))
        return signal

    def clear(self) -> int:
        n = len(self.next_sounds)
        self.next_sounds.clear()
        return n


class SourcesQueueOutput:
    """(src/queue.rs:114-268) — host-driven block producer."""

    def __init__(self, input_queue: SourcesQueueInput, *, block_frames: int = 4096):
        self.input = input_queue
        self.block_frames = block_frames
        self.current: Optional[dict] = None
        #: optional hook fired when a queued sound becomes current — the
        #: block analog of the reference applying shared controls at
        #: every sound's FIRST periodic access (src/player.rs:138-165);
        #: the Player uses it to land knobs changed between append and
        #: start before the sound's first sample
        self.on_start: Optional[Callable[[dict], None]] = None
        self.signal_after_end: Optional[List[bool]] = None
        #: (period_frames, countdown, fn) periodic host hooks — the block
        #: analog of PeriodicAccess (src/source/periodic.rs:14-86)
        self._periodic: List[list] = []

    def periodic_access(self, period_seconds: float, fn: Callable[[], None],
                        sample_rate: int = 48000) -> None:
        period = max(1, int(period_seconds * sample_rate))
        self._periodic.append([period, 1, fn])

    def _tick_periodic(self, frames: int) -> None:
        for hook in self._periodic:
            hook[1] -= frames
            while hook[1] <= 0:
                hook[2]()
                hook[1] += hook[0]

    # -- metadata peeking (src/queue.rs:166-192) --
    def channels(self) -> int:
        if self.current is not None:
            return self.current["node"].spec.channels
        if self.input.next_sounds:
            return self.input.next_sounds[0][0].spec.channels
        return 1

    def sample_rate(self) -> int:
        if self.current is not None:
            return self.current["node"].spec.sample_rate
        if self.input.next_sounds:
            return self.input.next_sounds[0][0].spec.sample_rate
        return DEFAULT_SAMPLE_RATE

    def _go_next(self, target_rate: Optional[int] = None) -> bool:
        if self.signal_after_end is not None:
            self.signal_after_end[0] = True
            cb = getattr(self.signal_after_end, "callback", None)
            if cb is not None:
                cb()
            self.signal_after_end = None
        if not self.input.next_sounds:
            self.current = None
            return False
        node, signal = self.input.next_sounds.popleft()
        if target_rate is not None and node.spec.sample_rate != target_rate:
            # Mid-block stitch at a different sample rate: resample the
            # incoming source to the rate the block was started at, so the
            # stitched tail plays at the right pitch. (The reference's queue
            # changes rate at a span boundary and lets a downstream
            # UniformSourceIterator re-bootstrap, src/queue.rs:166-192; the
            # block engine's fixed [C, n] block can't change rate mid-block,
            # so the conversion happens here instead.)
            from ..conversions.uniform import Uniform

            node = Uniform(node, node.spec.channels, target_rate)
        self.current = {
            "node": node,
            "state": node.init_state(),
            "step": compile_step(node, self.block_frames),
            "leftover": None,  # np [C, k] of produced-but-unconsumed frames
            "ended": False,
        }
        self.signal_after_end = signal
        if self.on_start is not None:
            self.on_start(self.current)
        return True

    def _pull_current(self) -> Optional[np.ndarray]:
        """Produce the next chunk from the current source, or None if it is
        exhausted."""
        cur = self.current
        if cur["leftover"] is not None:
            chunk = cur["leftover"]
            cur["leftover"] = None
            return chunk
        if cur["ended"]:
            return None
        cur["state"], block, valid = cur["step"](cur["state"])
        v = int(valid)
        if v < self.block_frames:
            cur["ended"] = True
        if v == 0:
            return None
        return np.asarray(block[:, :v])

    def next_block(self, n: Optional[int] = None):
        """Pull one [channels, n] block.

        Returns (block, alive). alive=False once the queue has ended (only
        possible with keep_alive_if_empty=False). When the current source
        ends mid-block, the remainder comes from the next queued source(s) —
        the mid-stream switch of the reference, at sample resolution.
        """
        n = n or self.block_frames
        out, alive = self._next_block_inner(n)
        self._tick_periodic(n)
        return out, alive

    def _next_block_inner(self, n: int):
        channels = self.channels()
        rate = self.sample_rate()
        out = np.zeros((channels, n), dtype=np.float32)
        filled = 0
        while filled < n:
            if self.current is None and not self._go_next(
                target_rate=rate if filled > 0 else None
            ):
                if self.input.keep_alive_if_empty:
                    return out, True  # rest of block stays silent
                return (out, True) if filled > 0 else (out, False)
            chunk = self._pull_current()
            if chunk is None:
                self.current = None  # exhausted -> next source
                continue
            take = min(chunk.shape[1], n - filled)
            blk = chunk[:, :take]
            if blk.shape[0] != channels:
                from ..conversions.channels import rechannel_block
                import jax.numpy as jnp

                blk = np.asarray(
                    rechannel_block(jnp.asarray(blk), blk.shape[0], channels)
                )
            out[:, filled : filled + take] = blk
            filled += take
            if take < chunk.shape[1]:
                self.current["leftover"] = chunk[:, take:]
        return out, True


def queue(keep_alive_if_empty: bool, *, block_frames: int = 4096):
    """(input, output) pair (src/queue.rs:30)."""
    q = SourcesQueueInput(keep_alive_if_empty)
    return q, SourcesQueueOutput(q, block_frames=block_frames)
