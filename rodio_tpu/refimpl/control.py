"""Scalar reference engine: mixer / queue / player control plane.

Mirrors /root/reference/src/mixer.rs, src/queue.rs and src/player.rs at the
per-sample level. The host-side control plane of the block engine is tested
against these for block-level equivalence.
"""
from __future__ import annotations

from collections import deque
from typing import List, Optional

import numpy as np

from .conversions import UniformSourceIterator
from .core import Empty, Source
from .effects import (
    Amplify,
    Done,
    Pausable,
    PeriodicAccess,
    Skippable,
    Speed,
    Stoppable,
    TrackPosition,
)

F = np.float32


class Mixer:
    """Input handle of the mixer (src/mixer.rs:25-67)."""

    def __init__(self, channels: int, sample_rate: int):
        self._channels = channels
        self._rate = sample_rate
        self._pending: deque = deque()

    def add(self, source: Source) -> None:
        self._pending.append(
            UniformSourceIterator(source, self._channels, self._rate)
        )


class MixerSource(Source):
    """Output of the mixer (src/mixer.rs:70-198): sums all live sources,
    admits new ones only at frame boundaries, ends when no sources remain."""

    def __init__(self, mixer: Mixer):
        self.input = mixer
        self.current_sources: List[Source] = []
        self.still_pending: List[Source] = []
        self.current_channel = 0

    def next(self):
        self._start_pending_sources()

        total = F(0.0)
        alive = []
        for source in self.current_sources:
            v = source.next()
            if v is not None:
                total = F(total + v)
                alive.append(source)
        self.current_sources = alive

        self.current_channel += 1
        if self.current_channel >= self.input._channels:
            self.current_channel = 0

        # NOTE: checked after exhausted sources are dropped (src/mixer.rs:131)
        if not self.current_sources:
            return None
        return total

    def _start_pending_sources(self):
        while self.input._pending:
            self.still_pending.append(self.input._pending.popleft())
        if self.current_channel == 0 and self.still_pending:
            self.current_sources.extend(self.still_pending)
            self.still_pending.clear()

    def current_span_len(self):
        return None

    def channels(self):
        return self.input._channels

    def sample_rate(self):
        return self.input._rate

    def total_duration_ns(self):
        return None


def mixer(channels: int, sample_rate: int):
    m = Mixer(channels, sample_rate)
    return m, MixerSource(m)


class SourcesQueueInput:
    """Input of the queue (src/queue.rs:52-111)."""

    def __init__(self, keep_alive_if_empty: bool):
        self.next_sounds: deque = deque()
        self.keep_alive_if_empty = keep_alive_if_empty

    def append(self, source: Source) -> None:
        self.next_sounds.append((source, None))

    def append_with_signal(self, source: Source) -> List[bool]:
        """Returns a one-element list acting as the done-signal receiver; the
        flag flips to True when the sound finishes (the channel analog)."""
        signal = [False]
        self.next_sounds.append((source, signal))
        return signal

    def clear(self) -> int:
        n = len(self.next_sounds)
        self.next_sounds.clear()
        return n


class SourcesQueueOutput(Source):
    """Output of the queue (src/queue.rs:114-268): sequential playback with
    keep-alive silence and metadata peeking at the next queued source."""

    def __init__(self, input_queue: SourcesQueueInput):
        self.current: Source = Empty()
        self.signal_after_end: Optional[List[bool]] = None
        self.input = input_queue
        self.silence_samples_remaining = 0

    def next(self):
        while True:
            if self.silence_samples_remaining > 0:
                self.silence_samples_remaining -= 1
                return F(0.0)

            v = self.current.next()
            if v is not None:
                return v

            if not self._go_next():
                if self.input.keep_alive_if_empty:
                    self.silence_samples_remaining = self.current.channels()
                    continue
                return None

    def _go_next(self) -> bool:
        if self.signal_after_end is not None:
            self.signal_after_end[0] = True
            self.signal_after_end = None
        if not self.input.next_sounds:
            return False
        nxt, signal = self.input.next_sounds.popleft()
        self.current = nxt
        self.signal_after_end = signal
        return True

    def current_span_len(self):
        cur_len = self.current.current_span_len()
        if cur_len == 0 and self.silence_samples_remaining > 0:
            length = self.silence_samples_remaining
        elif cur_len is not None and (
            cur_len > 0 or not self.input.keep_alive_if_empty
        ):
            length = cur_len
        else:
            length = self.channels()

        if length == 0:
            dur = self.current.total_duration_ns()
            if dur == 0 and self.input.next_sounds:
                nxt = self.input.next_sounds[0][0]
                nxt_len = nxt.current_span_len()
                return nxt_len if nxt_len is not None else nxt.channels()
        return length

    def channels(self):
        if self.current.is_exhausted() and self.silence_samples_remaining == 0:
            if self.input.next_sounds:
                return self.input.next_sounds[0][0].channels()
        return self.current.channels()

    def sample_rate(self):
        if self.current.is_exhausted() and self.silence_samples_remaining == 0:
            if self.input.next_sounds:
                return self.input.next_sounds[0][0].sample_rate()
        return self.current.sample_rate()

    def total_duration_ns(self):
        return None

    def try_seek(self, pos_ns: int) -> None:
        self.current.try_seek(pos_ns)


def queue(keep_alive_if_empty: bool):
    q = SourcesQueueInput(keep_alive_if_empty)
    return q, SourcesQueueOutput(q)


class _Controls:
    def __init__(self):
        self.pause = False
        self.volume = 1.0
        # stop() kills every sound appended BEFORE it; a later append
        # resumes playback (src/player.rs:109-115 waits for the stopped
        # queue to flush, then clears the flag — so sounds appended
        # after stop() never see it). The offline analog: stop records
        # the append generation, and each sound's periodic access
        # compares its own generation against it.
        self.stop_generation = -1
        self.speed = 1.0
        self.to_clear = 0
        self.seek_ns: Optional[int] = None
        self.position_secs = 0.0


class Player:
    """Facade over queue+mixer (src/player.rs:20-362).

    On append, wraps the source in the fixed control stack
    Done(speed -> track_position -> pausable -> amplify -> skippable ->
    stoppable) + periodic_access(5 ms) applying shared controls.
    """

    PERIODIC_NS = 5_000_000

    def __init__(self, mixer_handle: Mixer):
        self.queue_tx, queue_rx = queue(True)
        mixer_handle.add(queue_rx)
        self.controls = _Controls()
        self.sound_count = 0
        self.detached = False
        self._appends = 0

    def append(self, source: Source) -> None:
        controls = self.controls
        self.sound_count += 1
        generation = self._appends
        self._appends += 1

        stack = Stoppable(
            Skippable(
                Amplify(
                    Pausable(
                        TrackPosition(Speed(source, 1.0)),
                        False,
                    ),
                    1.0,
                )
            )
        )

        player = self

        def access(done_src: Done):
            src = done_src.input  # Stoppable
            amp = src.input.input  # Amplify
            pausable = amp.input
            track_pos = pausable.input
            speed = track_pos.input
            if generation < controls.stop_generation:
                # only sounds appended before the stop() die; position
                # zeroes with the stop (src/player.rs:139-142)
                src.stop()
                controls.position_secs = 0.0
            if controls.to_clear > 0:
                src.input.skip()
                controls.to_clear -= 1
                controls.position_secs = 0.0
                # skip_one/clear already discounted this sound from the
                # visible count (player.rs:299-306) — mark it so the
                # Done callback does not discount it a second time
                src._rtpu_discounted = True
            else:
                # position updates only on the non-skip branch
                # (src/player.rs:144-152)
                controls.position_secs = track_pos.get_pos_secs()
            amp.set_factor(controls.volume)
            pausable.set_paused(controls.pause)
            speed.set_factor(controls.speed)
            if controls.seek_ns is not None:
                # the Speed wrapper scales the position itself
                # (src/source/speed.rs:141-144)
                pos = controls.seek_ns
                controls.seek_ns = None
                try:
                    amp.try_seek(pos)
                    # the reference reports the TARGET as the position
                    # once the seek lands (src/player.rs:253-257)
                    controls.position_secs = pos / 1_000_000_000
                except Exception:
                    pass

        def on_done(_inner):
            # natural end only: skipped/cleared sounds were already
            # discounted by skip_one (player.rs:299-306); the periodic
            # controller tags them before they drain
            if not getattr(_inner, "_rtpu_discounted", False):
                player.sound_count = max(0, player.sound_count - 1)

        wrapped = PeriodicAccess(Done(stack, on_done), self.PERIODIC_NS, access)
        self.queue_tx.append(wrapped)

    # -- knobs (src/player.rs:174-351) --
    def play(self):
        self.controls.pause = False

    def pause(self):
        self.controls.pause = True

    def is_paused(self):
        return self.controls.pause

    def set_volume(self, volume: float):
        self.controls.volume = volume

    def volume(self):
        return self.controls.volume

    def set_speed(self, speed: float):
        self.controls.speed = speed

    def speed(self):
        return self.controls.speed

    def stop(self):
        # kills everything appended so far; later appends play
        # (src/player.rs:109-115,310-312)
        self.controls.stop_generation = self._appends

    def skip_one(self):
        # the reference decrements the visible count IMMEDIATELY and
        # queues a clear only while count > pending clears
        # (src/player.rs:299-306)
        if self.sound_count > self.controls.to_clear:
            self.controls.to_clear += 1
        self.sound_count = max(0, self.sound_count - 1)

    def clear(self):
        # every loaded sound gets skipped at its next access, the count
        # zeroes immediately, and the player PAUSES — a later append
        # stays silent until play() (src/player.rs:283-293)
        self.controls.to_clear = self.sound_count
        self.sound_count = 0
        self.pause()

    def try_seek(self, pos_ns: int):
        self.controls.seek_ns = pos_ns

    def get_pos_secs(self) -> float:
        return self.controls.position_secs

    def len(self) -> int:
        return self.sound_count

    def empty(self) -> bool:
        return self.sound_count == 0
