"""Player — the user-facing playback control facade.

TPU-native rebuild of src/player.rs. The reference wraps every appended
source in a fixed control stack
Done(speed -> track_position -> pausable -> amplify -> skippable ->
stoppable) and applies shared knobs on the audio thread every 5 ms via
PeriodicAccess (src/player.rs:104-170).

Block engine: the six wrappers fuse into ONE control node whose knobs are
state fields; the Player writes them between blocks. With the default
block size of 256 frames @48 kHz the control latency is ~5.3 ms — the same
control cadence as the reference's PeriodicAccess(5 ms).

Live varispeed: every speed-bearing chain carries a VariSpeed stage
(conversions/varispeed.py) whose ratio is a traced state field, so
``set_speed`` is a pure state update with zero recompiles (the first
change on a plain chain re-plans once to insert the stage).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State
from ..core.types import StreamSpec, float_dtype
from .mixer import Mixer
from .queue import queue


class PlayerControl(Node):
    """Fused control stack: pause/volume/stop/skip/position in one node.

    Semantics match the reference wrappers they fuse:
    - paused -> silence, input frozen (src/source/pausable.rs)
    - stopped/skipped -> stream ends (stoppable.rs / skippable.rs)
    - volume multiplies samples (amplify.rs)
    - position counts played frames (position.rs)
    """

    def __init__(self, input_node: Node, *, initially_paused: bool = False,
                 volume: float = 1.0):
        self.input = input_node
        self.spec = input_node.spec
        self.initially_paused = initially_paused
        self.volume = volume

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        return {
            "in": self.input.init_state(),
            "volume": jnp.asarray(self.volume, dtype=float_dtype()),
            "paused": jnp.asarray(self.initially_paused),
            "stopped": jnp.asarray(False),
            "frames": jnp.zeros((), dtype=jnp.int32),
        }

    def emit(self, state: State, n: int):
        import jax

        s2, block, valid = self.input.emit(state["in"], n)
        paused = state["paused"]
        stopped = state["stopped"]

        out = jnp.where(paused | stopped, jnp.zeros_like(block),
                        block * state["volume"])
        v = jnp.where(stopped, jnp.int32(0),
                      jnp.where(paused, jnp.int32(n), valid))
        s_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(paused | stopped, a, b), state["in"], s2
        )
        frames = state["frames"] + jnp.where(paused | stopped, 0, valid)
        return (
            {"in": s_new, "volume": state["volume"], "paused": paused,
             "stopped": stopped, "frames": frames},
            out,
            v,
        )


class Player:
    """Playback facade over queue+mixer (src/player.rs:20-362)."""

    def __init__(self, mixer_handle: Mixer, *, block_frames: int = 256):
        self.queue_tx, self.queue_rx = queue(True, block_frames=block_frames)
        self.queue_rx.on_start = self._on_sound_start
        self.block_frames = block_frames
        self._mixer = mixer_handle
        self._volume = 1.0
        self._paused = False
        self._stopped = False
        self._speed = 1.0
        #: skip_one marks queued-but-not-started sounds for clearing —
        #: the reference's to_clear counter, consumed at each sound's
        #: first periodic access (src/player.rs:144-151)
        self._pending_clear = 0
        self._signals: List[List[bool]] = []
        self._detached = False

    @classmethod
    def connect_new(cls, mixer_handle: Mixer, **kw) -> "Player":
        """(src/player.rs:73) — create and attach to a mixer."""
        player = cls(mixer_handle, **kw)
        mixer_handle.add(_QueueNode(player.queue_rx, mixer_handle.spec))
        return player

    # -- append (src/player.rs:104-170) --
    def append(self, node: Node, *, on_done=None) -> None:
        """Queue a sound; ``on_done`` fires when it finishes (the Done
        wrapper analog, src/source/done.rs)."""
        wrapped = self._wrap(node, self._speed)
        signal = self.queue_tx.append_with_signal(wrapped, callback=on_done)
        self._signals.append(signal)

    def periodic_access(self, period_seconds: float, fn) -> None:
        """Host hook every ``period_seconds`` of playback — the block
        analog of PeriodicAccess (src/source/periodic.rs)."""
        self.queue_rx.periodic_access(
            period_seconds, fn, self._mixer.spec.sample_rate
        )

    def _wrap(self, node: Node, speed: float,
              varispeed: Optional[bool] = None) -> "PlayerControl":
        from ..conversions.uniform import Uniform
        from ..conversions.varispeed import VariSpeed

        original = node
        vs = None
        if varispeed is None:
            varispeed = speed != 1.0
        if varispeed:
            # live varispeed stage: the ratio is a TRACED state field, so
            # subsequent set_speed calls are pure state updates — no
            # re-plan, no recompile (the block analog of the reference's
            # free runtime factor, src/source/speed.rs:56-65). Inserted
            # lazily (here or at the first set_speed) because its input
            # ring pre-buffers upstream audio, which would add latency
            # to OTHER live controls (e.g. spatial position) on sounds
            # that never change speed.
            # max_block covers the downstream Uniform's amplified pull
            # (rate conversion pulls up to ~4x the sink block)
            vs = VariSpeed(node, ratio=speed, max_ratio=8.0,
                           max_block=8 * self.block_frames)
            node = vs
        node = Uniform(
            node, self._mixer.spec.channels, self._mixer.spec.sample_rate
        )
        wrapped = PlayerControl(
            node, initially_paused=self._paused, volume=self._volume
        )
        wrapped.original = original  # kept for seek / first-change re-plans
        wrapped.varispeed = vs
        wrapped.speed = speed
        return wrapped

    # -- knobs --
    @staticmethod
    def _control_state(state) -> Optional[dict]:
        """Find the PlayerControl sub-state (the dict holding the knob
        fields) inside a possibly nested chain state — a mid-block
        rate stitch wraps the control node in an extra Uniform stage
        (queue.py _go_next), nesting its state one level down."""
        if not isinstance(state, dict):
            return None
        if "paused" in state and "stopped" in state:
            return state
        for v in state.values():
            found = Player._control_state(v)
            if found is not None:
                return found
        return None

    def _apply(self, **updates):
        cur = self.queue_rx.current
        if cur is None:
            return
        state = self._control_state(cur["state"])
        if state is not None:
            for k, v in updates.items():
                if k in state:
                    state[k] = (
                        jnp.asarray(v, dtype=state[k].dtype)
                        if hasattr(state[k], "dtype")
                        else v
                    )

    def _on_sound_start(self, cur: dict) -> None:
        """Land the live knobs on a newly-started sound. The reference
        applies the shared Controls at every sound's FIRST periodic
        access (src/player.rs:138-165), so volume/pause/speed changed
        between append and start take effect before its first sample;
        without this, each PlayerControl would keep its append-time
        knob snapshot."""
        state = self._control_state(cur["state"])
        if state is not None:
            updates = [("volume", self._volume), ("paused", self._paused)]
            if self._pending_clear > 0:
                # a skip_one issued before this sound started: consume
                # one pending clear and end it before its first sample
                # (the reference's to_clear, src/player.rs:144-151)
                self._pending_clear -= 1
                cur["skip_marked"] = True
                updates.append(("stopped", True))
            for k, v in updates:
                if k in state:
                    state[k] = (
                        jnp.asarray(v, dtype=state[k].dtype)
                        if hasattr(state[k], "dtype")
                        else v
                    )
        if getattr(cur["node"], "speed", self._speed) != self._speed:
            self.set_speed(self._speed)

    def play(self):
        self._paused = False
        self._apply(paused=False)

    def pause(self):
        self._paused = True
        self._apply(paused=True)

    def is_paused(self) -> bool:
        return self._paused

    def set_volume(self, volume: float):
        self._volume = volume
        self._apply(volume=volume)

    def volume(self) -> float:
        return self._volume

    @staticmethod
    def _update_varispeed(state, vs, speed):
        """Walk the nested chain state to the VariSpeed sub-state (the
        dict holding both 'ratio' and 'ring') and swap the ratio."""
        if not isinstance(state, dict):
            return False
        if "ratio" in state and "ring" in state:
            new = vs.set_ratio(state, speed)
            state.update(new)
            return True
        for v in state.values():
            if isinstance(v, dict) and Player._update_varispeed(
                v, vs, speed
            ):
                return True
        return False

    def set_speed(self, speed: float):
        """Live varispeed with ZERO recompiles: every appended sound
        carries a VariSpeed stage whose ratio is a traced state field
        (conversions/varispeed.py), so the new factor is a pure state
        update taking effect at the next block — the block analog of the
        reference's free runtime factor (src/source/speed.rs:56-65).
        Source position is naturally preserved (the ring keeps pulling
        from where it was)."""
        self._speed = speed
        cur = self.queue_rx.current
        if cur is None:
            return
        node = cur["node"]
        vs = getattr(node, "varispeed", None)
        if vs is not None and self._update_varispeed(
            cur["state"], vs, speed
        ):
            node.speed = speed
            return
        # first speed change on a chain built without a VariSpeed stage:
        # re-plan ONCE inserting it (subsequent changes are state-only),
        # preserving playback position
        old = cur["node"]
        original = getattr(old, "original", None)
        if original is None or getattr(old, "speed", 1.0) == speed:
            return
        pos_secs = 0.0
        state = cur["state"]
        if isinstance(state, dict) and "frames" in state:
            pos_secs = float(state["frames"]) / old.spec.sample_rate
        source_secs = pos_secs * getattr(old, "speed", 1.0)
        pos_secs = source_secs / speed
        wrapped = self._wrap(original, speed, varispeed=True)
        from ..graph.render import compile_step
        from ..graph.seek import seek_state

        new_state = seek_state(wrapped, pos_secs)
        if isinstance(new_state, dict) and isinstance(state, dict):
            for k in ("volume", "paused", "stopped", "frames"):
                if k in state and k in new_state:
                    new_state[k] = state[k]
        cur["node"] = wrapped
        cur["state"] = new_state
        cur["step"] = compile_step(wrapped, self.queue_rx.block_frames)
        cur["leftover"] = None
        cur["ended"] = False

    def speed(self) -> float:
        return self._speed

    def stop(self):
        self._stopped = True
        self._apply(stopped=True)
        self.queue_tx.clear()
        # dropped pending sounds can never consume their clears — don't
        # let stale marks kill sounds appended after the stop
        self._pending_clear = 0

    def skip_one(self):
        """End one sound: the current one (the queue advances next
        block), or — when the current is already skip-marked — the next
        queued sound at its start. Mirrors the reference's to_clear
        accounting, which queues a clear only while live sounds
        outnumber pending clears (src/player.rs:299-306)."""
        cur = self.queue_rx.current
        alive = len(self.queue_tx.next_sounds)
        marked = 0
        if cur is not None:
            if cur.get("skip_marked"):
                marked = 1
            else:
                alive += 1
        if alive <= self._pending_clear + marked:
            return  # nothing left to skip
        if cur is not None and not cur.get("skip_marked"):
            cur["skip_marked"] = True
            self._apply(stopped=True)
        else:
            self._pending_clear += 1

    def clear(self):
        """Drop every loaded sound and pause (src/player.rs:283-293)."""
        self.queue_tx.clear()
        self._pending_clear = 0
        self.skip_one()
        self._paused = True

    def get_pos(self) -> float:
        cur = self.queue_rx.current
        if cur is None:
            return 0.0
        state = cur["state"]
        if isinstance(state, dict) and "frames" in state:
            return float(state["frames"]) / cur["node"].spec.sample_rate
        return 0.0

    def try_seek(self, pos: float) -> None:
        """Seek within the current sound. Rebuilds the source state at
        the target position (O(pre-roll), graph/seek.py). On failure
        raises :class:`rodio_tpu.SeekError`; when ``source_intact`` is
        True the sound keeps playing from its pre-seek position —
        nothing is modified before the new state is fully built
        (src/source/mod.rs:797-809)."""
        cur = self.queue_rx.current
        if cur is None:
            return
        node = cur["node"]
        seek = getattr(node, "seek_state", None)
        if seek is None:
            from ..graph.seek import seek_state

            vs = getattr(node, "varispeed", None)
            # the position mapping and the rebuilt state must both
            # reflect the LIVE speed, not the append-time one
            ratio = self._speed if vs is not None else None
            new_state = seek_state(node, pos, varispeed_ratio=ratio)
        else:
            new_state = seek(pos)
        # carry the live control knobs across the rebuilt state (the
        # reference's wrappers keep their shared Controls through seeks)
        old_state = cur["state"]
        if isinstance(new_state, dict) and isinstance(old_state, dict):
            for k in ("volume", "paused", "stopped"):
                if k in old_state and k in new_state:
                    new_state[k] = old_state[k]
        if isinstance(new_state, dict) and "frames" in new_state:
            # get_pos reports the SEEK TARGET going forward — the
            # reference's TrackPosition::try_seek sets offset_duration
            # to pos and resets the span counter
            # (src/source/position.rs:136-141); the rebuilt state's
            # counter otherwise holds the pre-roll replay count.
            rate = node.spec.sample_rate
            target = int(pos * rate)
            total = node.total_frames()
            if total is not None:
                target = min(target, total)
            new_state["frames"] = jnp.asarray(max(target, 0), jnp.int32)
        cur["state"] = new_state
        cur["leftover"] = None
        cur["ended"] = False

    def len(self) -> int:
        """Live sound count; skipped sounds leave it IMMEDIATELY, like
        the reference's sound_count (src/player.rs:299-306), even
        though they drain from the queue a block later."""
        n = len(self.queue_tx.next_sounds)
        cur = self.queue_rx.current
        if cur is not None and not cur.get("skip_marked"):
            n += 1
        return max(0, n - self._pending_clear)

    def empty(self) -> bool:
        return self.len() == 0

    def sleep_until_end(self, *, max_blocks: int = 10**7) -> None:
        """Drain the attached mixer until this player's queue is empty —
        the offline analog of src/player.rs:322."""
        src = self._mixer._source
        for _ in range(max_blocks):
            if self.empty():
                return
            if src is not None:
                _, alive = src.next_block(self.block_frames)
                if not alive:
                    return
            else:
                self.queue_rx.next_block()


class _QueueNode(Node):
    """Adapter exposing a host-driven queue output as a mixer member. The
    mixer's host loop detects the ``next_block`` attribute and sums the
    queue's block alongside the traced sources."""

    def __init__(self, queue_rx, spec: StreamSpec):
        self.queue_rx = queue_rx
        self.spec = spec

    def total_frames(self) -> Optional[int]:
        return None

    def next_block(self, n: int):
        block, alive = self.queue_rx.next_block(n)
        if block.shape[0] != self.spec.channels:
            from ..conversions.channels import rechannel_block

            block = np.asarray(
                rechannel_block(jnp.asarray(block), block.shape[0],
                                self.spec.channels)
            )
        return block, alive
