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

Runtime speed changes currently take effect per appended source at append
time (static resample ratio); live varispeed is on the roadmap (traced
ratio resampling).
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
        self.block_frames = block_frames
        self._mixer = mixer_handle
        self._volume = 1.0
        self._paused = False
        self._stopped = False
        self._speed = 1.0
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

    def _wrap(self, node: Node, speed: float) -> "PlayerControl":
        from ..conversions.uniform import Uniform

        original = node
        if speed != 1.0:
            from ..effects.basic import Speed

            node = Speed(node, speed)
        node = Uniform(
            node, self._mixer.spec.channels, self._mixer.spec.sample_rate
        )
        wrapped = PlayerControl(
            node, initially_paused=self._paused, volume=self._volume
        )
        wrapped.original = original  # kept for live re-plans (speed changes)
        wrapped.speed = speed
        return wrapped

    # -- knobs --
    def _apply(self, **updates):
        cur = self.queue_rx.current
        if cur is None:
            return
        state = cur["state"]
        if isinstance(state, dict):
            for k, v in updates.items():
                if k in state:
                    state[k] = (
                        jnp.asarray(v, dtype=state[k].dtype)
                        if hasattr(state[k], "dtype")
                        else v
                    )

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

    def set_speed(self, speed: float):
        """Live varispeed: queued sounds pick the new factor up on start;
        the CURRENT sound re-plans at the next block boundary — the block
        analog of the reference's span re-bootstrap with the scaled rate
        (src/source/speed.rs + src/source/uniform.rs interplay)."""
        self._speed = speed
        cur = self.queue_rx.current
        if cur is None:
            return
        old = cur["node"]
        original = getattr(old, "original", None)
        if original is None or getattr(old, "speed", 1.0) == speed:
            return
        # rebuild the chain at the new ratio, preserving playback position
        # and control state
        pos_secs = 0.0
        state = cur["state"]
        if isinstance(state, dict) and "frames" in state:
            pos_secs = float(state["frames"]) / old.spec.sample_rate
        # preserve the SOURCE position (the reference keeps pulling from the
        # same sample; only the playback rate changes): source seconds =
        # out seconds x old factor, re-expressed in the new chain's timeline
        source_secs = pos_secs * getattr(old, "speed", 1.0)
        pos_secs = source_secs / speed
        wrapped = self._wrap(original, speed)
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

    def skip_one(self):
        """End the current sound; the queue advances (src/player.rs:287)."""
        self._apply(stopped=True)

    def clear(self):
        self.queue_tx.clear()
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
        """Seek within the current sound. Rebuilds the source state at the
        target position (the block engine's states are recomputable)."""
        cur = self.queue_rx.current
        if cur is None:
            return
        node = cur["node"]
        seek = getattr(node, "seek_state", None)
        if seek is None:
            from ..graph.seek import seek_state

            cur["state"] = seek_state(node, pos)
        else:
            cur["state"] = seek(pos)
        cur["leftover"] = None
        cur["ended"] = False

    def len(self) -> int:
        n = len(self.queue_tx.next_sounds)
        if self.queue_rx.current is not None:
            n += 1
        return n

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
