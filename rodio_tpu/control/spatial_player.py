"""SpatialPlayer — positional playback control.

TPU-native rebuild of src/spatial_player.rs: a Player whose sounds pass
through a Spatial stage (ChannelVolume with L/R gains from emitter/ear
geometry), with repositioning applied at block boundaries — the analog of
the reference's 10 ms periodic_access repositioning
(src/spatial_player.rs:59-78).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.node import Node
from ..core.types import float_dtype
from ..effects.basic import Spatial
from ..refimpl.effects import spatial_volumes
from .mixer import Mixer
from .player import Player


class SpatialPlayer(Player):
    def __init__(self, mixer_handle: Mixer, emitter_position, left_ear,
                 right_ear, *, block_frames: int = 512):
        super().__init__(mixer_handle, block_frames=block_frames)
        self._emitter = list(emitter_position)
        self._left_ear = list(left_ear)
        self._right_ear = list(right_ear)

    @classmethod
    def connect_new(cls, mixer_handle: Mixer, emitter_position=(0, 0, 0),
                    left_ear=(-1, 0, 0), right_ear=(1, 0, 0), **kw):
        player = cls(mixer_handle, emitter_position, left_ear, right_ear, **kw)
        from .player import _QueueNode

        mixer_handle.add(_QueueNode(player.queue_rx, mixer_handle.spec))
        return player

    def append(self, node: Node) -> None:
        spatial = Spatial(node, self._emitter, self._left_ear, self._right_ear)
        super().append(spatial)

    def set_emitter_position(self, pos) -> None:
        self._emitter = list(pos)
        self._reposition()

    def set_left_ear_position(self, pos) -> None:
        self._left_ear = list(pos)
        self._reposition()

    def set_right_ear_position(self, pos) -> None:
        self._right_ear = list(pos)
        self._reposition()

    def _reposition(self) -> None:
        """Update the live Spatial stage's volumes (applied at the next
        block boundary, the 10 ms periodic repositioning analog)."""
        cur = self.queue_rx.current
        if cur is None:
            return
        lvol, rvol = spatial_volumes(
            self._emitter, self._left_ear, self._right_ear
        )
        state = cur["state"]
        # PlayerControl{in: Uniform->...->ChannelVolume state has "volumes"}
        target = _find_volumes(state)
        if target is not None:
            target["volumes"] = jnp.asarray(
                [lvol, rvol], dtype=float_dtype()
            )


def _find_volumes(state):
    """Locate the ChannelVolume state dict in a nested state pytree."""
    if isinstance(state, dict):
        if "volumes" in state:
            return state
        for v in state.values():
            found = _find_volumes(v)
            if found is not None:
                return found
    elif isinstance(state, (list, tuple)):
        for v in state:
            found = _find_volumes(v)
            if found is not None:
                return found
    return None
