"""Sequential source concatenation — from_iter / from_factory equivalents.

TPU-native rebuild of src/source/from_iter.rs and from_factory.rs: play a
(lazy) sequence of sources back to back, each source materializing on
demand. Built on the queue machinery, which stitches transitions at sample
resolution while every source's DSP stays fully compiled — the block-engine
analog of the reference's pull-on-demand iterator chaining.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax.numpy as jnp

from ..core.node import Node, State
from ..core.types import StreamSpec
from ..control.queue import SourcesQueueInput, SourcesQueueOutput


def from_iter(sources: Iterable[Node], *, keep_alive: bool = False,
              block_frames: int = 4096) -> SourcesQueueOutput:
    """Lazy host-driven concatenation (src/source/from_iter.rs:8-19):
    returns a queue output that plays the sources in order."""
    q = SourcesQueueInput(keep_alive)
    for s in sources:
        q.append(s)
    return SourcesQueueOutput(q, block_frames=block_frames)


def from_factory(factory: Callable[[], Optional[Node]], *,
                 block_frames: int = 4096) -> "FactoryQueueOutput":
    """Lazy factory-driven concatenation (src/source/from_factory.rs:4):
    the factory is invoked whenever the previous source drains; returning
    None ends the stream."""
    return FactoryQueueOutput(factory, block_frames=block_frames)


class FactoryQueueOutput(SourcesQueueOutput):
    def __init__(self, factory, *, block_frames: int = 4096):
        super().__init__(SourcesQueueInput(False), block_frames=block_frames)
        self._factory = factory
        self._factory_done = False

    def _go_next(self, target_rate: Optional[int] = None) -> bool:
        if not self.input.next_sounds and not self._factory_done:
            nxt = self._factory()
            if nxt is None:
                self._factory_done = True
            else:
                self.input.append(nxt)
        return super()._go_next(target_rate=target_rate)


class EmptyCallback(Node):
    """Zero-length source invoking a callback when (host-)pulled
    (src/source/empty_callback.rs:9). Useful as a queue sentinel that
    fires when playback reaches it."""

    def __init__(self, callback: Callable[[], None],
                 channels: int = 1, sample_rate: int = 48000):
        self.callback = callback
        self.spec = StreamSpec(channels, sample_rate)

    def total_frames(self) -> Optional[int]:
        return 0

    def init_state(self) -> State:
        return {}

    def emit(self, state: State, n: int):
        return state, jnp.zeros((self.spec.channels, n)), jnp.int32(0)

    def next_block(self, n: int):
        import numpy as np

        self.callback()
        return np.zeros((self.spec.channels, n), dtype=np.float32), False
