"""Channel-count conversion — block engine.

TPU-native rebuild of src/conversions/channels.rs:57-84: positional up/down
mix. mono->N duplicates ch0 into ch1 and zero-fills ch>=2; N->M keeps the
first M channels. In frame-major blocks this is a static gather over the
channel axis — free after XLA fusion.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.node import Node, State
from ..core.types import StreamSpec


def rechannel_block(block, from_channels: int, to_channels: int):
    """[from, T] -> [to, T] with the reference's positional rules."""
    if from_channels == to_channels:
        return block
    rows = []
    for c in range(to_channels):
        if c < from_channels:
            rows.append(block[c])
        elif c == 1 and from_channels == 1:
            rows.append(block[0])
        else:
            rows.append(jnp.zeros_like(block[0]))
    return jnp.stack(rows, axis=0)


class RechannelNode(Node):
    def __init__(self, input_node: Node, to_channels: int):
        self.input = input_node
        self.from_channels = input_node.spec.channels
        self.spec = StreamSpec(to_channels, input_node.spec.sample_rate)

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        return self.input.init_state()

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state, n)
        return s, rechannel_block(block, self.from_channels, self.spec.channels), valid
