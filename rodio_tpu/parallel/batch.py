"""Stream-batch execution — the production path.

The reference is single-stream per graph; its mixer loops over boxed
iterators per sample (src/mixer.rs:185-198). The TPU framework's headline
capability is the inverse: S structurally-identical chains run in lockstep
as ONE program via `jax.vmap` over a leading stream axis — the 512-stream
pipeline is a single fused XLA computation per block, and the mixer's N-way
sum is a reduction over that axis (the analog of sum_current_sources).

Per-stream variation (different PCM buffers, gains, frequencies, lifetimes)
lives entirely in the state pytree; one compilation serves any batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State
from ..core.types import StreamSpec, float_dtype


def stack_states(states: Sequence[State]) -> State:
    """Stack S per-stream states into one batched state (leading axis S).

    All states must share a structure and leaf shapes (pad buffers to a
    common length; lengths live in the state's ``end`` fields).
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


class BatchedChain:
    """S lockstep copies of one chain. ``emit`` maps over the stream axis.

    The template node defines the structure; the batched state carries the
    per-stream content.
    """

    def __init__(self, template: Node, batched_state: State, n_streams: int):
        self.template = template
        self.state = batched_state
        self.n_streams = n_streams
        self.spec = template.spec

    @classmethod
    def from_states(cls, template: Node, states: Sequence[State]):
        return cls(template, stack_states(states), len(states))

    def emit(self, state: State, n: int):
        """(state, blocks [S, C, n], valids [S])"""
        return jax.vmap(
            lambda s: self.template.emit(s, n), in_axes=0, out_axes=0
        )(state)


class BatchedMixer(Node):
    """Sum a BatchedChain over the stream axis -> single [C, T] stream.

    The block analog of the reference mixer's hot loop, as one reduction.
    """

    def __init__(self, chain: BatchedChain):
        self.chain = chain
        self.spec = chain.spec

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return self.chain.state

    def emit(self, state: State, n: int):
        state, blocks, valids = self.chain.emit(state, n)
        total = jnp.sum(blocks, axis=0)
        return state, total, jnp.max(valids, initial=0)


class WideMixer(Node):
    """Stream-axis mixer for the WIDE-CHANNEL batch layout.

    The most TPU-friendly way to run S homogeneous streams is to fold the
    stream axis into the channel axis: one chain of S*C channels, no vmap —
    every per-channel node (buffer slice, resampler matmul, biquad lanes,
    per-channel gains) vectorizes natively and XLA sees plain dense ops.
    This node closes the batch: [S*C, T] -> sum over S -> [C, T], the
    mixer's N-way reduction (src/mixer.rs:185-198).
    """

    def __init__(self, input_node: Node, n_streams: int):
        wide = input_node.spec.channels
        if wide % n_streams:
            raise ValueError("channel count not divisible by stream count")
        from ..core.types import StreamSpec

        self.input = input_node
        self.n_streams = n_streams
        self.spec = StreamSpec(wide // n_streams, input_node.spec.sample_rate)

    def total_frames(self):
        return self.input.total_frames()

    def init_state(self) -> State:
        return self.input.init_state()

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state, n)
        c = self.spec.channels
        # accumulate the stream sum in the engine dtype: a bf16 block
        # (conversions/blockdtype.py contract) is READ at half width but
        # never summed at bf16 precision (512-way accumulation would
        # lose ~2^-9 * sqrt(S) otherwise)
        mixed = block.astype(float_dtype()).reshape(
            self.n_streams, c, n
        ).sum(axis=0)
        return s, mixed, valid


def batched_buffers(channels: int, sample_rate: int,
                    buffers: Sequence[np.ndarray]):
    """Build a (template SamplesBuffer, stacked state) pair from per-stream
    PCM arrays of varying length (padded to the longest)."""
    from ..sources.generators import SamplesBuffer

    dt = float_dtype()
    frames = [
        (b.shape[1] if b.ndim == 2 else len(b) // channels) for b in buffers
    ]
    max_frames = max(frames)
    states = []
    template = None
    for buf, nf in zip(buffers, frames):
        arr = np.zeros((channels, max_frames), dtype=dt)
        if buf.ndim == 1:
            buf = buf[: nf * channels].reshape(nf, channels).T
        arr[:, :nf] = buf
        node = SamplesBuffer(channels, sample_rate, arr)
        st = node.init_state()
        st["end"] = jnp.asarray(nf, dtype=jnp.int32)
        states.append(st)
        if template is None:
            template = node
    return template, stack_states(states)
