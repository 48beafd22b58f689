"""Offline rendering — the block engine's pull-to-exhaustion path.

The analog of the reference's wav_to_file render loop
(src/wav_output.rs:62-92): the whole source graph compiles into ONE jitted
block step; the host loop (or a device-side `lax.scan` when the length is
known) drives it block by block.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node

DEFAULT_BLOCK = 4096


def compile_step(node: Node, block_frames: int):
    """Jitted (state) -> (state, block, valid) for one block."""

    @jax.jit
    def step(state):
        return node.emit(state, block_frames)

    return step


def render(node: Node, *, max_frames: Optional[int] = None,
           block_frames: int = DEFAULT_BLOCK) -> np.ndarray:
    """Render a node to a [channels, frames] numpy array.

    Pulls until the stream reports an incomplete block (valid < block) or
    ``max_frames`` is reached. Infinite sources require ``max_frames``.
    """
    total = node.total_frames()
    if total is None and max_frames is None:
        raise ValueError(
            "render() of an unbounded source requires max_frames"
        )
    limit = max_frames if total is None else (
        total if max_frames is None else min(total, max_frames)
    )

    if limit == 0:
        return np.zeros((node.spec.channels, 0), dtype=np.float32)
    step = compile_step(node, block_frames)
    state = node.init_state()
    chunks = []
    produced = 0
    while produced < limit:
        state, block, valid = step(state)
        v = int(valid)
        if v > 0:
            chunks.append(np.asarray(block[:, :v]))
            produced += v
        if v < block_frames:
            break
    if not chunks:
        return np.zeros((node.spec.channels, 0), dtype=np.float32)
    out = np.concatenate(chunks, axis=1)
    return out[:, :limit]


def render_scan(node: Node, n_blocks: int, *, block_frames: int = DEFAULT_BLOCK):
    """Device-side whole-render: `lax.scan` over blocks, one compilation,
    zero host round-trips. Returns ([channels, n_blocks*block], valids).

    This is the high-throughput path for fixed-length workloads (the
    TPU analog of the realtime callback loop's steady state).
    """

    def body(state, _):
        state, block, valid = node.emit(state, block_frames)
        return state, (block, valid)

    @jax.jit
    def run(state):
        state, (blocks, valids) = jax.lax.scan(
            body, state, None, length=n_blocks
        )
        # blocks: [n_blocks, C, T] -> [C, n_blocks*T]
        c = blocks.shape[1]
        out = jnp.moveaxis(blocks, 0, 1).reshape(c, -1)
        return state, out, valids

    return run


def record(node: Node):
    """Materialize a node into a device-resident SamplesBuffer — the analog
    of `.buffered()` / `.record()` (src/buffer.rs:62, src/source/buffered.rs).
    """
    from ..sources.generators import SamplesBuffer

    data = render(node)
    return SamplesBuffer(node.spec.channels, node.spec.sample_rate, data)
