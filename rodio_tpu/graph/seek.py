"""Generic seek support.

The reference threads try_seek through every wrapper down to the decoder
(src/source/mod.rs:754). Block-engine states are pure functions of the
graph + position, so the generic strategy is: rebuild the state and
fast-forward to the target frame. Sources with O(1) seeks (buffers,
generators, decoders with indexes) override via ``seek_state``.
"""
from __future__ import annotations

from ..core.node import Node


def seek_state(node: Node, seconds: float, *, step_frames: int = 8192):
    """Return a fresh state positioned at ``seconds`` (saturating at the end,
    matching the reference's saturation contract, src/source/mod.rs:739-742).
    """
    target = int(seconds * node.spec.sample_rate)
    total = node.total_frames()
    if total is not None:
        target = min(target, total)
    state = node.init_state()
    if target <= 0:
        return state
    from .render import compile_step

    step = compile_step(node, step_frames)
    remaining = target
    while remaining >= step_frames:
        state, _, valid = step(state)
        remaining -= step_frames
        if int(valid) < step_frames:
            return state  # saturated at stream end
    if remaining > 0:
        state, _, _ = node.emit(state, int(remaining))
    return state
