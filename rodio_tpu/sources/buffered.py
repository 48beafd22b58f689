"""Lazy shared-cache buffering — the Buffered combinator.

TPU-native rebuild of src/source/buffered.rs: the reference lazily
materializes spans into a shared Arc linked list; clones replay from the
cache while the original keeps extending it. Here the cache is a shared
list of rendered blocks; each clone holds its own read position. The
source's DSP stays fully compiled (blocks render through its jitted step
on demand).

A fully-drained Buffered can convert to a device-resident SamplesBuffer
(`to_buffer()`), re-entering the traceable world with random access.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.node import Node
from ..core.types import StreamSpec


class _SharedCache:
    def __init__(self, node: Node, block_frames: int):
        from ..graph.render import compile_step

        self.node = node
        self.block_frames = block_frames
        self.step = compile_step(node, block_frames)
        self.state = node.init_state()
        self.chunks: List[np.ndarray] = []
        self.frames = 0
        self.exhausted = False

    def ensure(self, frames: int) -> None:
        """Extend the cache to cover at least `frames` frames."""
        while self.frames < frames and not self.exhausted:
            self.state, block, valid = self.step(self.state)
            v = int(valid)
            if v > 0:
                self.chunks.append(np.asarray(block[:, :v]))
                self.frames += v
            if v < self.block_frames:
                self.exhausted = True

    def read(self, start: int, n: int) -> np.ndarray:
        """[C, n] window (zero-padded past the end)."""
        self.ensure(start + n)
        c = self.node.spec.channels
        out = np.zeros((c, n), dtype=np.float32)
        pos = 0
        filled_from = start
        for chunk in self.chunks:
            w = chunk.shape[1]
            lo = max(filled_from, pos)
            hi = min(start + n, pos + w)
            if hi > lo:
                out[:, lo - start : hi - start] = chunk[:, lo - pos : hi - pos]
            pos += w
            if pos >= start + n:
                break
        return out


class Buffered:
    """Host-driven buffered source; `clone()` shares the cache
    (src/source/buffered.rs:11-125). Drives mixers/queues via next_block."""

    def __init__(self, node: Node, *, block_frames: int = 4096,
                 _cache: Optional[_SharedCache] = None):
        self._cache = _cache or _SharedCache(node, block_frames)
        self.spec = node.spec if _cache is None else self._cache.node.spec
        self._pos = 0

    def clone(self) -> "Buffered":
        c = Buffered.__new__(Buffered)
        c._cache = self._cache
        c.spec = self.spec
        c._pos = 0
        return c

    def total_frames(self) -> Optional[int]:
        return self._cache.node.total_frames()

    def next_block(self, n: int):
        """(block [C, n], alive) — alive=False once drained."""
        cache = self._cache
        cache.ensure(self._pos + n)
        if self._pos >= cache.frames and cache.exhausted:
            return np.zeros((self.spec.channels, n), np.float32), False
        block = cache.read(self._pos, n)
        self._pos += n
        return block, True

    def to_buffer(self):
        """Materialize fully -> a traceable SamplesBuffer node."""
        from .generators import SamplesBuffer

        self._cache.ensure(2**62)
        data = (
            np.concatenate(self._cache.chunks, axis=1)
            if self._cache.chunks
            else np.zeros((self.spec.channels, 0), np.float32)
        )
        return SamplesBuffer(self.spec.channels, self.spec.sample_rate, data)
