"""Multi-chip scale-out over a device mesh.

The reference has no distributed tier (SURVEY.md §2.9); its concurrency is
one OS audio thread. The TPU framework scales the STREAM axis across chips:
per-stream DSP is embarrassingly parallel, so states shard over a 1-D
``("streams",)`` mesh and the whole block step runs SPMD under jit — the
only collective is the final `psum` when a mix graph spans chips (the
cross-chip analog of src/mixer.rs:185-198), riding ICI.

Long audio is handled by STREAMING (O(1) state per effect, time scanned,
never sharded) — the same answer the reference gives for unbounded
sequences, at block granularity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.node import Node, State
from .batch import BatchedChain


def stream_mesh(devices: Optional[Sequence] = None, axis: str = "streams") -> Mesh:
    """1-D mesh over all (or given) devices, stream axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_batched_state(state: State, mesh: Mesh, axis: str = "streams") -> State:
    """Place a stacked per-stream state onto the mesh, sharded on the leading
    stream axis."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


class ShardedMixer(Node):
    """Cross-chip mixer: shard the stream axis, emit locally, psum the mix.

    Built on `shard_map` so the per-chip body is explicit SPMD: each chip
    vmaps its local streams, reduces locally, and one `psum` over the stream
    axis of the mesh produces the global [C, T] mix on every chip.
    """

    def __init__(self, chain: BatchedChain, mesh: Mesh, axis: str = "streams"):
        self.chain = chain
        self.mesh = mesh
        self.axis = axis
        self.spec = chain.spec

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return shard_batched_state(self.chain.state, self.mesh, self.axis)

    def emit(self, state: State, n: int):
        template = self.chain.template
        axis = self.axis

        def per_chip(local_state):
            st, blocks, valids = jax.vmap(
                lambda s: template.emit(s, n)
            )(local_state)
            local_sum = jnp.sum(blocks, axis=0)
            total = jax.lax.psum(local_sum, axis)
            max_valid = jax.lax.pmax(jnp.max(valids, initial=0), axis)
            return st, total, max_valid

        from jax.experimental.shard_map import shard_map

        state_specs = jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), state
        )
        fn = shard_map(
            per_chip,
            mesh=self.mesh,
            in_specs=(state_specs,),
            out_specs=(state_specs, P(), P()),
        )
        return fn(state)


class ShardedBatch:
    """Sharded S-stream batch WITHOUT mixing: each chip renders its local
    streams; outputs stay sharded [S, C, T] (no collectives at all)."""

    def __init__(self, chain: BatchedChain, mesh: Mesh, axis: str = "streams"):
        self.chain = chain
        self.mesh = mesh
        self.axis = axis

    def init_state(self) -> State:
        return shard_batched_state(self.chain.state, self.mesh, self.axis)

    def emit(self, state: State, n: int):
        out_shard = NamedSharding(self.mesh, P(self.axis))

        @jax.jit
        def step(st):
            return self.chain.emit(st, n)

        return step(state)
