"""Dynamic N-way mixer — block-level control plane.

TPU-native rebuild of src/mixer.rs. The reference sums per-sample over a
Vec of boxed sources on the audio thread (src/mixer.rs:185-198) and admits
new sources at frame boundaries (src/mixer.rs:175-183). The block engine:

- every added source is wrapped in a Uniform stage (src/mixer.rs:62-66),
- the mixer's emit TRACES a Python loop over the current membership, so one
  jitted program fuses the entire N-way sum; membership changes recompile
  (cached per structure) — the block analog of mpsc admission,
- admission is block-aligned (blocks are whole frames, so channel phase is
  preserved — the property the reference's frame-boundary rule protects),
- exhausted sources are pruned lazily at block boundaries.

For the large-batch homogeneous case use
:class:`rodio_tpu.parallel.batch.BatchedMixer`, which vmaps one chain over a
stream axis instead of unrolling.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State
from ..core.types import StreamSpec, float_dtype
from ..conversions.uniform import Uniform


class Mixer:
    """Input handle (src/mixer.rs:25-67)."""

    def __init__(self, channels: int, sample_rate: int,
                 *, rodio_compat: bool = False):
        self.spec = StreamSpec(channels, sample_rate)
        self._rodio_compat = rodio_compat
        self._pending: List[Tuple[Node, State]] = []
        self._source: Optional["MixerSource"] = None

    def add(self, node: Node) -> None:
        if hasattr(node, "next_block"):
            # host-driven source (e.g. a Player queue): must already match
            # the mixer format; summed on the host side of the block loop
            if node.spec != self.spec:
                raise ValueError(
                    "host-driven sources must match the mixer format"
                )
            self._pending.append((node, None))
            return
        uni = Uniform(
            node, self.spec.channels, self.spec.sample_rate,
            rodio_compat=self._rodio_compat,
        )
        self._pending.append((uni, uni.init_state()))


class MixerSource(Node):
    """Output node (src/mixer.rs:70-198). Drive with next_block()."""

    def __init__(self, mixer: Mixer):
        self.mixer = mixer
        self.spec = mixer.spec
        mixer._source = self
        self._current: List[Tuple[Node, State]] = []
        self._step_cache = {}

    def total_frames(self) -> Optional[int]:
        return None

    def _admit(self):
        if self.mixer._pending:
            self._current.extend(self.mixer._pending)
            self.mixer._pending.clear()

    def _step_fn(self, nodes: Tuple[Node, ...], n: int):
        key = (tuple(id(x) for x in nodes), n)
        if key not in self._step_cache:
            def step(states):
                total = jnp.zeros((self.spec.channels, n), dtype=float_dtype())
                new_states = []
                valids = []
                for node, st in zip(nodes, states):
                    st2, block, v = node.emit(st, n)
                    total = total + block
                    new_states.append(st2)
                    valids.append(v)
                return new_states, total, jnp.stack(valids) if valids else jnp.zeros((0,), jnp.int32)

            self._step_cache[key] = jax.jit(step)
        return self._step_cache[key]

    def next_block(self, n: int):
        """Host-driven pull of one [channels, n] block.

        Returns (block, alive): alive=False when the mixer has ended (no
        sources — the reference's Empty behavior, src/mixer.rs:131-135).
        """
        self._admit()
        if not self._current:
            return np.zeros((self.spec.channels, n), dtype=np.float32), False

        traced = [(node, st) for node, st in self._current
                  if not hasattr(node, "next_block")]
        hosted = [node for node, _ in self._current
                  if hasattr(node, "next_block")]

        total = np.zeros((self.spec.channels, n), dtype=np.float32)
        survivors: List[Tuple[Node, State]] = []
        any_yield = False
        if traced:
            nodes = tuple(node for node, _ in traced)
            states = [st for _, st in traced]
            step = self._step_fn(nodes, n)
            new_states, tr_total, valids = step(states)
            total = total + np.asarray(tr_total)
            valids = np.asarray(valids)
            # retain only sources that still produced samples (src/mixer.rs:187)
            survivors.extend(
                (node, st)
                for (node, _), st, v in zip(traced, new_states, valids)
                if v > 0
            )
            any_yield = any_yield or bool((valids > 0).any())
        for node in hosted:
            block, alive = node.next_block(n)
            total = total + block
            if alive:
                survivors.append((node, None))
                any_yield = True
        self._current = survivors
        # the mixer ends at the first pull where no source yields
        # (src/mixer.rs:131-135, checked after exhausted sources are dropped)
        return total, any_yield

    # Node protocol: a mixer with FIXED membership is itself traceable, so it
    # can sit inside larger jitted graphs (membership frozen at trace time).
    def init_state(self) -> State:
        self._admit()
        return [st for _, st in self._current]

    def emit(self, state: State, n: int):
        nodes = [node for node, _ in self._current]
        total = jnp.zeros((self.spec.channels, n), dtype=float_dtype())
        new_states = []
        max_valid = jnp.int32(0)
        for node, st in zip(nodes, state):
            st2, block, v = node.emit(st, n)
            total = total + block
            new_states.append(st2)
            max_valid = jnp.maximum(max_valid, v)
        return new_states, total, max_valid


def mixer(channels: int, sample_rate: int, *, rodio_compat: bool = False):
    """(Mixer, MixerSource) pair (src/mixer.rs:25)."""
    m = Mixer(channels, sample_rate, rodio_compat=rodio_compat)
    return m, MixerSource(m)
