"""Block-dtype boundaries: the opt-in bf16 inter-stage contract.

The engine's sample type is f32 — the reference's ``Sample``
(src/common.rs:18-48: f32 default, f64 behind the ``64bit`` feature).
This module extends that precision policy DOWNWARD for bandwidth-bound
unfused graphs: a :class:`Bf16Boundary` re-materializes the block at
bfloat16 between stages, halving the HBM traffic of the inter-stage
``[S*C, T]`` buffers (the usual bottleneck on TPU). Compute inside every
stage stays f32: the Pallas biquad upcasts on load and runs its
recurrence in the state dtype (ops/pallas_scan.py), XLA consumers fuse
the upcast into their first read, and the wide mixer accumulates its
512-way sum in f32 (parallel/batch.py).

Contract (documented deviation, like the AgcGroup note): each boundary
quantizes the signal to 8 significand bits — ~2^-9 relative per
boundary; a downstream resonant biquad can integrate that to ~1e-2
relative. Pinned by tests/test_block_parity.py::test_bf16_block_mode.
Default OFF; f32 blocks remain the fidelity contract everywhere.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.node import Node, State


class Bf16Boundary(Node):
    """Downcast the block to bfloat16 at a stage boundary.

    The block stays bf16 until a consumer upcasts (stages accept any
    float block dtype; state/carries stay f32). Insert after the
    heavy producers (resampler matmul: the cast fuses into the matmul
    epilogue, so the [S*C, T] buffer is WRITTEN at half width)."""

    def __init__(self, input_node: Node):
        self.input = input_node
        self.spec = input_node.spec

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        return self.input.init_state()

    def emit(self, state: State, n: int):
        s, x, valid = self.input.emit(state, n)
        return s, x.astype(jnp.bfloat16), valid
