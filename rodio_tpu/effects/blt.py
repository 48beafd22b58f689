"""Biquad (BLT) filters — low/high pass.

TPU-native rebuild of src/source/blt.rs: the per-sample direct-form-I loop
with per-channel history becomes a lanes-by-time recurrence
(:func:`rodio_tpu.ops.scan.biquad_df1`), sequential-exact by default and
O(log T) associative-scan parallel on demand.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State, mask_block
from ..core.types import float_dtype
from ..ops.scan import biquad_df1
from ..refimpl.effects import blt_coefficients


class BltFilter(Node):
    """Low-pass / high-pass biquad (Audio-EQ-Cookbook), per-channel state.

    Coefficient synthesis matches src/source/blt.rs:502-545 in f32.
    """

    def __init__(self, input_node: Node, kind: str, freq: float, q: float = 0.5,
                 *, mode: str = "auto"):
        """mode="auto" uses the (bit-identical) fused Pallas kernel on TPU
        and the sequential scan elsewhere."""
        self.input = input_node
        self.spec = input_node.spec
        self.kind = kind
        self.freq = float(freq)
        self.q = float(q)
        self.mode = mode
        ap = blt_coefficients(kind, self.spec.sample_rate, freq, q)
        self.coeffs = (
            float(ap.b0), float(ap.b1), float(ap.b2), float(ap.a1), float(ap.a2)
        )

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        c = self.spec.channels
        dt = float_dtype()
        z = jnp.zeros((c,), dtype=dt)
        return {"in": self.input.init_state(),
                "x1": z, "x2": z, "y1": z, "y2": z}

    def emit(self, state: State, n: int):
        import jax

        s, x, valid = self.input.emit(state["in"], n)
        st = (state["x1"], state["x2"], state["y1"], state["y2"])
        mode = self.mode
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "exact"
        if mode == "pallas":
            from ..ops.pallas_scan import biquad_df1_pallas

            interpret = jax.default_backend() != "tpu"
            y, (x1, x2, y1, y2) = biquad_df1_pallas(
                x, self.coeffs, st, interpret=interpret
            )
        else:
            y, (x1, x2, y1, y2) = biquad_df1(
                x, self.coeffs, st, mode=mode
            )
        y = mask_block(y, valid)
        return (
            {"in": s, "x1": x1, "x2": x2, "y1": y1, "y2": y2},
            y,
            valid,
        )
