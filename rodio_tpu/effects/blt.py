"""Biquad (BLT) filters — low/high pass.

TPU-native rebuild of src/source/blt.rs: the per-sample direct-form-I loop
with per-channel history becomes a lanes-by-time recurrence
(:func:`rodio_tpu.ops.scan.biquad_df1`), sequential-exact by default and
O(log T) associative-scan parallel on demand.

The coefficients live in the STATE, so the reference's runtime retune
surface (``to_low_pass`` / ``to_high_pass`` / ``*_with_q``,
src/source/blt.rs:68-91) is a pure state update: the new response takes
effect at the next block with the filter history carried over and ZERO
recompiles (every kernel reads the coefficient vector as data).
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
                "coef": jnp.asarray(self.coeffs, dtype=dt),
                "x1": z, "x2": z, "y1": z, "y2": z}

    def retune(self, state: State, kind: Optional[str] = None,
               freq: Optional[float] = None,
               q: Optional[float] = None) -> State:
        """Live retune (src/source/blt.rs:68-91 ``to_low_pass`` /
        ``to_high_pass`` / ``*_with_q``): synthesize new coefficients in
        f32 (same arithmetic as the reference) and swap them into the
        state. Filter history (x1/x2/y1/y2) is preserved, exactly as the
        reference keeps its ``x_n1..y_n2`` across ``set_to``; no
        recompilation happens because every mode reads the coefficients
        as traced data."""
        kind = kind or self.kind
        freq = self.freq if freq is None else float(freq)
        q = self.q if q is None else float(q)
        ap = blt_coefficients(kind, self.spec.sample_rate, freq, q)
        coef = jnp.asarray(
            [ap.b0, ap.b1, ap.b2, ap.a1, ap.a2], dtype=float_dtype()
        )
        return {**state, "coef": coef}

    def emit(self, state: State, n: int):
        import jax

        s, x, valid = self.input.emit(state["in"], n)
        st = (state["x1"], state["x2"], state["y1"], state["y2"])
        coef = state["coef"]
        coeffs = tuple(coef[i] for i in range(5))
        mode = self.mode
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "exact"
        if mode == "pallas":
            from ..ops.pallas_scan import biquad_df1_pallas

            interpret = jax.default_backend() != "tpu"
            y, (x1, x2, y1, y2) = biquad_df1_pallas(
                x, coeffs, st, interpret=interpret
            )
        else:
            y, (x1, x2, y1, y2) = biquad_df1(
                x, coeffs, st, mode=mode
            )
        y = mask_block(y, valid)
        return (
            {"in": s, "coef": coef, "x1": x1, "x2": x2, "y1": y1, "y2": y2},
            y,
            valid,
        )
