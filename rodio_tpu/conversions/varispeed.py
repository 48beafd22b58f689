"""Live variable-rate playback — the runtime-knob counterpart of Resample.

The reference's ``Speed`` factor is a free runtime value
(src/source/speed.rs:56-65): call ``set_factor`` and the next sample
plays at the new rate. The static block engine (conversions/resample.py)
bakes its rational ratio into closed-form index math and an MXU operator
— changing it means recompiling. This node makes the ratio a TRACED
STATE FIELD instead: ``set_ratio`` is a pure state update that takes
effect at the next block with ZERO recompiles.

Design: consume ``ratio`` input frames per output frame by linear
interpolation over a ring buffer (the reference's two-point lerp,
src/conversions/sample_rate.rs:158-173, with a continuous phase instead
of the rational chunk phase):

- per-output positions  p_i = frac + ratio * i  (block-local, f32 —
  the integer part of the global position is carried separately so the
  per-block phase error stays at ~1 ulp of 1.0, i.e. ~1e-7 frames);
- a single conditional fixed-size pull per emit keeps the whole emit a
  static-shape XLA computation (same pattern as Resample's ring path);
- the ring shift by a traced amount uses concat + dynamic_slice (a
  dense copy — `jnp.roll` with a traced shift lowers to a TPU gather).

At ratio exactly 1.0 the lerp fraction is identically zero and the node
is bit-transparent.

NOTE on the lerp gathers: the two `jnp.take` reads per block are a
DOCUMENTED exception to the no-gathers-on-hot-paths convention
(CLAUDE.md) — arbitrary runtime ratios have no closed-form chunk
structure for the matmul-resampler pattern, and this node serves the
per-sound live-control path (a few [C, n<=few-thousand] gathers per
block), not the 512-wide farm hot path (which uses the static-ratio
MXU resampler).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State, clip_valid
from ..core.types import StreamSpec, float_dtype

_BIG = np.int32(2**31 - 1)


def _tree_select(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


class VariSpeed(Node):
    """Playback-rate changer with a live (traced) ratio.

    ``ratio`` > 1 speeds playback up (and raises pitch), < 1 slows it —
    the audible behavior of the reference's Speed + uniform-resample
    composition, collapsed into one runtime-controllable stage. The
    output sample rate equals the input rate.

    ``max_ratio`` bounds the per-block input demand (the static pull
    size); ``set_ratio`` clips into [1/max_ratio... max_ratio] — actually
    any ratio in (0, max_ratio] is valid (slowdowns need less input).
    """

    def __init__(self, input_node: Node, ratio: float = 1.0,
                 *, max_ratio: float = 4.0, max_block: int = 8192):
        self.input = input_node
        self.spec = StreamSpec(
            input_node.spec.channels, input_node.spec.sample_rate
        )
        self.ratio0 = float(ratio)
        self.max_ratio = float(max_ratio)
        assert 0.0 < ratio <= max_ratio
        self.max_block = int(max_block)
        #: static pull size: covers one block's worst-case demand
        self.P = int(math.ceil(max_block * max_ratio)) + 4
        self.R = 2 * self.P

    def total_frames(self) -> Optional[int]:
        return None  # duration depends on the (runtime) ratio history

    def init_state(self) -> State:
        c = self.spec.channels
        dt = float_dtype()
        return {
            "in": self.input.init_state(),
            "ring": jnp.zeros((c, self.R), dtype=dt),
            "fill": jnp.zeros((), dtype=jnp.int32),
            "frac": jnp.zeros((), dtype=dt),   # position within slot 0
            "ratio": jnp.asarray(self.ratio0, dtype=dt),
            "in_pulled": jnp.zeros((), dtype=jnp.int32),
            "in_end": jnp.asarray(_BIG),
            "drained": jnp.asarray(False),
        }

    def set_ratio(self, state: State, ratio) -> State:
        """Live varispeed (speed.rs:56-65 ``set_factor``): pure state
        update, applies from the next block, zero recompiles."""
        r = jnp.clip(
            jnp.asarray(ratio, dtype=float_dtype()), 1e-3, self.max_ratio
        )
        return {**state, "ratio": r}

    def emit(self, state: State, n: int):
        assert n <= self.max_block, (
            f"VariSpeed block {n} exceeds max_block={self.max_block}"
        )
        dt = float_dtype()
        c = self.spec.channels
        ratio = state["ratio"]
        frac = state["frac"]
        # pull size scales with THIS block (n is static per trace): a
        # small player block must not pay the max_block worst case in
        # upstream work every emit
        P = min(self.P, int(math.ceil(n * self.max_ratio)) + 4)

        # conditional pull (static size, committed only when needed)
        i_idx = jnp.arange(n, dtype=jnp.int32)
        p = frac + ratio * i_idx.astype(dt)          # block-local positions
        left = jnp.floor(p).astype(jnp.int32)
        last_need = left[n - 1] + 1
        not_ended = state["in_end"] == _BIG
        need = (last_need + 1) > state["fill"]
        do_pull = need & not_ended
        in2, xblk, v_in = self.input.emit(state["in"], P)
        in_new = _tree_select(do_pull, in2, state["in"])
        fill = state["fill"]
        pos_w = jnp.where(do_pull, fill + jnp.arange(P, dtype=jnp.int32),
                          self.R + 1)
        ring = state["ring"].at[:, pos_w].set(xblk, mode="drop")
        in_pulled = jnp.where(do_pull, state["in_pulled"] + P,
                              state["in_pulled"])
        ended_now = do_pull & (v_in < P)
        in_end = jnp.where(ended_now & not_ended,
                           state["in_pulled"] + v_in, state["in_end"])
        fill = jnp.where(do_pull, fill + P, fill)

        # two-point lerp (sample_rate.rs:158-173 semantics; frac == 0 is
        # bit-transparent: x + (r - x) * 0 == x)
        lval = jnp.take(ring, left, axis=1, mode="fill", fill_value=0)
        rval = jnp.take(ring, left + 1, axis=1, mode="fill", fill_value=0)
        f = (p - left.astype(dt))[None, :]
        out = lval + (rval - lval) * f

        # validity: a full lerp needs the right-hand frame
        # (global input index of `left` = in_pulled - fill + left)
        base_g = in_pulled - fill
        full = (base_g + left) <= in_end - 2
        valid = jnp.where(state["drained"], 0,
                          jnp.sum(full.astype(jnp.int32)))
        out = jnp.where(i_idx[None, :] < valid, out, 0.0)
        drained = state["drained"] | (valid < n)

        # advance: shift consumed whole frames out of the ring (dense
        # copy via concat + dynamic_slice, never a traced roll/gather)
        total = frac + ratio * dt(n)
        shift = jnp.minimum(jnp.floor(total).astype(jnp.int32), fill)
        frac_new = total - shift.astype(dt)
        ext = jnp.concatenate(
            [ring, jnp.zeros((c, P), dtype=dt)], axis=1
        )
        ring_new = jax.lax.dynamic_slice(
            ext, (jnp.int32(0), shift), (c, self.R)
        )
        return (
            {
                "in": in_new,
                "ring": ring_new,
                "fill": fill - shift,
                "frac": frac_new,
                "ratio": ratio,
                "in_pulled": in_pulled,
                "in_end": in_end,
                "drained": drained,
            },
            out.astype(dt),
            clip_valid(valid, n),
        )
