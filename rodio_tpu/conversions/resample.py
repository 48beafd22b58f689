"""Rational linear-interpolation resampler — block engine.

TPU-native rebuild of src/conversions/sample_rate.rs. The reference pulls one
interleaved sample at a time through chunk-phase bookkeeping; the block
engine computes the SAME sample positions closed-form and gathers:

For reduced ratio from/to, output frame o (within chunk c = o // to,
phase j = o % to) interpolates input frames

    left  = c*from + (from*j) // to
    right = left + 1
    frac  = ((from*j) % to) / to        (src/conversions/sample_rate.rs:158,173)

End-of-stream reproduces the reference's drain rule
(src/conversions/sample_rate.rs:192-200): after the last full lerp, if the
first not-fully-computable output lands exactly on the final input frame, it
is emitted once, unmodified.

Input arrives through a ring buffer with conditional fixed-size pulls, so
the whole emit is a single static-shape XLA computation: upstream is pulled
``P = ceil(n*from/to) + 3`` frames at most once per emit, committed only
when the ring actually runs low (a select under vmap).

``segment_frames`` reproduces the reference's span re-bootstrap: the
UniformSourceIterator caps spans at 32768 interleaved samples
(src/source/uniform.rs:56), so finite sources resample in independent
segments, each with its own chunk phase and drain frame. Pass
``segment_frames=32768 // channels`` for bit-faithful parity with rodio on
long buffers; the default (None) resamples the whole stream continuously
(higher fidelity).
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


def _resample_counts(n_in: int, from_: int, to: int):
    """(n_full_lerps, has_drain) the reference emits for n_in input frames."""
    if n_in == 0:
        return 0, False

    # closed form: left(o) = (o // to) * from_ + (from_ * (o % to)) // to,
    # nondecreasing in o; binary search the first o with left(o) > n_in - 2
    def left(o):
        c, j = divmod(o, to)
        return c * from_ + (from_ * j) // to

    lo, hi = 0, (n_in * to) // from_ + to + 2
    while lo < hi:
        mid = (lo + hi) // 2
        if left(mid) <= n_in - 2:
            lo = mid + 1
        else:
            hi = mid
    return lo, left(lo) == n_in - 1


def resample_output_frames(n_in: int, from_: int, to: int) -> int:
    """Number of output frames the reference emits for n_in input frames
    (full lerps + the drain frame)."""
    if from_ == to:
        return n_in
    n_full, drain = _resample_counts(n_in, from_, to)
    return n_full + (1 if drain else 0)


class Resample(Node):
    def __init__(self, input_node: Node, to_rate: int,
                 *, segment_frames: Optional[int] = None,
                 max_block: int = 8192):
        self.input = input_node
        from_rate = input_node.spec.sample_rate
        self.spec = StreamSpec(input_node.spec.channels, to_rate)
        g = math.gcd(from_rate, to_rate)
        self.from_ = from_rate // g
        self.to = to_rate // g
        self.identity = self.from_ == self.to
        self.max_block = max_block
        self.segment_frames = segment_frames
        if segment_frames is not None:
            if self.identity:
                self.segment_frames = None
            else:
                n_full, drain = _resample_counts(
                    segment_frames, self.from_, self.to
                )
                self._seg_out = n_full + (1 if drain else 0)
                self._seg_drain = drain
        # pull size per emit (static)
        self.P = -(-max_block * self.from_ // self.to) + 3
        self.R = 2 * self.P

    def total_frames(self) -> Optional[int]:
        n_in = self.input.total_frames()
        if n_in is None:
            return None
        if self.identity:
            return n_in
        L = self.segment_frames
        if L is None:
            return resample_output_frames(n_in, self.from_, self.to)
        full, rem = divmod(n_in, L)
        return full * self._seg_out + resample_output_frames(
            rem, self.from_, self.to
        )

    def init_state(self) -> State:
        if self.identity:
            return {"in": self.input.init_state()}
        c = self.spec.channels
        return {
            "in": self.input.init_state(),
            "ring": jnp.zeros((c, self.R), dtype=float_dtype()),
            "base_g": jnp.zeros((), dtype=jnp.int32),
            "fill": jnp.zeros((), dtype=jnp.int32),
            "out_o": jnp.zeros((), dtype=jnp.int32),
            "in_pulled": jnp.zeros((), dtype=jnp.int32),
            "in_end": jnp.asarray(_BIG),
            "drained": jnp.asarray(False),
        }

    # -- closed-form index math (all int32, traced) --
    def _left_num(self, o):
        """(left_global_input_frame, lerp_numerator, is_seg_drain) for output
        frame index o (global)."""
        fr, to = self.from_, self.to
        L = self.segment_frames
        if L is None:
            c = o // to
            j = o % to
            left = c * fr + (fr * j) // to
            num = (fr * j) % to
            return left, num, jnp.zeros_like(o, dtype=bool)
        seg = o // self._seg_out
        ol = o % self._seg_out
        c = ol // to
        j = ol % to
        left_local = c * fr + (fr * j) // to
        num = (fr * j) % to
        if self._seg_drain:
            is_drain = ol == self._seg_out - 1
            left_local = jnp.where(is_drain, L - 1, left_local)
            num = jnp.where(is_drain, 0, num)
        else:
            is_drain = jnp.zeros_like(o, dtype=bool)
        return seg * L + left_local, num, is_drain

    def emit(self, state: State, n: int):
        if self.identity:
            s, block, valid = self.input.emit(state["in"], n)
            return {"in": s}, block, valid
        assert n <= self.max_block, (
            f"Resample block {n} exceeds max_block={self.max_block}"
        )
        dt = float_dtype()
        c = self.spec.channels
        fr, to = self.from_, self.to
        o = state["out_o"] + jnp.arange(n, dtype=jnp.int32)
        left_g, num, seg_drain = self._left_num(o)
        first_left = left_g[0]
        last_needed = left_g[-1] + 1

        # roll the ring so slot 0 = first_left
        shift = first_left - state["base_g"]
        ring = jnp.roll(state["ring"], -shift, axis=1)
        fill = jnp.maximum(state["fill"] - shift, 0)
        base_g = first_left

        # conditional pull of P frames (committed only when needed)
        need = (last_needed + 1 - base_g) > fill
        not_ended = state["in_end"] == _BIG
        do_pull = need & not_ended
        in_state2, xblk, v_in = self.input.emit(state["in"], self.P)
        in_state_new = _tree_select(do_pull, in_state2, state["in"])
        pos = jnp.where(do_pull, fill + jnp.arange(self.P, dtype=jnp.int32),
                        self.R + 1)
        ring = ring.at[:, pos].set(xblk, mode="drop")
        in_pulled = jnp.where(do_pull, state["in_pulled"] + self.P,
                              state["in_pulled"])
        ended_now = do_pull & (v_in < self.P)
        in_end = jnp.where(
            ended_now & not_ended, state["in_pulled"] + v_in, state["in_end"]
        )
        fill = jnp.where(do_pull, fill + self.P, fill)

        # gather + lerp
        idx = left_g - base_g
        gather = lambda i: jnp.take(ring, i, axis=1, mode="fill", fill_value=0)
        lval = gather(idx)
        rval = gather(idx + 1)
        frac = num.astype(dt) / dt(to)
        out = lval + (rval - lval) * frac[None, :]

        # validity: full lerps need right frame; drain emits the last frame
        full = (left_g <= in_end - 2) | seg_drain & (left_g <= in_end - 1)
        n_full = jnp.sum(full.astype(jnp.int32))
        cand_left = jnp.take(left_g, n_full, mode="clip")
        drain_ok = (n_full < n) & (cand_left == in_end - 1)
        valid = jnp.where(
            state["drained"], 0, n_full + drain_ok.astype(jnp.int32)
        )
        # drain output = left frame unmodified
        i_idx = jnp.arange(n, dtype=jnp.int32)
        out = jnp.where(
            (i_idx == n_full) & drain_ok, lval, out
        )
        out = jnp.where(i_idx[None, :] < valid, out, 0.0)

        drained_new = state["drained"] | drain_ok | (valid < n)

        return (
            {
                "in": in_state_new,
                "ring": ring,
                "base_g": base_g,
                "fill": fill,
                "out_o": state["out_o"] + n,
                "in_pulled": in_pulled,
                "in_end": in_end,
                "drained": drained_new,
            },
            out.astype(dt),
            clip_valid(valid, n),
        )
