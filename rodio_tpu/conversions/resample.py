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
        if not self.identity:
            self._build_lerp_matrix()

    def _build_lerp_matrix(self):
        """Constant sparse interpolation operator for the MXU path.

        One chunk of `to` output frames is a linear map of `from_`+1 input
        frames: out[j] = (1-frac_j)*x[left_j] + frac_j*x[left_j+1] with
        left_j = (from_*j)//to, frac_j = ((from_*j) % to)/to. As a matrix:
        out[K, to] = X[K, from_] @ G0 + xnext[K] (x) g1, where xnext is the
        first frame of the NEXT chunk (right neighbor of the chunk's last
        outputs). Resampling then rides the MXU instead of a gather.
        """
        fr, to = self.from_, self.to
        dt = float_dtype()
        G0 = np.zeros((fr, to), dtype=dt)
        g1 = np.zeros((to,), dtype=dt)
        for j in range(to):
            left = (fr * j) // to
            frac = dt(dt(np.int64(fr * j) % to) / dt(to))
            G0[left, j] += dt(1.0) - frac
            if frac != 0:
                if left + 1 < fr:
                    G0[left + 1, j] += frac
                else:
                    g1[j] += frac
        self._G0 = jnp.asarray(G0)
        self._g1 = jnp.asarray(g1)

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
        if getattr(self.input, "RANDOM_ACCESS", False):
            # direct-gather fast path: no ring, no pulls — interpolation
            # reads straight from the upstream's random-access storage
            # (decode -> resample fusion; ~4x less HBM traffic per block)
            return {
                "in": self.input.init_state(),
                "out_o": jnp.zeros((), dtype=jnp.int32),
                "drained": jnp.asarray(False),
            }
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
        if getattr(self.input, "RANDOM_ACCESS", False):
            window = (n // self.to + 2) * self.from_ + 1
            if (
                self.segment_frames is None
                and hasattr(self.input, "slice_frames")
                # the upstream's zero padding guarantees unclamped windows
                and window <= getattr(self.input, "PAD_FRAMES", 0)
            ):
                return self._emit_matmul(state, n)
            return self._emit_random_access(state, n)
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

        # conditional pull (committed only when needed); the pull size
        # scales with THIS block so upstream work tracks actual demand
        P = -(-n * fr // self.to) + 3
        need = (last_needed + 1 - base_g) > fill
        not_ended = state["in_end"] == _BIG
        do_pull = need & not_ended
        in_state2, xblk, v_in = self.input.emit(state["in"], P)
        in_state_new = _tree_select(do_pull, in_state2, state["in"])
        pos = jnp.where(do_pull, fill + jnp.arange(P, dtype=jnp.int32),
                        self.R + 1)
        ring = ring.at[:, pos].set(xblk, mode="drop")
        in_pulled = jnp.where(do_pull, state["in_pulled"] + P,
                              state["in_pulled"])
        ended_now = do_pull & (v_in < P)
        in_end = jnp.where(
            ended_now & not_ended, state["in_pulled"] + v_in, state["in_end"]
        )
        fill = jnp.where(do_pull, fill + P, fill)

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

    def _emit_matmul(self, state: State, n: int):
        """MXU path over a sliceable upstream: chunk-reshaped matmul with
        the constant lerp operator — no gathers anywhere."""
        dt = float_dtype()
        fr, to = self.from_, self.to
        C = self.spec.channels
        K = n // to + 2  # chunks covering any block alignment (static)

        o0 = state["out_o"]
        c0 = o0 // to
        start, in_end = self.input.access_window(state["in"])

        # contiguous input window [C, K*fr + 1] starting at chunk c0
        window = self.input.slice_frames(state["in"], start + c0 * fr,
                                         K * fr + 1)
        X = window[:, : K * fr].reshape(C, K, fr)
        xnext = jnp.concatenate(
            [X[:, 1:, 0], window[:, K * fr : K * fr + 1]], axis=1
        )  # [C, K]: first frame of each following chunk

        Y = (
            # HIGHEST: the default TPU matmul precision truncates f32
            # operands to bf16 products (~4e-4 absolute on unit audio),
            # breaking the 1e-6 parity contract on hardware
            jnp.einsum("ckf,ft->ckt", X, self._G0,
                       preferred_element_type=dt,
                       precision=jax.lax.Precision.HIGHEST)
            + xnext[:, :, None] * self._g1[None, None, :]
        )  # [C, K, to]
        out_full = Y.reshape(C, K * to)
        off = o0 - c0 * to  # in [0, to)
        out = jax.lax.dynamic_slice(
            out_full, (jnp.int32(0), off.astype(jnp.int32)), (C, n)
        )

        # validity + drain (elementwise, no data access)
        o = o0 + jnp.arange(n, dtype=jnp.int32)
        left_g = (o // to) * fr + (fr * (o % to)) // to
        full = left_g <= in_end - 2
        n_full = jnp.sum(full.astype(jnp.int32))
        cand_left = jnp.take(left_g, n_full, mode="clip")
        drain_ok = (n_full < n) & (cand_left == in_end - 1)
        valid = jnp.where(
            state["drained"], 0, n_full + drain_ok.astype(jnp.int32)
        )
        # drain output = the final input frame, unmodified
        last_frame = self.input.slice_frames(
            state["in"], start + jnp.maximum(in_end - 1, 0), 1
        )  # [C, 1]
        i_idx = jnp.arange(n, dtype=jnp.int32)
        out = jnp.where((i_idx == n_full) & drain_ok, last_frame, out)
        out = jnp.where(i_idx[None, :] < valid, out, 0.0)
        drained_new = state["drained"] | drain_ok | (valid < n)
        return (
            {"in": state["in"], "out_o": o0 + n, "drained": drained_new},
            out.astype(dt),
            clip_valid(valid, n),
        )

    def _emit_random_access(self, state: State, n: int):
        """Ring-less path over a random-access upstream: one gather per
        interpolation endpoint, straight from the upstream storage."""
        dt = float_dtype()
        o = state["out_o"] + jnp.arange(n, dtype=jnp.int32)
        left_g, num, seg_drain = self._left_num(o)
        start, in_end = self.input.access_window(state["in"])

        lval = self.input.gather_frames(state["in"], start + left_g)
        rval = self.input.gather_frames(state["in"], start + left_g + 1)
        frac = num.astype(dt) / dt(self.to)
        out = lval + (rval - lval) * frac[None, :]

        full = (left_g <= in_end - 2) | seg_drain & (left_g <= in_end - 1)
        n_full = jnp.sum(full.astype(jnp.int32))
        cand_left = jnp.take(left_g, n_full, mode="clip")
        drain_ok = (n_full < n) & (cand_left == in_end - 1)
        valid = jnp.where(
            state["drained"], 0, n_full + drain_ok.astype(jnp.int32)
        )
        i_idx = jnp.arange(n, dtype=jnp.int32)
        out = jnp.where((i_idx == n_full) & drain_ok, lval, out)
        out = jnp.where(i_idx[None, :] < valid, out, 0.0)
        drained_new = state["drained"] | drain_ok | (valid < n)
        return (
            {"in": state["in"], "out_o": state["out_o"] + n,
             "drained": drained_new},
            out.astype(dt),
            clip_valid(valid, n),
        )
