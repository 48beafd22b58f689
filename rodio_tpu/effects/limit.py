"""Feedforward peak limiter (Giannoulis et al. 2012).

TPU-native rebuild of src/source/limit.rs. The reference's per-sample
envelope loop decomposes into:

1. soft-knee gain computer in dB — pure elementwise (parallel),
2. per-channel integrator ``integ = max(db, rel*integ + (1-rel)*db)``
   (src/source/limit.rs:909-912) — a MAX-AFFINE recurrence,
3. per-channel peak ``peak = att*peak + (1-att)*integ``
   (src/source/limit.rs:913) — a LINEAR recurrence,
4. coupled gain ``x * db_to_linear(-max_c peak_c)``
   (src/source/limit.rs:946-988) — elementwise with a channel reduction.

Both recurrences map onto :mod:`rodio_tpu.ops.scan`; everything else is
parallel, so the limiter runs at O(log T) depth in parallel mode.

The reference processes interleaved samples, so at frame t channel c's gain
sees fresh peaks for channels <= c and the PREVIOUS frame's peaks for
channels > c; this one-sample staleness is reproduced exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import db_to_linear, linear_to_db
from ..core.node import Node, State, mask_block
from ..core.types import float_dtype
from ..ops.scan import linear_scan, max_affine_scan
from ..refimpl.effects import TINY


@dataclasses.dataclass(frozen=True)
class LimitSettings:
    """(src/source/limit.rs:209-245); durations in seconds."""

    threshold: float = -1.0
    knee_width: float = 4.0
    attack: float = 0.005
    release: float = 0.100

    @classmethod
    def default(cls):
        return cls()

    @classmethod
    def dynamic_content(cls):
        return cls(threshold=-3.0, knee_width=6.0)

    @classmethod
    def broadcast(cls):
        return cls(knee_width=2.0, attack=0.003, release=0.050)

    @classmethod
    def mastering(cls):
        return cls(threshold=-0.5, knee_width=1.0, attack=0.001, release=0.200)

    @classmethod
    def live_performance(cls):
        return cls(threshold=-2.0, knee_width=3.0, attack=0.0005, release=0.030)

    @classmethod
    def gaming(cls):
        return cls(threshold=-3.0, knee_width=3.0, attack=0.002, release=0.075)

    def with_threshold(self, v):
        return dataclasses.replace(self, threshold=v)

    def with_knee_width(self, v):
        return dataclasses.replace(self, knee_width=v)

    def with_attack(self, v):
        return dataclasses.replace(self, attack=v)

    def with_release(self, v):
        return dataclasses.replace(self, release=v)


def limiter_gain_db(x, threshold: float, knee_width: float, inv_knee_8: float):
    """Soft-knee gain computer (src/source/limit.rs:854-873), elementwise."""
    bias_db = linear_to_db(jnp.abs(x) + TINY) - threshold
    knee_boundary_db = bias_db * 2.0
    xk = knee_boundary_db + knee_width
    quad = xk * xk * inv_knee_8
    return jnp.where(
        knee_boundary_db < -knee_width,
        0.0,
        jnp.where(jnp.abs(knee_boundary_db) <= knee_width, quad, bias_db),
    )


class Limit(Node):
    """``streams`` > 1 limits S independent groups of channels/S channels
    (the wide-channel batch layout): envelopes per channel, gain coupled
    within each group only."""

    def __init__(self, input_node: Node, settings: LimitSettings = None,
                 *, mode: str = "auto", streams: int = 1):
        from ..core.math import duration_to_coefficient
        from ..core.types import duration_to_nanos

        settings = settings or LimitSettings()
        self.input = input_node
        self.spec = input_node.spec
        self.settings = settings
        self.mode = mode
        if input_node.spec.channels % streams:
            raise ValueError("channels not divisible by stream count")
        self.streams = streams
        rate = self.spec.sample_rate
        self.attack = float(duration_to_coefficient(
            0, rate, nanos=duration_to_nanos(settings.attack)))
        self.release = float(duration_to_coefficient(
            0, rate, nanos=duration_to_nanos(settings.release)))
        self.threshold = float(np.float32(settings.threshold))
        self.knee_width = float(np.float32(settings.knee_width))
        self.inv_knee_8 = float(
            np.float32(1.0) / (np.float32(8.0) * np.float32(settings.knee_width))
        )

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        c = self.spec.channels
        z = jnp.zeros((c,), dtype=float_dtype())
        return {"in": self.input.init_state(), "integ": z, "peak": z}

    def emit(self, state: State, n: int):
        s, x, valid = self.input.emit(state["in"], n)
        dt = float_dtype()
        rel = dt(self.release)
        att = dt(self.attack)

        mode0 = self.mode
        if mode0 == "auto":
            mode0 = "pallas" if jax.default_backend() == "tpu" else "exact"
        if (
            mode0 == "pallas"
            and self.streams == 1
            and self.spec.channels == 2
        ):
            # largest power-of-two chunk count dividing the block: the
            # blocked kernel runs the WHOLE limiter in one dispatch with
            # sequential depth n/P + log2(P) instead of n
            P = min(128, n & -n)
            if P >= 8:
                from ..ops.limiter_block import limiter_master_pallas

                y, (integ_c, peak_c) = limiter_master_pallas(
                    x, state["integ"], state["peak"],
                    att=self.attack, rel=self.release,
                    threshold=self.threshold, knee_width=self.knee_width,
                    inv_knee_8=self.inv_knee_8, P=P,
                    interpret=jax.default_backend() != "tpu",
                )
                y = mask_block(y, valid)
                return (
                    {"in": s, "integ": integ_c, "peak": peak_c}, y, valid
                )

        db = limiter_gain_db(
            x, dt(self.threshold), dt(self.knee_width), dt(self.inv_knee_8)
        )  # [C, T]
        mode = self.mode
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "exact"
        if mode == "pallas":
            from ..ops.pallas_scan import limiter_env_pallas

            interp = jax.default_backend() != "tpu"
            peak, (integ_carry, peak_carry) = limiter_env_pallas(
                db, state["integ"], state["peak"],
                att=self.attack, rel=self.release, interpret=interp,
            )
        else:
            integ = max_affine_scan(
                db, (1.0 - rel) * db, jnp.full_like(db, rel), state["integ"],
                mode=mode,
            )
            peak = linear_scan(
                jnp.full_like(integ, att), (1.0 - att) * integ, state["peak"],
                mode=mode,
            )  # [C, T]

        c = self.spec.channels
        cg = c // self.streams
        if cg == 1:
            max_peak = peak  # per-channel groups: no coupling
        else:
            # within each group: fresh peaks for channels <= c, previous-
            # frame peaks for channels > c (the interleaved-order staleness)
            peak_prev = jnp.concatenate(
                [state["peak"][:, None], peak[:, :-1]], axis=1
            )
            pg = peak.reshape(self.streams, cg, n)
            sg = peak_prev.reshape(self.streams, cg, n)
            fresh_cummax = jax.lax.cummax(pg, axis=1)
            stale_rev = jnp.flip(sg, axis=1)
            stale_sufmax = jnp.flip(jax.lax.cummax(stale_rev, axis=1), axis=1)
            stale_above = jnp.concatenate(
                [stale_sufmax[:, 1:],
                 jnp.full((self.streams, 1, n), -jnp.inf, dtype=dt)],
                axis=1,
            )
            max_peak = jnp.maximum(fresh_cummax, stale_above).reshape(c, n)

        y = x * db_to_linear(-max_peak)
        y = mask_block(y, valid)
        if mode == "pallas":
            new_integ, new_peak = integ_carry, peak_carry
        else:
            new_integ, new_peak = integ[:, -1], peak[:, -1]
        return (
            {"in": s, "integ": new_integ, "peak": new_peak},
            y,
            valid,
        )
