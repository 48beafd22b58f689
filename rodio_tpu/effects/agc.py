"""Automatic Gain Control.

TPU-native rebuild of src/source/agc.rs. The reference's per-sample loop has
one shared state across channels (interleaved samples feed a single peak
detector + one 8192-sample RMS window + one smoothed gain). Block-engine
decomposition over the interleaved sequence (column-major flatten of the
[C, T] block):

1. peak detector — instant attack / slow release
   (src/source/agc.rs:397-407). Exactly ``p' = max(x, r*p + (1-r)*x)``
   (the convex combination is below x whenever x > p), i.e. a MAX-AFFINE
   recurrence -> parallel scan.
2. RMS window — running sum over a circular 8192 buffer
   (src/source/agc.rs:133-171). The window state is carried; within a block
   the sum evolves as sum += sq[i] - sq[i-8192], a prefix sum.
3. desired gain — elementwise from rms/peak (src/source/agc.rs:450-460).
4. gain smoothing — asymmetric attack/release + clamp
   (src/source/agc.rs:486-496). Data-dependent branch -> stays a tiny
   sequential scan (5 flops/step) in every mode.

In exact mode steps 1-2 also run sequentially with the reference's exact
operation order (sum = (sum - old) + new), giving 1e-6-class parity; in
parallel mode they use prefix scans (deviation ~1e-5 from f32 reordering).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import duration_to_coefficient
from ..core.node import Node, State, mask_block
from ..core.types import duration_to_nanos, float_dtype

RMS_WINDOW_SIZE = 8192


@dataclasses.dataclass(frozen=True)
class AgcSettings:
    """(src/source/agc.rs:57-82); durations in seconds."""

    target_level: float = 1.0
    attack_time: float = 4.0
    release_time: float = 0.0
    absolute_max_gain: float = 7.0


class AutomaticGainControl(Node):
    def __init__(self, input_node: Node, settings: AgcSettings = None,
                 *, mode: str = "exact"):
        settings = settings or AgcSettings()
        self.input = input_node
        self.spec = input_node.spec
        self.settings = settings
        self.mode = mode
        rate = self.spec.sample_rate
        # times clamped to 10 s (src/source/mod.rs:432-433)
        attack_ns = min(duration_to_nanos(settings.attack_time), 10_000_000_000)
        release_ns = min(duration_to_nanos(settings.release_time), 10_000_000_000)
        self.attack_coeff = float(duration_to_coefficient(0, rate, nanos=attack_ns))
        self.release_coeff = float(duration_to_coefficient(0, rate, nanos=release_ns))
        self.target_level = float(np.float32(settings.target_level))
        self.absolute_max_gain = float(np.float32(settings.absolute_max_gain))
        self.floor = 0.0
        self.enabled = True

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        dt = float_dtype()
        return {
            "in": self.input.init_state(),
            "peak": jnp.zeros((), dtype=dt),
            "gain": jnp.ones((), dtype=dt),
            "rms_sum": jnp.zeros((), dtype=dt),
            "window": jnp.zeros((RMS_WINDOW_SIZE,), dtype=dt),
            "widx": jnp.zeros((), dtype=jnp.int32),
        }

    def emit(self, state: State, n: int):
        s, x, valid = self.input.emit(state["in"], n)
        if not self.enabled:
            return {**state, "in": s}, x, valid

        dt = float_dtype()
        c, t = x.shape
        m = c * t
        # interleaved order = column-major flatten of [C, T]
        xs = jnp.abs(x.T.reshape(m))
        sq = xs * xs

        rel = dt(self.release_coeff)
        att = dt(self.attack_coeff)
        target = dt(self.target_level)
        max_gain = dt(self.absolute_max_gain)
        floor = dt(self.floor)

        # --- old window values leaving the ring at each step ---
        widx = state["widx"]
        if m >= RMS_WINDOW_SIZE:
            ring_old = jnp.take(
                state["window"],
                (widx + jnp.arange(RMS_WINDOW_SIZE, dtype=jnp.int32))
                % RMS_WINDOW_SIZE,
            )
            old = jnp.concatenate([ring_old, sq[: m - RMS_WINDOW_SIZE]])
        else:
            ring_old = jnp.take(
                state["window"],
                (widx + jnp.arange(m, dtype=jnp.int32)) % RMS_WINDOW_SIZE,
            )
            old = ring_old

        if self.mode == "exact":
            # op-order identical to the reference: per step,
            # peak update then sum = (sum - old) + new
            def step(carry, inp):
                peak, rms_sum = carry
                xv, sqv, oldv = inp
                coeff = jnp.where(xv > peak, dt(0.0), rel)
                peak = peak * coeff + xv * (1.0 - coeff)
                rms_sum = (rms_sum - oldv) + sqv
                return (peak, rms_sum), (peak, rms_sum)

            (_, _), (peak_seq, sum_seq) = jax.lax.scan(
                step, (state["peak"], state["rms_sum"]), (xs, sq, old)
            )
        else:
            from ..ops.scan import max_affine_scan

            peak_seq = max_affine_scan(
                xs, (1.0 - rel) * xs, jnp.full_like(xs, rel), state["peak"],
                mode="parallel",
            )
            sum_seq = state["rms_sum"] + jnp.cumsum(sq - old)

        rms = jnp.sqrt(sum_seq / dt(RMS_WINDOW_SIZE))
        rms_gain = jnp.where(rms > 0.0, target / rms, max_gain)
        peak_gain = jnp.where(
            peak_seq > 0.0, jnp.minimum(target / peak_seq, max_gain), max_gain
        )
        desired = jnp.maximum(jnp.minimum(rms_gain, peak_gain), floor)

        # --- sequential gain smoothing (data-dependent branch + clamp) ---
        def gain_step(g, d):
            speed = jnp.where(d > g, att, rel)
            g = g * speed + d * (1.0 - speed)
            g = jnp.clip(g, dt(0.1), max_gain)
            return g, g

        _, gain_seq = jax.lax.scan(gain_step, state["gain"], desired)

        y = (x.T.reshape(m) * gain_seq).reshape(t, c).T
        y = mask_block(y, valid)

        # --- update ring window state ---
        if m >= RMS_WINDOW_SIZE:
            new_window = sq[m - RMS_WINDOW_SIZE :]
            # ring is stored rotated so that widx' = (widx + m) % SIZE maps
            # slot k to the value that entered (SIZE - k) steps before end
            widx_new = (widx + m) % RMS_WINDOW_SIZE
            # place new_window so that logical order is preserved:
            # window[(widx_new + j) % S] = new_window[j]... we instead store
            # by scattering at positions (widx + i) % S for each new value i
            pos = (widx + jnp.arange(m - RMS_WINDOW_SIZE, m, dtype=jnp.int32)) % RMS_WINDOW_SIZE
            window_new = state["window"].at[pos].set(new_window)
        else:
            pos = (widx + jnp.arange(m, dtype=jnp.int32)) % RMS_WINDOW_SIZE
            window_new = state["window"].at[pos].set(sq)
            widx_new = (widx + m) % RMS_WINDOW_SIZE

        return (
            {
                "in": s,
                "peak": peak_seq[-1],
                "gain": gain_seq[-1],
                "rms_sum": sum_seq[-1],
                "window": window_new,
                "widx": widx_new,
            },
            y,
            valid,
        )
