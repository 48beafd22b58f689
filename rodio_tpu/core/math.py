"""Math utilities for audio processing.

TPU-native rebuild of the reference's math layer (/root/reference/src/math.rs).
Every function has two faces: a NumPy/scalar face used by the host control
plane and the scalar reference engine, and a jnp face used inside jitted
block kernels. Formulas match the reference exactly:

- ``lerp(first, second, num, den)`` = first + (second-first)*num/den
  (src/math.rs:24-26)
- ``db_to_linear(db)`` = 2^(db * 0.05 * log2(10))  (src/math.rs:52-56)
- ``linear_to_db(x)`` = log2(x) * log10(2) * 20    (src/math.rs:87-90)
- ``duration_to_coefficient(dur, rate)`` = e^(-1/(secs * rate))
  (src/math.rs:111-113)
- ``nearest_multiple_of_two`` (src/math.rs:130-141)
"""
from __future__ import annotations

import math as _pymath

import jax.numpy as jnp
import numpy as np

from .types import float_dtype, nanos_to_secs_f32

#: log2(10) at f32 precision, matching the reference's ``LOG2_10`` constant.
LOG2_10 = 3.321928094887362
#: log10(2) at f32 precision.
LOG10_2 = 0.30102999566398120


def lerp(first, second, numerator, denominator):
    """Linear interpolation with integer numerator/denominator.

    Matches the reference resampler's interpolation (src/math.rs:24-26):
    the arithmetic happens in the sample dtype.
    """
    dt = float_dtype()
    if isinstance(first, (jnp.ndarray,)) or hasattr(first, "aval"):
        frac = jnp.asarray(numerator, dt) / jnp.asarray(denominator, dt)
        return first + (second - first) * frac
    first = dt(first)
    second = dt(second)
    return dt(first + (second - first) * (dt(numerator) / dt(denominator)))


def db_to_linear(decibels):
    """dB -> linear amplitude via 2^(db*0.05*log2 10) (src/math.rs:52-56)."""
    if hasattr(decibels, "aval") or isinstance(decibels, jnp.ndarray):
        return jnp.exp2(decibels * (0.05 * LOG2_10))
    dt = float_dtype()
    return dt(2.0) ** dt(dt(decibels) * dt(dt(0.05) * dt(LOG2_10)))


def linear_to_db(linear):
    """Linear amplitude -> dB via log2(x)*log10(2)*20 (src/math.rs:87-90)."""
    if hasattr(linear, "aval") or isinstance(linear, jnp.ndarray):
        return jnp.log2(linear) * (LOG10_2 * 20.0)
    dt = float_dtype()
    with np.errstate(divide="ignore", invalid="ignore"):
        return dt(dt(np.log2(dt(linear))) * dt(LOG10_2) * dt(20.0))


def duration_to_coefficient(duration_secs: float, sample_rate: int,
                            *, nanos: int | None = None):
    """Smoothing coefficient e^(-1/(secs*rate)) (src/math.rs:111-113).

    ``duration_secs`` is float seconds; if ``nanos`` is given the f32
    truncation of Rust's ``Duration::as_secs_f32`` is reproduced exactly.
    """
    dt = float_dtype()
    if nanos is not None:
        secs = dt(nanos_to_secs_f32(nanos))
    else:
        secs = dt(np.float32(duration_secs)) if dt == np.float32 else dt(duration_secs)
    denom = dt(secs * dt(sample_rate))
    with np.errstate(divide="ignore"):
        return dt(np.exp(dt(-1.0) / denom)) if denom != 0 else dt(0.0)


def nearest_multiple_of_two(n: int) -> int:
    """Round to the nearest power of two, preferring the smaller
    (src/math.rs:130-141)."""
    if n <= 1:
        return 1
    nxt = 1 << (n - 1).bit_length()
    prv = nxt >> 1
    return prv if n - prv <= nxt - n else nxt


def amplify_normalized_factor(value: float) -> float:
    """Perceptual volume curve used by ``amplify_normalized``
    (src/source/mod.rs:332-349): exp(6.9077554*v)/1000, linearly tapered
    below v=0.1; input clamped to [0, 1]."""
    dt = float_dtype()
    v = min(max(float(value), 0.0), 1.0)
    amplitude = dt(_pymath.exp(6.907_755_4 * v)) / dt(1000.0)
    if v < 0.1:
        amplitude = dt(amplitude * dt(v * 10.0))
    return dt(amplitude)
