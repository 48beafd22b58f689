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

import jax
import jax.numpy as jnp
import numpy as np

from .types import float_dtype, nanos_to_secs_f32

#: log2(10) at f32 precision, matching the reference's ``LOG2_10`` constant.
LOG2_10 = 3.321928094887362
#: log10(2) at f32 precision.
LOG10_2 = 0.30102999566398120

# ---------------------------------------------------------------------------
# Precise f32 exp2/log2.
#
# XLA:TPU lowers jnp.exp2/jnp.log2 to fast hardware approximations that are
# tens of ulp off a correctly-rounded f32 result (measured: exp2 ~84 ulp
# relative, log2 ~1.5e-4 absolute near 1.5 on a v5e). The reference's dB
# conversions (src/math.rs:52-90) use the platform libm (<=1 ulp), so the
# limiter's per-sample gain path would deviate ~7e-5 from the rodio render
# if we used the native ops. These implementations use exact range
# reduction + f32 Horner polynomials and land within ~2 ulp of correctly
# rounded, restoring <=1e-6 parity. They are pure jnp elementwise ops and
# run unchanged inside Pallas kernels (VPU) and on CPU.
# ---------------------------------------------------------------------------

# Taylor coefficients of 2^r = sum (r ln2)^n / n!  (degree 7 keeps the
# truncation error ~2.6e-9 on |r| <= 0.5, far below f32 rounding).
_EXP2_C = tuple(
    float(np.float64(np.log(2.0)) ** n / _pymath.factorial(n))
    for n in range(8)
)
# log2(m) = s*(K0 + K1 z + K2 z^2 + K3 z^3 + K4 z^4), s = (m-1)/(m+1),
# z = s^2 (atanh series with 2/ln2 folded in); |s| <= 0.1716 on the
# reduced range m in [1/sqrt(2), sqrt(2)).
_LOG2_K = tuple(float(2.0 / ((2 * n + 1) * np.log(2.0))) for n in range(5))
_SQRT2 = 1.4142135623730951


def exp2_precise(x):
    """f32 2^x within ~2 ulp (jnp face; see module note)."""
    dt = x.dtype
    k = jnp.rint(x)
    r = x - k  # exact: |r| <= 0.5 and x, k within a factor of 2 (Sterbenz)
    c = _EXP2_C
    p = c[7]
    for i in range(6, -1, -1):
        p = p * r + dt.type(c[i])
    # scale by 2^k via exponent-field assembly, split in two so gradual
    # underflow/overflow at the f32 limits behaves (k clamped well past
    # the finite range: 2^-151 underflows to 0, 2^128 overflows to inf)
    ki = jnp.clip(k, -300.0, 300.0).astype(jnp.int32)
    k1 = ki // 2
    k2 = ki - k1
    def pow2i(e):
        e = jnp.clip(e, -126, 127)
        return jax.lax.bitcast_convert_type(
            (e + 127) << 23, jnp.float32
        ).astype(dt)
    return p * pow2i(k1) * pow2i(k2)


def log2_precise(x):
    """f32 log2(x) within ~2 ulp for normal x > 0; -inf at x <= 0 and
    denormals flushed to 2^-126 (jnp face; see module note)."""
    dt = x.dtype
    tiny = dt.type(np.float32(np.finfo(np.float32).tiny))
    xs = jnp.maximum(x, tiny)
    bits = jax.lax.bitcast_convert_type(xs.astype(jnp.float32), jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32
    ).astype(dt)
    # renormalize m into [1/sqrt(2), sqrt(2)) so |log2(m)| <= 0.5
    big = m >= dt.type(_SQRT2)
    m = jnp.where(big, m * 0.5, m)
    e = e + big.astype(jnp.int32)
    s = (m - 1.0) / (m + 1.0)
    z = s * s
    K = _LOG2_K
    p = dt.type(K[4])
    for i in range(3, -1, -1):
        p = p * z + dt.type(K[i])
    res = e.astype(dt) + s * p
    return jnp.where(x > 0, res, -jnp.inf)


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
        return exp2_precise(decibels * (0.05 * LOG2_10))
    dt = float_dtype()
    return dt(2.0) ** dt(dt(decibels) * dt(dt(0.05) * dt(LOG2_10)))


def linear_to_db(linear):
    """Linear amplitude -> dB via log2(x)*log10(2)*20 (src/math.rs:87-90)."""
    if hasattr(linear, "aval") or isinstance(linear, jnp.ndarray):
        return log2_precise(linear) * (LOG10_2 * 20.0)
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
