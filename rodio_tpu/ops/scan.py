"""Recurrence scans — the TPU-native core of every stateful effect.

The reference's per-sample hot loops (biquad history, limiter envelopes, AGC
peak/gain smoothing) are all first-order recurrences of two shapes:

- linear:      y_t = a_t * y_{t-1} + b_t
- max-affine:  y_t = max(a_t, b_t + c_t * y_{t-1}),  c_t >= 0

Both are closed under composition, so each has TWO implementations:

- ``mode="exact"``: `lax.scan` over time — same operation ORDER as the
  reference's sequential loop. O(T) depth but vectorized over lanes
  (streams x channels), which is how the 512-stream batch runs at high
  throughput: one time step processes all lanes on the VPU at once.
- ``mode="parallel"``: `lax.associative_scan` — O(log T) depth, fully
  parallel, for low-lane-count (single-stream) graphs. Rounding differs from
  sequential by a few ulp (error decays with the recurrence's own memory).

Numerical note: even in exact mode, XLA contracts mul-adds into FMAs at
instruction selection (measured on CPU; the TPU VPU does the same), so
individual samples can differ from a strict two-rounding evaluation by
1 ulp per step. For contracting recurrences this stays bounded: <= ~1e-6
for typical filters, up to ~1e-5 worst-case for strongly resonant IIR
feedback. Both results are equally valid f32 roundings of the same
real-valued recurrence; parity tests encode these bounds.

The max-affine form covers the limiter's integrator
(src/source/limit.rs:909-912: integ = max(db, r*integ + (1-r)*db)) and the
AGC's peak detector (src/source/agc.rs:397-407: instant attack / slow
release is exactly peak' = max(x, r*peak + (1-r)*x) since the convex
combination is always on the x-side of the max when x > peak).

All functions scan over the LAST axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def linear_scan(a, b, init, *, mode: str = "exact"):
    """y_t = a_t * y_{t-1} + b_t with y_{-1} = init.

    a, b: [..., T]; init: [...]. Returns y: [..., T].
    """
    if mode == "parallel":
        def combine(l, r):
            al, bl = l
            ar, br = r
            return al * ar, ar * bl + br

        A, B = jax.lax.associative_scan(combine, (a, b), axis=-1)
        return A * init[..., None] + B

    def step(carry, ab):
        at, bt = ab
        y = at * carry + bt
        return y, y

    aT = jnp.moveaxis(a, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)
    _, yT = jax.lax.scan(step, init, (aT, bT))
    return jnp.moveaxis(yT, 0, -1)


def max_affine_scan(a, b, c, init, *, mode: str = "exact"):
    """y_t = max(a_t, b_t + c_t * y_{t-1}) with y_{-1} = init, c_t >= 0.

    a, b, c: [..., T]; init: [...]. Returns y: [..., T].
    """
    if mode == "parallel":
        def combine(l, r):
            al, bl, cl = l
            ar, br, cr = r
            return (
                jnp.maximum(ar, br + cr * al),
                br + cr * bl,
                cr * cl,
            )

        A, B, C = jax.lax.associative_scan(combine, (a, b, c), axis=-1)
        return jnp.maximum(A, B + C * init[..., None])

    def step(carry, abc):
        at, bt, ct = abc
        y = jnp.maximum(at, bt + ct * carry)
        return y, y

    aT = jnp.moveaxis(a, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)
    cT = jnp.moveaxis(c, -1, 0)
    _, yT = jax.lax.scan(step, init, (aT, bT, cT))
    return jnp.moveaxis(yT, 0, -1)


def ema_scan(x, coeff, init, *, mode: str = "exact"):
    """Exponential smoothing y_t = coeff*y_{t-1} + (1-coeff)*x_t.

    coeff may be scalar or [..., T]. The b term is computed as
    (1-coeff)*x first, matching the reference's operand order.
    """
    coeff = jnp.broadcast_to(coeff, x.shape)
    return linear_scan(coeff, (1.0 - coeff) * x, init, mode=mode)


@partial(jax.jit, static_argnames=("mode",))
def biquad_df1(x, coeffs, state, *, mode: str = "exact"):
    """Direct-form-I biquad over lanes.

    x: [L, T] lanes-by-time. coeffs: (b0, b1, b2, a1, a2) scalars or [L]
    arrays. state: (x1, x2, y1, y2) each [L]. Returns (y [L, T], state').

    Matches src/source/blt.rs:556-561:
      y = b0*x + b1*x1 + b2*x2 - a1*y1 - a2*y2

    exact mode: sequential scan, op-order identical to the reference.
    parallel mode: the FIR part b0*x+b1*x[-1]+b2*x[-2] is computed as shifted
    adds; the IIR part y_t = u_t - a1*y_{t-1} - a2*y_{t-2} runs as an
    associative scan over 2x2 companion-matrix affine maps.
    """
    b0, b1, b2, a1, a2 = [jnp.asarray(v, dtype=x.dtype) for v in coeffs]
    x1, x2, y1, y2 = state

    if mode == "exact":
        def step(carry, xt):
            x1, x2, y1, y2 = carry
            y = b0 * xt + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            return (xt, x1, y, y1), y

        xT = jnp.moveaxis(x, -1, 0)  # [T, L]
        (x1n, x2n, y1n, y2n), yT = jax.lax.scan(step, (x1, x2, y1, y2), xT)
        return jnp.moveaxis(yT, 0, -1), (x1n, x2n, y1n, y2n)

    # parallel: FIR prefix using carried history for the first two samples
    L, T = x.shape
    if T < 2:
        return biquad_df1(x, coeffs, state, mode="exact")
    xm1 = jnp.concatenate([x1[:, None], x[:, :-1]], axis=-1)
    xm2 = jnp.concatenate([x2[:, None], x1[:, None], x[:, :-2]], axis=-1)
    u = b0 * x + b1 * xm1 + b2 * xm2  # [L, T]

    # v_t = [y_t, y_{t-1}] = M v_{t-1} + [u_t, 0],
    # M = [[-a1, -a2], [1, 0]] (per-lane)
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)

    def bcast(v):
        v = jnp.asarray(v, dtype=x.dtype)
        return jnp.broadcast_to(v[..., None] if v.ndim == 1 else v, u.shape)

    A = jnp.stack(
        [
            jnp.stack([-bcast(a1), -bcast(a2)], axis=-1),
            jnp.stack([ones, zeros], axis=-1),
        ],
        axis=-2,
    )  # [L, T, 2, 2]
    d = jnp.stack([u, zeros], axis=-1)  # [L, T, 2]

    def combine(l, r):
        Al, dl = l
        Ar, dr = r
        return Ar @ Al, jnp.einsum("...ij,...j->...i", Ar, dl) + dr

    Ap, dp = jax.lax.associative_scan(combine, (A, d), axis=1)
    v0 = jnp.stack([y1, y2], axis=-1)  # [L, 2]
    v = jnp.einsum("ltij,lj->lti", Ap, v0) + dp  # [L, T, 2]
    y = v[..., 0]
    x1n = x[:, -1]
    x2n = x[:, -2] if T >= 2 else x1
    y1n = y[:, -1]
    y2n = y[:, -2] if T >= 2 else y1
    return y, (x1n, x2n, y1n, y2n)
