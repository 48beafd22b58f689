"""Blocked parallel-in-time master limiter — the whole Limit stage in ONE
Mosaic kernel.

The limiter (src/source/limit.rs:854-930) is, per channel,
  db     = soft-knee gain computer (elementwise)
  integ  = max(db, rel*integ' + (1-rel)*db)     [max-affine, constant rel]
  peak   = att*peak' + (1-att)*integ            [linear, constant att]
  gain   = 10^(-coupled_peak/20)                [elementwise]
and both recurrences are associative with CONSTANT coefficients, so the
scan parallelizes in time. A naive Pallas loop pays T sequential steps on
a 2-lane-wide problem (~58us per 4160-frame block at the master bus);
this kernel restructures time into P chunks laid out on the 128-lane axis
with channels on sublanes:

  X[t, c, p] = x[c, p*Lc + t]        (Lc = T/P rows, full vregs)

and runs:
  1. local prefix MAPS per chunk (Lc-step loop, full-vreg elementwise),
  2. chunk-boundary combine via log2(P) lane-roll Hillis-Steele rounds
     (max-affine maps compose as B' = max(Bp, Ap*Bs + Cp), A' = Ap*As,
      C' = Ap*Cs + Cp; linear maps drop the max term),
  3. vectorized application of the chunk carry-in (rel^t / att^t powers
     precomputed in float64 on the host),
so the sequential depth falls from T to Lc + log2(P). The db computer,
the rodio channel-coupling rule (fresh peaks for channels <= c, the
previous frame's peaks above — src/source/limit.rs:880-905, stereo case),
and the gain application all run inside the same kernel: one dispatch,
zero intermediate HBM round trips.

Numerics: reassociating the envelope recurrences changes f32 rounding
order (ulp-level per composition); parity vs the sequential scan is ~1e-6
on unit-scale audio.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import LOG2_10, LOG10_2, exp2_precise, log2_precise

_BIG = 3.0e38
_TINY = float(np.finfo(np.float32).tiny)  # refimpl TINY (Sample::MIN_POSITIVE)


def _limiter_kernel(x_ref, state_ref, relpow_ref, attpow_ref,
                    y_ref, out_state_ref,
                    b_scr, c_scr, cp_scr,
                    *, Lc: int, P: int, att: float, rel: float,
                    threshold: float, knee_width: float, inv_knee_8: float,
                    t_last: int):
    """x_ref: [Lc, 8, 128] (channel = sublane, chunk = lane, row = local t).
    state_ref: [8, 2] (integ0, peak0). relpow/attpow: [Lc] SMEM = coef^(t+1).
    y_ref: [Lc, 8, 128] limited output. out_state_ref: [8, 2].
    t_last: linear index of the true last sample (carry extraction point).
    """
    dt = x_ref.dtype
    cr = 1.0 - rel
    ca = 1.0 - att
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def gain_db(x):
        """Soft-knee gain computer (effects/limit.py:limiter_gain_db), in
        the reference's log2 form (src/math.rs:87-90) with the precise
        f32 log2 (core/math module note)."""
        bias_db = log2_precise(jnp.abs(x) + _TINY) * (LOG10_2 * 20.0) \
            - threshold
        kb = bias_db * 2.0
        xk = kb + knee_width
        quad = xk * xk * inv_knee_8
        return jnp.where(
            kb < -knee_width, 0.0,
            jnp.where(jnp.abs(kb) <= knee_width, quad, bias_db),
        )

    # ---- pass 1: local prefix maps of the integ (max-affine) stage ----
    def loop1(t, acc):
        B, C = acc
        d = gain_db(x_ref[t])
        B = jnp.maximum(d, rel * B + cr * d)
        C = rel * C + cr * d
        b_scr[t] = B
        c_scr[t] = C
        return (B, C)

    neg = jnp.full((8, 128), -_BIG, dt)
    zero = jnp.zeros((8, 128), dt)
    jax.lax.fori_loop(0, Lc, loop1, (neg, zero))

    # ---- chunk combine (integ): Hillis-Steele over the lane axis ----
    A1 = jnp.full((8, 128), rel ** Lc, dt)
    B1 = b_scr[Lc - 1]
    C1 = c_scr[Lc - 1]
    k = 1
    while k < P:
        As = pltpu.roll(A1, k, 1)
        Bs = pltpu.roll(B1, k, 1)
        Cs = pltpu.roll(C1, k, 1)
        m = lane >= k
        B1 = jnp.where(m, jnp.maximum(B1, A1 * Bs + C1), B1)
        C1 = jnp.where(m, A1 * Cs + C1, C1)
        A1 = jnp.where(m, A1 * As, A1)
        k *= 2
    i0 = state_ref[:, 0:1]  # [8, 1] broadcasts over lanes
    As = pltpu.roll(A1, 1, 1)
    Bs = pltpu.roll(B1, 1, 1)
    Cs = pltpu.roll(C1, 1, 1)
    v_integ = jnp.where(
        lane == 0, i0 + zero, jnp.maximum(Bs, As * i0 + Cs)
    )

    # ---- pass 2: apply integ carry; local maps of the peak (linear) ----
    def loop2(t, Cp):
        integ = jnp.maximum(
            b_scr[t], relpow_ref[t] * v_integ + c_scr[t]
        )
        Cp = att * Cp + ca * integ
        cp_scr[t] = Cp
        return Cp

    jax.lax.fori_loop(0, Lc, loop2, zero)

    # ---- chunk combine (peak) ----
    A2 = jnp.full((8, 128), att ** Lc, dt)
    C2 = cp_scr[Lc - 1]
    k = 1
    while k < P:
        As = pltpu.roll(A2, k, 1)
        Cs = pltpu.roll(C2, k, 1)
        m = lane >= k
        C2 = jnp.where(m, A2 * Cs + C2, C2)
        A2 = jnp.where(m, A2 * As, A2)
        k *= 2
    p0 = state_ref[:, 1:2]
    As = pltpu.roll(A2, 1, 1)
    Cs = pltpu.roll(C2, 1, 1)
    v_peak = jnp.where(lane == 0, p0 + zero, As * p0 + Cs)

    # ---- pass 3: peak values, stereo coupling, gain, carries ----
    r_last = t_last % Lc
    p_last = t_last // Lc

    def loop3(t, acc):
        prev, s_i, s_p = acc
        peak = attpow_ref[t] * v_peak + cp_scr[t]
        # coupling (C=2): ch0 pairs the fresh ch0 peak with ch1's
        # PREVIOUS-sample peak; ch1 sees both fresh (limit.py:164-180)
        mp = jnp.maximum(
            peak[0:1, :], jnp.where(sub == 0, prev[1:2, :], peak)
        )
        y_ref[t] = x_ref[t] * exp2_precise(mp * (-0.05 * LOG2_10))
        is_last = t == r_last
        integ = jnp.maximum(
            b_scr[t], relpow_ref[t] * v_integ + c_scr[t]
        )
        s_i = jnp.where(is_last, integ, s_i)
        s_p = jnp.where(is_last, peak, s_p)
        return (peak, s_i, s_p)

    _, s_i, s_p = jax.lax.fori_loop(0, Lc, loop3, (v_peak, zero, zero))
    out_state_ref[:, 0:1] = s_i[:, p_last : p_last + 1]
    out_state_ref[:, 1:2] = s_p[:, p_last : p_last + 1]


@functools.partial(
    jax.jit,
    static_argnames=("att", "rel", "threshold", "knee_width", "inv_knee_8",
                     "P", "interpret"),
)
def limiter_master_pallas(x, integ0, peak0, *, att: float, rel: float,
                          threshold: float, knee_width: float,
                          inv_knee_8: float, P: int = 64,
                          interpret: bool = False):
    """Whole master-bus limiter on x [2, T] -> (y [2, T], (integ', peak')).

    Requires T % P == 0 (the caller picks P; see Limit.emit). The channel
    axis must be exactly 2 (the rodio stereo coupling rule is baked in).
    """
    C, T = x.shape
    assert C == 2 and T % P == 0 and P <= 128 and P & (P - 1) == 0
    Lc = T // P
    dt = x.dtype

    # [C, T] -> [Lc, 8, 128]: chunk p on lane p, channel on sublane
    x3 = jnp.pad(
        x.reshape(C, P, Lc).transpose(2, 0, 1),
        ((0, 0), (0, 8 - C), (0, 128 - P)),
    )
    st = jnp.stack([jnp.pad(integ0, (0, 8 - C)),
                    jnp.pad(peak0, (0, 8 - C))], axis=1)  # [8, 2]
    tt = np.arange(1, Lc + 1, dtype=np.float64)
    relpow = jnp.asarray(np.power(float(rel), tt), dt)
    attpow = jnp.asarray(np.power(float(att), tt), dt)

    mem = pltpu.ANY if interpret else pltpu.VMEM
    y3, out_state = pl.pallas_call(
        functools.partial(
            _limiter_kernel, Lc=Lc, P=P, att=att, rel=rel,
            threshold=threshold, knee_width=knee_width,
            inv_knee_8=inv_knee_8, t_last=T - 1,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lc, 8, 128), dt),
            jax.ShapeDtypeStruct((8, 2), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((Lc, 8, 128), dt),
            pltpu.VMEM((Lc, 8, 128), dt),
            pltpu.VMEM((Lc, 8, 128), dt),
        ],
        interpret=interpret,
    )(x3, st, relpow, attpow)

    y = y3[:, :C, :P].transpose(1, 2, 0).reshape(C, T)
    return y, (out_state[:C, 0], out_state[:C, 1])


def _bma_kernel(x_ref, v0_ref, relpow_ref, y_ref, out_c_ref,
                b_scr, c_scr, *, Lc: int, P: int):
    """Blocked y_t = max(x_t, a*y' + (1-a)*x_t) values over [Lc, 8, 128]
    (instant-attack/slow-release peak detector — src/source/agc.rs:433-444
    and the limiter integrator share this form).

    The coefficient is DATA: relpow_ref[t] = a^(t+1) in SMEM, so
    a = relpow_ref[0] and a^Lc = relpow_ref[Lc-1] — live release-time
    knobs (src/source/agc.rs:302-361) are pure state updates with zero
    re-trace."""
    a = relpow_ref[0]
    ca = 1.0 - a
    dt = x_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    neg = jnp.full((8, 128), -_BIG, dt)
    zero = jnp.zeros((8, 128), dt)

    def loop1(t, acc):
        B, C = acc
        d = x_ref[t]
        B = jnp.maximum(d, a * B + ca * d)
        C = a * C + ca * d
        b_scr[t] = B
        c_scr[t] = C
        return (B, C)

    jax.lax.fori_loop(0, Lc, loop1, (neg, zero))

    A1 = jnp.full((8, 128), 0.0, dt) + relpow_ref[Lc - 1]  # a^Lc
    B1 = b_scr[Lc - 1]
    C1 = c_scr[Lc - 1]
    k = 1
    while k < P:
        As = pltpu.roll(A1, k, 1)
        Bs = pltpu.roll(B1, k, 1)
        Cs = pltpu.roll(C1, k, 1)
        m = lane >= k
        B1 = jnp.where(m, jnp.maximum(B1, A1 * Bs + C1), B1)
        C1 = jnp.where(m, A1 * Cs + C1, C1)
        A1 = jnp.where(m, A1 * As, A1)
        k *= 2
    v0 = v0_ref[:, 0:1]
    As = pltpu.roll(A1, 1, 1)
    Bs = pltpu.roll(B1, 1, 1)
    Cs = pltpu.roll(C1, 1, 1)
    v_in = jnp.where(lane == 0, v0 + zero, jnp.maximum(Bs, As * v0 + Cs))

    def loop2(t, _):
        y_ref[t] = jnp.maximum(
            b_scr[t], relpow_ref[t] * v_in + c_scr[t]
        )
        return 0

    jax.lax.fori_loop(0, Lc, loop2, 0)
    out_c_ref[...] = jnp.zeros((8, 1), dt)  # caller uses y[:, -1]


@functools.partial(
    jax.jit, static_argnames=("P", "interpret")
)
def blocked_max_affine_const(x, v0, a, *, P: int = 128,
                             interpret: bool = False):
    """y_t = max(x_t, a*y_{t-1} + (1-a)*x_t) values over x [L, M], L <= 8,
    M % P == 0, in one kernel with sequential depth M/P + log2(P).

    ``a`` may be a TRACED scalar (live release-time knob): the power
    table a^(t+1) is built with jnp cumulative products (ulp-class vs
    the former host-f64 table — inside the AGC stage's 2e-5 budget)."""
    L, M = x.shape
    assert L <= 8 and M % P == 0 and P <= 128 and P & (P - 1) == 0
    Lc = M // P
    dt = x.dtype
    x3 = jnp.pad(
        x.reshape(L, P, Lc).transpose(2, 0, 1),
        ((0, 0), (0, 8 - L), (0, 128 - P)),
    )
    v = jnp.pad(v0, (0, 8 - L))[:, None]
    relpow = jnp.cumprod(jnp.full((Lc,), jnp.asarray(a, dt)))

    mem = pltpu.ANY if interpret else pltpu.VMEM
    y3, _ = pl.pallas_call(
        functools.partial(_bma_kernel, Lc=Lc, P=P),
        in_specs=[
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lc, 8, 128), dt),
            jax.ShapeDtypeStruct((8, 1), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((Lc, 8, 128), dt),
            pltpu.VMEM((Lc, 8, 128), dt),
        ],
        interpret=interpret,
    )(x3, v, relpow)

    return y3[:, :L, :P].transpose(1, 2, 0).reshape(L, M)
