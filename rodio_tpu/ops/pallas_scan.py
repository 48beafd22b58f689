"""Pallas TPU kernels for sequential recurrences.

XLA's `lax.scan` pays a fixed per-iteration cost that dominates thin-body
audio recurrences (a few microseconds per time step for [lanes]-wide
elementwise work). These kernels run the whole recurrence inside ONE
Mosaic kernel with VMEM-resident data and register/VMEM carries:

- the lane axis is shaped to (8, 128) so every time step is a single full
  VPU vreg operation,
- time is chunked over a sequential grid dimension; carries live in VMEM
  scratch across grid steps (the standard TPU sequential-grid pattern),
- per-step access goes through VMEM scratch REFS (Mosaic supports dynamic
  indexing on refs, not on values), with chunk-wise transposes between the
  lane-major block layout and the time-major scratch layout.

Kernels: biquad direct-form-I (src/source/blt.rs:556-561) and a generic
first-order recurrence family (linear / max-affine / the AGC gain update).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # 8 sublanes x 128 lanes = one f32 vreg per time step


def _biquad_kernel(x_ref, c_ref, state_ref, y_ref, out_state_ref,
                   carry, x_scr, y_scr, *, t_chunk: int, unroll: int = 1):
    """One (lane_group, time_chunk) grid step.

    x_ref/y_ref: [LANES, t_chunk] VMEM blocks (lane-major).
    c_ref: [8] SMEM coefficients b0 b1 b2 a1 a2 (padded).
    state_ref/out_state_ref: [LANES, 4] carries (x1, x2, y1, y2).
    carry: [4, 8, 128] VMEM scratch persisting across the time grid.
    x_scr/y_scr: [t_chunk, 8, 128] time-major staging scratch.
    """
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    b0 = c_ref[0]
    b1 = c_ref[1]
    b2 = c_ref[2]
    a1 = c_ref[3]
    a2 = c_ref[4]

    @pl.when(t_idx == 0)
    def _load_state():
        carry[...] = state_ref[...].T.reshape(4, 8, 128)

    # stage this chunk time-major; a bf16 block (the opt-in block-dtype
    # contract, conversions/blockdtype.py) upcasts ON LOAD — the
    # recurrence always runs f32
    x_scr[...] = x_ref[...].T.reshape(t_chunk, 8, 128).astype(x_scr.dtype)

    def step(t, acc):
        x1, x2, y1, y2 = acc
        xcur = x_scr[t]
        y = b0 * xcur + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        y_scr[t] = y
        return (xcur, x1, y, y1)

    init = (carry[0], carry[1], carry[2], carry[3])
    x1, x2, y1, y2 = jax.lax.fori_loop(0, t_chunk, step, init,
                                       unroll=unroll)

    y_ref[...] = y_scr[...].reshape(t_chunk, LANES).T.astype(y_ref.dtype)
    carry[0] = x1
    carry[1] = x2
    carry[2] = y1
    carry[3] = y2

    @pl.when(t_idx == n_t - 1)
    def _store_state():
        out_state_ref[...] = carry[...].reshape(4, LANES).T


@functools.partial(jax.jit, static_argnames=("t_chunk", "interpret"))
def biquad_df1_pallas(x, coeffs, state, *, t_chunk: int = 512,
                      interpret: bool = False):
    """Fused biquad: x [L, T] lanes-by-time -> (y [L, T], new state).

    coeffs: (b0, b1, b2, a1, a2) scalars. state: (x1, x2, y1, y2) each [L].
    L is padded to a multiple of 1024 lanes; T to a multiple of t_chunk.

    bf16 blocks (the opt-in block-dtype contract): x may be bfloat16 —
    the kernel upcasts on load, runs the recurrence in the STATE dtype
    (f32), and stores y back at the block dtype, so the [L, T] HBM
    round-trips run at half width while the feedback stays full
    precision.
    """
    L, T = x.shape
    blk_dt = x.dtype
    dt = state[0].dtype
    Lp = -(-L // LANES) * LANES
    Tp = -(-T // t_chunk) * t_chunk
    xp = jnp.pad(x, ((0, Lp - L), (0, Tp - T)))
    st = jnp.stack([jnp.pad(s, (0, Lp - L)) for s in state], axis=1)  # [Lp,4]
    c = jnp.asarray(list(coeffs) + [0.0, 0.0, 0.0], dtype=dt)  # pad to 8

    grid = (Lp // LANES, Tp // t_chunk)
    y, out_state = pl.pallas_call(
        functools.partial(_biquad_kernel, t_chunk=t_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, 4), lambda i, t: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((LANES, 4), lambda i, t: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Tp), blk_dt),
            jax.ShapeDtypeStruct((Lp, 4), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
        ],
        interpret=interpret,
    )(xp, c, st)
    y = y[:L, :T]
    if T >= 2:
        # DF1 carry == the last two unpadded inputs/outputs (avoids the
        # padded tail steps advancing the in-kernel carry; carries stay
        # in the state dtype even for bf16 blocks)
        new_state = (x[:, -1].astype(dt), x[:, -2].astype(dt),
                     y[:, -1].astype(dt), y[:, -2].astype(dt))
    else:
        new_state = tuple(out_state[:L, i] for i in range(4))
    return y, new_state


def _first_order_kernel(a_ref, b_ref, c_ref, p_ref, state_ref, y_ref,
                        out_state_ref,
                        carry, a_scr, b_scr, c_scr, y_scr,
                        *, t_chunk: int, op: str,
                        unroll: int = 1):
    """Generic first-order recurrence over one (lane_group, time_chunk):
    linear:     y = a_t * y_prev + b_t
    max_affine: y = max(a_t, b_t + c_t * y_prev)
    agc_gain:   speed = att if a_t > y_prev else rel;
                y = clip(y_prev*speed + a_t*(1-speed), 0.1, max_gain)
                with p_ref = [att, rel, max_gain, 0...] SMEM DATA
                (src/source/agc.rs:486-496; live knobs re-trace nothing,
                matching agc.rs:302-361 set_attack/release semantics)
    """
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _load():
        carry[...] = state_ref[...].reshape(8, 128)

    a_scr[...] = a_ref[...].T.reshape(t_chunk, 8, 128)
    if op != "agc_gain":
        b_scr[...] = b_ref[...].T.reshape(t_chunk, 8, 128)
    if op == "max_affine":
        c_scr[...] = c_ref[...].T.reshape(t_chunk, 8, 128)

    def step(t, y):
        if op == "linear":
            y = a_scr[t] * y + b_scr[t]
        elif op == "max_affine":
            y = jnp.maximum(a_scr[t], b_scr[t] + c_scr[t] * y)
        elif op == "agc_gain":
            att = p_ref[0]
            rel = p_ref[1]
            max_gain = p_ref[2]
            d = a_scr[t]
            speed = jnp.where(d > y, att, rel)
            y = jnp.clip(y * speed + d * (1.0 - speed), 0.1, max_gain)
        else:
            raise ValueError(op)
        y_scr[t] = y
        return y

    y = jax.lax.fori_loop(0, t_chunk, step, carry[...], unroll=unroll)
    y_ref[...] = y_scr[...].reshape(t_chunk, LANES).T
    carry[...] = y

    @pl.when(t_idx == n_t - 1)
    def _store():
        out_state_ref[...] = carry[...].reshape(LANES)


def _limiter_env_kernel(db_ref, state_ref, peak_ref, out_state_ref,
                        carry, db_scr, peak_scr,
                        *, t_chunk: int, att: float, rel: float,
                        t_true: int, unroll: int = 1):
    """Both limiter envelope stages fused (src/source/limit.rs:909-913):
      integ = max(db, rel*integ + (1-rel)*db)
      peak  = att*peak + (1-att)*integ
    carry: [4, 8, 128] = (integ, peak, saved_integ, saved_peak); the saved
    pair is captured at the true (unpadded) last step so padded tail steps
    don't corrupt the block carry.
    """
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _load():
        st = state_ref[...]  # [LANES, 2]
        carry[0] = st[:, 0].reshape(8, 128)
        carry[1] = st[:, 1].reshape(8, 128)
        carry[2] = jnp.zeros((8, 128), dtype=db_ref.dtype)
        carry[3] = jnp.zeros((8, 128), dtype=db_ref.dtype)

    db_scr[...] = db_ref[...].T.reshape(t_chunk, 8, 128)
    base = t_idx * t_chunk

    def step(t, acc):
        integ, peak, s_integ, s_peak = acc
        d = db_scr[t]
        integ = jnp.maximum(d, rel * integ + (1.0 - rel) * d)
        peak = att * peak + (1.0 - att) * integ
        peak_scr[t] = peak
        is_last = (base + t) == (t_true - 1)
        s_integ = jnp.where(is_last, integ, s_integ)
        s_peak = jnp.where(is_last, peak, s_peak)
        return (integ, peak, s_integ, s_peak)

    init = (carry[0], carry[1],
            jnp.zeros((8, 128), dtype=db_ref.dtype),
            jnp.zeros((8, 128), dtype=db_ref.dtype))
    integ, peak, s_integ, s_peak = jax.lax.fori_loop(0, t_chunk, step, init,
                                                     unroll=unroll)

    peak_ref[...] = peak_scr[...].reshape(t_chunk, LANES).T
    carry[0] = integ
    carry[1] = peak
    carry[2] = jnp.where(t_idx == (t_true - 1) // t_chunk, s_integ, carry[2])
    carry[3] = jnp.where(t_idx == (t_true - 1) // t_chunk, s_peak, carry[3])

    @pl.when(t_idx == n_t - 1)
    def _store():
        out_state_ref[...] = carry[2:4].reshape(2, LANES).T


def _agc_kernel(x_ref, d_ref, p_ref, state_ref, gain_ref, out_state_ref,
                carry, x_scr, d_scr, g_scr,
                *, t_chunk: int, t_true: int, unroll: int = 1):
    """The full AGC sample loop fused (src/source/agc.rs:397-496):
      peak   = max(|x|, rel*peak + (1-rel)*|x|)
      sum    = sum + (sq - old)            [d = sq - old, precomputed]
      rms    = sqrt(sum / WINDOW)
      des    = clamp(min(target/rms?, min(target/peak?, max)), floor)
      gain   = clip(gain*speed + des*(1-speed), 0.1, max)
    carry: [6, 8, 128] = (peak, sum, gain, saved x3).
    p_ref: [8] SMEM DATA (att, rel, target, max_gain, floor, 1/WINDOW) —
    live attack/release knobs are pure state updates, zero re-trace
    (src/source/agc.rs:302-361).
    """
    att = p_ref[0]
    rel = p_ref[1]
    target = p_ref[2]
    max_gain = p_ref[3]
    floor = p_ref[4]
    inv_window = p_ref[5]
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _load():
        st = state_ref[...]  # [LANES, 3]
        carry[0] = st[:, 0].reshape(8, 128)
        carry[1] = st[:, 1].reshape(8, 128)
        carry[2] = st[:, 2].reshape(8, 128)
        carry[3] = jnp.zeros((8, 128), dtype=x_ref.dtype)
        carry[4] = jnp.zeros((8, 128), dtype=x_ref.dtype)
        carry[5] = jnp.zeros((8, 128), dtype=x_ref.dtype)

    x_scr[...] = x_ref[...].T.reshape(t_chunk, 8, 128)
    d_scr[...] = d_ref[...].T.reshape(t_chunk, 8, 128)
    base = t_idx * t_chunk

    def step(t, acc):
        peak, rsum, gain, sp, ss, sg = acc
        xv = x_scr[t]
        coeff = jnp.where(xv > peak, 0.0, rel)
        peak = peak * coeff + xv * (1.0 - coeff)
        rsum = rsum + d_scr[t]
        # target/sqrt(mean) as a single rsqrt (sum > 0 <=> rms > 0)
        rms_gain = jnp.where(
            rsum > 0.0, target * jax.lax.rsqrt(rsum * inv_window), max_gain
        )
        peak_gain = jnp.where(
            peak > 0.0, jnp.minimum(target / peak, max_gain), max_gain
        )
        des = jnp.maximum(jnp.minimum(rms_gain, peak_gain), floor)
        speed = jnp.where(des > gain, att, rel)
        gain = jnp.clip(gain * speed + des * (1.0 - speed), 0.1, max_gain)
        g_scr[t] = gain
        is_last = (base + t) == (t_true - 1)
        sp = jnp.where(is_last, peak, sp)
        ss = jnp.where(is_last, rsum, ss)
        sg = jnp.where(is_last, gain, sg)
        return (peak, rsum, gain, sp, ss, sg)

    init = (carry[0], carry[1], carry[2], carry[3], carry[4], carry[5])
    peak, rsum, gain, sp, ss, sg = jax.lax.fori_loop(0, t_chunk, step, init,
                                                     unroll=unroll)

    gain_ref[...] = g_scr[...].reshape(t_chunk, LANES).T
    carry[0] = peak
    carry[1] = rsum
    carry[2] = gain
    in_save_chunk = t_idx == (t_true - 1) // t_chunk
    carry[3] = jnp.where(in_save_chunk, sp, carry[3])
    carry[4] = jnp.where(in_save_chunk, ss, carry[4])
    carry[5] = jnp.where(in_save_chunk, sg, carry[5])

    @pl.when(t_idx == n_t - 1)
    def _store():
        out_state_ref[...] = carry[3:6].reshape(3, LANES).T


@functools.partial(jax.jit,
                   static_argnames=("t_chunk", "interpret"))
def agc_pallas(xs, delta, peak0, sum0, gain0, *, params,
               t_chunk: int = 256, interpret: bool = False):
    """Fused AGC: xs=|x| [L, M], delta=sq-old [L, M] -> (gain_seq [L, M],
    (peak', sum', gain') carries). params = (att, rel, target, max_gain,
    floor, 1/WINDOW), each possibly TRACED — passed as SMEM data so live
    attack/release knobs re-trace nothing."""
    L, M = xs.shape
    dt = xs.dtype
    Lp = -(-L // LANES) * LANES
    Mp = -(-M // t_chunk) * t_chunk
    xp = jnp.pad(xs, ((0, Lp - L), (0, Mp - M)))
    dp = jnp.pad(delta, ((0, Lp - L), (0, Mp - M)))
    st = jnp.stack([
        jnp.pad(peak0, (0, Lp - L)),
        jnp.pad(sum0, (0, Lp - L)),
        jnp.pad(gain0, (0, Lp - L)),
    ], axis=1)
    pk = jnp.stack(
        [jnp.asarray(v, dt) for v in params]
        + [jnp.zeros((), dt)] * (8 - len(params))
    )
    grid = (Lp // LANES, Mp // t_chunk)
    vm = pltpu.ANY if interpret else pltpu.VMEM
    gain, out_state = pl.pallas_call(
        functools.partial(_agc_kernel, t_chunk=t_chunk,
                          t_true=M,
                          unroll=1 if interpret else t_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=vm),
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, 3), lambda i, t: (i, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=vm),
            pl.BlockSpec((LANES, 3), lambda i, t: (i, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Mp), dt),
            jax.ShapeDtypeStruct((Lp, 3), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
        ],
        interpret=interpret,
    )(xp, dp, pk, st)
    return gain[:L, :M], (out_state[:L, 0], out_state[:L, 1],
                          out_state[:L, 2])


@functools.partial(jax.jit,
                   static_argnames=("t_chunk", "interpret", "att", "rel"))
def limiter_env_pallas(db, integ0, peak0, *, att: float, rel: float,
                       t_chunk: int = 512, interpret: bool = False):
    """Fused limiter envelopes: db [L, T] -> (peak_seq [L, T],
    (integ_carry [L], peak_carry [L])). One kernel, both recurrences."""
    L, T = db.shape
    dt = db.dtype
    Lp = -(-L // LANES) * LANES
    Tp = -(-T // t_chunk) * t_chunk
    dbp = jnp.pad(db, ((0, Lp - L), (0, Tp - T)))
    st = jnp.stack(
        [jnp.pad(integ0, (0, Lp - L)), jnp.pad(peak0, (0, Lp - L))], axis=1
    )
    grid = (Lp // LANES, Tp // t_chunk)
    vm = pltpu.ANY if interpret else pltpu.VMEM
    peak, out_state = pl.pallas_call(
        functools.partial(_limiter_env_kernel, t_chunk=t_chunk,
                          att=att, rel=rel, t_true=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=vm),
            pl.BlockSpec((LANES, 2), lambda i, t: (i, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                         memory_space=vm),
            pl.BlockSpec((LANES, 2), lambda i, t: (i, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Tp), dt),
            jax.ShapeDtypeStruct((Lp, 2), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
        ],
        interpret=interpret,
    )(dbp, st)
    return peak[:L, :T], (out_state[:L, 0], out_state[:L, 1])


@functools.partial(jax.jit,
                   static_argnames=("t_chunk", "interpret", "op"))
def first_order_pallas(a, b, init, *, c=None, op: str = "linear",
                       params=(), t_chunk: int = 256,
                       interpret: bool = False):
    """Fused first-order recurrence: a, b, (c): [L, T]; init: [L].

    ``params`` (op="agc_gain": att, rel, max_gain) may be TRACED scalars
    — they ride SMEM as data, so live knob changes re-trace nothing.

    Returns y [L, T] (the recurrence outputs; carry = y[:, -1]).
    Pad-safe: trailing padded steps would corrupt the in-kernel carry, so
    the caller uses y[:, T-1] as the true carry.
    """
    L, T = a.shape
    dt = a.dtype
    Lp = -(-L // LANES) * LANES
    Tp = -(-T // t_chunk) * t_chunk

    def padded(v):
        return jnp.pad(v, ((0, Lp - L), (0, Tp - T)))

    ap = padded(a)
    bp = padded(b)
    cp = padded(c if c is not None else jnp.zeros_like(a))
    st = jnp.pad(init, (0, Lp - L))
    pk = jnp.stack(
        [jnp.asarray(v, dt) for v in params]
        + [jnp.zeros((), dt)] * (4 - len(params))
    )

    grid = (Lp // LANES, Tp // t_chunk)
    spec = pl.BlockSpec((LANES, t_chunk), lambda i, t: (i, t),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    sspec = pl.BlockSpec((LANES,), lambda i, t: (i,),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    y, _ = pl.pallas_call(
        functools.partial(_first_order_kernel, t_chunk=t_chunk, op=op,
                          unroll=1 if interpret else t_chunk),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM), sspec],
        out_specs=(spec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Tp), dt),
            jax.ShapeDtypeStruct((Lp,), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
            pltpu.VMEM((t_chunk, 8, 128), dt),
        ],
        interpret=interpret,
    )(ap, bp, cp, pk, st)
    return y[:L, :T]
