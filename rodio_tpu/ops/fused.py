"""Fused flagship mega-kernel: resample + biquad + gain/mix in ONE pass.

The unfused wide-channel pipeline (flagship.py) runs four XLA/Pallas ops
per block — resample matmul, biquad kernel, per-channel gain, stream-axis
mix — each of which round-trips the full [S*C, T] block through HBM
(~100 MB of traffic per 4096-frame block at 512 stereo streams). This
kernel performs the whole chain inside one Mosaic kernel reading the PCM
directly from an HBM-resident chunked buffer, so the only HBM traffic per
block is ONE pass over the input window plus the tiny [C, T] mix out.

Data layout: the source PCM is pre-chunked once at init into
``chunks[j] = frames [j*fr, (j+1)*fr) as [fr_p, LANES]`` (time-major,
rows padded to a multiple of 8 with zeros; G0^T gets matching zero
columns). Chunk DMAs then index only the leading dimension, which Mosaic
allows at arbitrary runtime offsets (minor-dim HBM slices must be
128-aligned and sublane extents 8-aligned, which arbitrary resample
phases/strides are not). Time-major also makes every stage's
layout native: the resample matmul produces time-major chunks directly,
the biquad consumes them row-per-step, and the mix matmul emits [T, 8] —
zero in-kernel transposes.

Per sequential grid step (m resample chunks = m*to output frames):
  1. DMA m chunks [fr, LANES] from HBM at runtime chunk index c0 + t*m + k,
  2. chunk matmul  G0^T[to, fr] @ X_k[fr, LANES]  on the MXU (+ g1 column
     times the xnext boundary row) — the chunk-reshaped lerp resampler of
     conversions/resample.py:_build_lerp_matrix — staged time-major,
  3. the biquad direct-form-I recurrence over the m*to time steps with a
     VMEM carry persisting across grid steps (src/source/blt.rs:556-561
     semantics); a scattered look-ahead unrolling (default width 4, see
     the wrapper's coefficient derivation) expresses each group of
     outputs directly in the iteration-entry state, cutting the
     latency-bound serial chain to one recurrence per 4 samples,
  4. one mix matmul  y[m*to, LANES] @ M^T[LANES, 8]  where
     M[c, l] = gain_l * [l % C == c]  — per-stream gain and the mixer's
     N-way sum (src/mixer.rs:185-198) fused into a single MXU op.

Numerics: the biquad is bit-identical to the sequential scan only for
lookahead=1; with lookahead>1 (the default is 2, the flagship uses 4) the
unrolled coefficient rows reassociate the recurrence arithmetic, so the
biquad agrees only to ~ulp level. The resample and mix matmuls accumulate
on the MXU in a different order than the unfused einsum/reshape-sum, so
those stages agree to ~1e-6 (f32 roundoff), not bitwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # 8 sublanes x 128 lanes = one f32 vreg per biquad time step


def _fused_kernel(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                  mixt_ref, state_ref,
                  out_ref, out_state_ref,
                  carry, xraw, x_scr, y_scr, sems,
                  *, m: int, to: int, precision, int3: bool,
                  lookahead: int = 1):
    _fused_body(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                mixt_ref, state_ref, out_ref, out_state_ref,
                carry, xraw, x_scr, y_scr, sems,
                m=m, to=to, precision=precision, int3=int3,
                lookahead=lookahead)


def _fused_agc_kernel(c0_ref, k0_ref, c_ref, chunks_ref, xn_ref, g0t_ref,
                      g1_ref, mixt_ref, state_ref, agc_ref, ring_in_ref,
                      out_ref, out_state_ref, out_agc_ref, ring_ref,
                      carry, xraw, x_scr, y_scr, sems,
                      agc_carry, old_scr, sq_scr, rsems, wsems,
                      *, m: int, to: int, precision, int3: bool,
                      lookahead: int, agc: tuple, rs_slots: int, lag: int):
    """AGC-bearing variant: adds the per-stream AGC stage between the
    biquad and the mix (src/source/agc.rs:397-496, decomposed form), with
    the 8192-interleaved-sample RMS window kept as an HBM ring of squared
    outputs (``ring``: [rs_slots, m*to, 8, 128], aliased in/out).

    Wide layout must be CHANNEL-MAJOR: lane = c * (LANES//2) + s, so ch0
    of all streams lives in sublanes 0..3 of each time row and ch1 in
    4..7; the interleaved AGC recurrences then run on [4, 128] vregs.
    """
    _fused_body(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                mixt_ref, state_ref, out_ref, out_state_ref,
                carry, xraw, x_scr, y_scr, sems,
                m=m, to=to, precision=precision, int3=int3,
                lookahead=lookahead,
                agc=agc, k0_ref=k0_ref, agc_ref=agc_ref, ring_ref=ring_ref,
                out_agc_ref=out_agc_ref, agc_carry=agc_carry,
                old_scr=old_scr, sq_scr=sq_scr, rsems=rsems, wsems=wsems,
                rs_slots=rs_slots, lag=lag)


def _fused_body(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                mixt_ref, state_ref,
                out_ref, out_state_ref,
                carry, xraw, x_scr, y_scr, sems,
                *, m: int, to: int, precision, int3: bool,
                lookahead: int = 1,
                agc=None, k0_ref=None, agc_ref=None, ring_ref=None,
                out_agc_ref=None, agc_carry=None, old_scr=None,
                sq_scr=None, rsems=None, wsems=None,
                rs_slots: int = 0, lag: int = 0):
    """One sequential time-grid step: m chunk DMAs -> resample -> biquad
    -> mix. All compute is time-major.

    c0_ref: [1] SMEM — first chunk index of this block's window.
    c_ref: SMEM biquad coeffs (b0 b1 b2 a1 a2 + packed look-ahead rows). chunks_ref: [Nc, fr_p, LANES] HBM PCM.
    xn_ref: [K, LANES] first frame of the chunk AFTER each chunk.
    g0t_ref: [to, fr_p] transposed lerp operator (zero columns past fr);
    g1_ref: [to, 8] (col 0 = boundary column). mixt_ref: [LANES, 8]
    transposed gain+mix matrix.
    state_ref/out_state_ref: [LANES, 4] biquad carries (x1, x2, y1, y2).
    carry: [4, 8, 128] persistent VMEM scratch; xraw: [2, m, fr_p, LANES] DMA
    landing pads; x_scr/y_scr: [m*to, 8, 128] time-major staging.
    """
    t_idx = pl.program_id(0)
    n_t = pl.num_programs(0)

    b0 = c_ref[0]
    b1 = c_ref[1]
    b2 = c_ref[2]
    a1 = c_ref[3]
    a2 = c_ref[4]
    c0 = c0_ref[0]

    @pl.when(t_idx == 0)
    def _load_state():
        carry[...] = state_ref[...].T.reshape(4, 8, 128)

    mto = m * to
    if agc is not None:
        k = k0_ref[0] + t_idx

        @pl.when(t_idx == 0)
        def _load_agc_state():
            agc_carry[...] = agc_ref[...]

        # old-window reads: the sq values leaving the 8192-interleaved
        # RMS ring this step = this kernel's own squared outputs from
        # `lag` frames ago, stored in the HBM ring `rs_slots` steps deep.
        # lag is not a multiple of m*to, so the old block straddles two
        # ring slots at a STATIC intra-slot offset (two fixed-shape DMAs).
        q_off = lag // mto
        row_a = (q_off + 1) * mto - lag     # first row within slot A
        len_a = mto - row_a
        slot_a = jax.lax.rem(k - (q_off + 1) + 2 * rs_slots, rs_slots)
        cp_a = pltpu.make_async_copy(
            ring_ref.at[slot_a, pl.ds(row_a, len_a)],
            old_scr.at[pl.ds(0, len_a)], rsems.at[0],
        )
        cp_a.start()
        if row_a:
            slot_b = jax.lax.rem(k - q_off + 2 * rs_slots, rs_slots)
            cp_b = pltpu.make_async_copy(
                ring_ref.at[slot_b, pl.ds(0, row_a)],
                old_scr.at[pl.ds(len_a, row_a)], rsems.at[1],
            )
            cp_b.start()

        # the write DMA issued 2 steps ago reused sq_scr[t%2]: wait it
        # before this step's AGC loop refills that buffer
        wslot = jax.lax.rem(t_idx, 2)

        @pl.when(t_idx >= 2)
        def _wait_prev_write():
            pltpu.make_async_copy(
                sq_scr.at[wslot],
                ring_ref.at[jax.lax.rem(k - 2, rs_slots)],
                wsems.at[wslot],
            ).wait()

    # 1: double-buffered chunk DMAs — step t's chunks were prefetched at
    # step t-1 into slot t%2; this step prefetches t+1 into the other slot
    def _start(t, slot):
        for k in range(m):
            src = chunks_ref.at[c0 + t * m + k]
            pltpu.make_async_copy(src, xraw.at[slot, k],
                                  sems.at[slot, k]).start()

    slot = jax.lax.rem(t_idx, 2)

    @pl.when(t_idx == 0)
    def _warm():
        _start(t_idx, slot)

    @pl.when(t_idx + 1 < n_t)
    def _prefetch():
        _start(t_idx + 1, jax.lax.rem(t_idx + 1, 2))

    # 2: resample each chunk on the MXU, stage time-major
    if not int3:
        g0t = g0t_ref[...]
    g1col = g1_ref[:, 0:1]  # [to, 1]
    out_dt = x_scr.dtype
    for k in range(m):
        pltpu.make_async_copy(
            chunks_ref.at[c0 + t_idx * m + k], xraw.at[slot, k],
            sems.at[slot, k]
        ).wait()
        xnk = xn_ref[pl.ds(t_idx * m + k, 1), :]       # [1, LANES]
        if int3:
            # exact single-pass bf16 matmul: g0t is the integer-scaled
            # lerp operator tiled 3x along the contraction axis, xraw
            # holds the PCM split into three exact bf16 pieces stacked
            # the same way, so ONE dot computes the summed pieces with
            # every product exact; the f32 lerp is reproduced up to one
            # final 1/to scale rounding
            acc = jnp.dot(g0t_ref[...], xraw[slot, k],
                          preferred_element_type=out_dt)
            yk = acc * (1.0 / to) + g1col * xnk
        else:
            xk = xraw[slot, k]                         # [fr_p, LANES]
            yk = jnp.dot(g0t, xk, preferred_element_type=out_dt,
                         precision=precision)
            yk = yk + g1col * xnk                      # [to, LANES]
        x_scr[k * to : (k + 1) * to] = yk.reshape(to, 8, 128)

    # 3: biquad recurrence over the m*to resampled steps
    init = (carry[0], carry[1], carry[2], carry[3])
    if lookahead > 1:
        # scattered look-ahead: all `lookahead` outputs of one iteration
        # are expressed directly in the iteration-entry state, so the
        # serial dependency chain advances `lookahead` samples per round
        # trip (the loop is latency-bound, not issue-bound). Coefficient
        # rows come from c_ref[5:] (see the wrapper derivation).
        LA = lookahead

        def _tree_sum(terms):
            # pairwise reduction: depth log2(n) instead of n — the loop
            # is latency-bound, so the add-tree depth IS the cost
            while len(terms) > 1:
                nxt = [terms[i] + terms[i + 1]
                       for i in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            return terms[0]

        def step_la(i, acc):
            x1, x2, y1, y2 = acc
            t = LA * i
            xs = [x_scr[t + j] for j in range(LA)]
            ys = []
            base = 5
            for k in range(LA):
                if k == 0:
                    y = _tree_sum([b0 * xs[0], b1 * x1, b2 * x2,
                                   -(a1 * y1), -(a2 * y2)])
                else:
                    nco = k + 4
                    cf = [c_ref[base + j] for j in range(nco)]
                    base += nco
                    terms = [b0 * xs[k]]
                    terms += [cf[j] * xs[k - 1 - j] for j in range(k)]
                    terms += [cf[k] * x1, cf[k + 1] * x2,
                              cf[k + 2] * y1, cf[k + 3] * y2]
                    y = _tree_sum(terms)
                y_scr[t + k] = y
                ys.append(y)
            return (xs[-1], xs[-2], ys[-1], ys[-2])

        x1, x2, y1, y2 = jax.lax.fori_loop(0, m * to // LA, step_la, init)
    else:
        def step(t, acc):
            x1, x2, y1, y2 = acc
            xcur = x_scr[t]
            y = b0 * xcur + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            y_scr[t] = y
            return (xcur, x1, y, y1)

        x1, x2, y1, y2 = jax.lax.fori_loop(0, m * to, step, init)

    carry[0] = x1
    carry[1] = x2
    carry[2] = y1
    carry[3] = y2

    # 3b: AGC over the biquad outputs (channel-major: ch0 = sublanes 0..3,
    # ch1 = 4..7). Per interleaved sub-step (frame t: ch0 then ch1, the
    # column-major order of src/source/agc.rs's interleaved loop):
    #   rms_sum += sq - old          (8192-sample running sum, agc.rs:409)
    #   peak = max(xs, rel*peak + (1-rel)*xs)           (agc.rs:397-407)
    #   desired = max(min(target*rsqrt(ms), min(target/peak, mg)), floor)
    #   gain = clip(gain*speed + desired*(1-speed))     (agc.rs:486-496)
    # The rs/peak chains run serially (3 ops/sub-step); the rsqrt/div of
    # `desired` is hoisted out of the serial chain (computed for a whole
    # AW-frame group at once); the gain smoother stays serial.
    if agc is not None:
        att, rel, target, mg, floor_, invw = agc
        cp_a.wait()
        if row_a:
            cp_b.wait()
        AW = 4
        assert mto % AW == 0

        def agc_loop(i, carrs):
            rs, pk, g = carrs
            t0 = i * AW
            vals = []
            for j in range(AW):
                y = y_scr[t0 + j]
                old = old_scr[t0 + j]
                sq_scr[wslot, t0 + j] = y * y
                for c in (0, 1):
                    xs = jnp.abs(y[4 * c : 4 * c + 4])
                    sq = xs * xs
                    rs = rs + (sq - old[4 * c : 4 * c + 4])
                    pk = jnp.maximum(xs, rel * pk + (1.0 - rel) * xs)
                    vals.append((rs, pk))
            des = []
            for rs_i, pk_i in vals:
                rg = jnp.where(
                    rs_i > 0.0, target * jax.lax.rsqrt(rs_i * invw), mg
                )
                pg = jnp.where(
                    pk_i > 0.0, jnp.minimum(target / pk_i, mg), mg
                )
                des.append(jnp.maximum(jnp.minimum(rg, pg), floor_))
            for j in range(AW):
                y = y_scr[t0 + j]
                for c in (0, 1):
                    d = des[2 * j + c]
                    speed = jnp.where(d > g, att, rel)
                    g = g * speed + d * (1.0 - speed)
                    g = jnp.clip(g, 0.1, mg)
                    y_scr[t0 + j, 4 * c : 4 * c + 4] = (
                        y[4 * c : 4 * c + 4] * g
                    )
            return (rs, pk, g)

        rs, pk, g = jax.lax.fori_loop(
            0, mto // AW, agc_loop,
            (agc_carry[0:4], agc_carry[4:8], agc_carry[8:12]),
        )
        agc_carry[0:4] = rs
        agc_carry[4:8] = pk
        agc_carry[8:12] = g

        # publish this step's squares into the ring
        wcp = pltpu.make_async_copy(
            sq_scr.at[wslot], ring_ref.at[jax.lax.rem(k, rs_slots)],
            wsems.at[wslot],
        )
        wcp.start()

        @pl.when(t_idx == n_t - 1)
        def _drain_writes():
            # the kernel must not exit with DMAs in flight: wait this
            # step's write and (when it exists) the previous step's
            wcp.wait()

            @pl.when(t_idx >= 1)
            def _():
                pltpu.make_async_copy(
                    sq_scr.at[jax.lax.rem(t_idx + 1, 2)],
                    ring_ref.at[jax.lax.rem(k - 1 + rs_slots, rs_slots)],
                    wsems.at[jax.lax.rem(t_idx + 1, 2)],
                ).wait()

        @pl.when(t_idx == n_t - 1)
        def _store_agc():
            out_agc_ref[...] = agc_carry[...]

    # 4: gain + stream-axis mix as one matmul
    y_t = y_scr[...].reshape(m * to, LANES)
    mix = jnp.dot(y_t, mixt_ref[...], preferred_element_type=y_t.dtype,
                  precision=jax.lax.Precision.HIGHEST)  # [m*to, 8]
    out_ref[...] = mix[None]

    @pl.when(t_idx == n_t - 1)
    def _store_state():
        out_state_ref[...] = carry[...].reshape(4, LANES).T


def _prepare(chunks, c0, xn_t, g0, g1, mixmat, coeffs, bq_state,
             *, fr: int, to: int, m: int, precision: str, lookahead: int):
    """Shared host-side prep: int3 weight/piece layout, look-ahead biquad
    coefficient rows, packed SMEM vectors, state packing."""
    int3 = chunks.ndim == 4
    if int3:
        Nc, npc, fr_p, _ = chunks.shape
        assert npc == 3 and chunks.dtype == jnp.bfloat16
        assert to <= 256, "int3 path requires integer weights <= 256"
        assert m <= 2, "int3 with m > 2 exceeds the 16MB VMEM budget"
    else:
        Nc, fr_p, _ = chunks.shape
    assert fr_p >= fr and fr_p % 16 == 0
    K = xn_t.shape[0]
    assert xn_t.shape == (K, LANES) and K % m == 0
    dt = xn_t.dtype

    st = jnp.stack(list(bq_state), axis=1)             # [LANES, 4]
    g1p = jnp.zeros((to, 8), dt).at[:, 0].set(g1)
    b0, b1, b2, a1, a2 = (jnp.asarray(v, dt) for v in coeffs)
    # look-ahead coefficient rows: y[t+k] = b0 x[t+k] + row_k . basis with
    # basis = (x[t+LA-2], ..., x[t], x[t-1], x[t-2], y[t-1], y[t-2]),
    # derived by unrolling the recurrence into itself. Row k has k+4
    # meaningful coefficients (x[t+k-1..t], x1, x2, y1, y2).
    LA = max(lookahead, 2)
    W = LA + 3  # basis width
    zero = jnp.zeros((), dt)
    one = jnp.ones((), dt)

    def x_unit(j):  # basis vector for x[t+j], j in [-2, LA-2]
        v = [zero] * W
        v[LA - 2 - j] = one
        return v

    def madd(*pairs):
        out = [zero] * W
        for coef, vec in pairs:
            out = [o + coef * e for o, e in zip(out, vec)]
        return out

    y_prev2 = [zero] * (W - 1) + [one]          # y[t-2]
    y_prev1 = [zero] * (W - 2) + [one, zero]    # y[t-1]
    packed = [b0, b1, b2, a1, a2]
    for k in range(LA):
        row = madd((b1, x_unit(k - 1)), (b2, x_unit(k - 2)),
                   (-a1, y_prev1), (-a2, y_prev2))
        if k >= 1:
            # trim to the k+4 meaningful coefficients
            packed.extend(row[W - 4 - k :])
        y_full = madd((one, row), (b0, x_unit(k)))
        y_prev2 = y_prev1
        y_prev1 = y_full
    n_smem = -(-len(packed) // 8) * 8
    c = jnp.stack(packed + [zero] * (n_smem - len(packed)))
    c0 = jnp.asarray(c0, jnp.int32).reshape(1)
    if int3:
        # integer-scaled lerp weights: g0*to has entries in [0, to],
        # exactly representable in bf16 for to <= 256; tiled 3x along
        # the contraction axis to match the stacked bf16 pieces
        g1w = jnp.pad(
            jnp.rint(jnp.asarray(g0, dt) * to).astype(jnp.bfloat16).T,
            ((0, 0), (0, fr_p - fr)),
        )
        g0t = jnp.concatenate([g1w, g1w, g1w], axis=1)  # [to, 3*fr_p]
        chunks = chunks.reshape(Nc, 3 * fr_p, LANES)
    else:
        g0t = jnp.pad(jnp.asarray(g0, dt).T, ((0, 0), (0, fr_p - fr)))
    mixt = mixmat.T

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "int3": jax.lax.Precision.DEFAULT}[precision]
    return dict(int3=int3, fr_p=fr_p, K=K, dt=dt, st=st, g1p=g1p, c=c,
                c0=c0, g0t=g0t, mixt=mixt, prec=prec, chunks=chunks,
                n_t=K // m)


def _common_in_specs(P, mem, K):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # c0
        pl.BlockSpec(memory_space=pltpu.SMEM),      # coeffs
        pl.BlockSpec(memory_space=pltpu.ANY),       # chunks (HBM)
        pl.BlockSpec((K, LANES), lambda t: (0, 0), memory_space=mem),
        pl.BlockSpec(P["g0t"].shape, lambda t: (0, 0), memory_space=mem),
        pl.BlockSpec((P["g1p"].shape[0], 8), lambda t: (0, 0),
                     memory_space=mem),
        pl.BlockSpec((LANES, 8), lambda t: (0, 0), memory_space=mem),
        pl.BlockSpec((LANES, 4), lambda t: (0, 0), memory_space=mem),
    ]


def _common_scratch(P, m, to):
    return [
        pltpu.VMEM((4, 8, 128), P["dt"]),
        pltpu.VMEM((2, m, 3 * P["fr_p"], LANES), jnp.bfloat16)
        if P["int3"] else pltpu.VMEM((2, m, P["fr_p"], LANES), P["dt"]),
        pltpu.VMEM((m * to, 8, 128), P["dt"]),
        pltpu.VMEM((m * to, 8, 128), P["dt"]),
        pltpu.SemaphoreType.DMA((2, m)),
    ]


@functools.partial(
    jax.jit,
    static_argnames=("fr", "to", "m", "interpret", "precision", "lookahead"),
)
def fused_resample_biquad_mix(chunks, c0, xn_t, g0, g1, mixmat, coeffs,
                              bq_state, *, fr: int, to: int, m: int = 2,
                              precision: str = "highest",
                              lookahead: int = 2,
                              interpret: bool = False):
    """Fused pipeline over one block, reading straight from the chunked
    buffer.

    chunks: [Nc, fr_p, LANES] pre-chunked time-major PCM (HBM resident,
    rows fr..fr_p-1 zero, zero-padded past the stream end). c0: scalar int32 first chunk index.
    xn_t: [K, LANES] — xn_t[k] is the first frame of chunk c0 + k + 1.
    g0: [fr, to]; g1: [to]; mixmat: [8, LANES] gain+mix rows (rows >= C
    and lanes >= wide zero). coeffs: (b0, b1, b2, a1, a2).
    bq_state: (x1, x2, y1, y2) each [LANES]. K % m == 0.

    Returns (mix [8, K*to], new bq_state tuple each [LANES]).
    """
    P = _prepare(chunks, c0, xn_t, g0, g1, mixmat, coeffs, bq_state,
                 fr=fr, to=to, m=m, precision=precision, lookahead=lookahead)
    n_t = P["n_t"]
    dt = P["dt"]
    mem = pltpu.ANY if interpret else pltpu.VMEM
    out3, out_state = pl.pallas_call(
        functools.partial(_fused_kernel, m=m, to=to, precision=P["prec"],
                          int3=P["int3"], lookahead=lookahead),
        grid=(n_t,),
        in_specs=_common_in_specs(P, mem, P["K"]),
        out_specs=(
            pl.BlockSpec((1, m * to, 8), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((LANES, 4), lambda t: (0, 0), memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_t, m * to, 8), dt),
            jax.ShapeDtypeStruct((LANES, 4), dt),
        ),
        scratch_shapes=_common_scratch(P, m, to),
        interpret=interpret,
    )(P["c0"], P["c"], P["chunks"], xn_t, P["g0t"], P["g1p"], P["mixt"],
      P["st"])

    mix = out3.reshape(P["K"] * to, 8).T
    new_state = tuple(out_state[:, i] for i in range(4))
    return mix, new_state


@functools.partial(
    jax.jit,
    static_argnames=("fr", "to", "m", "interpret", "precision", "lookahead",
                     "agc_params", "lag"),
    donate_argnames=("ring",),
)
def fused_resample_biquad_agc_mix(chunks, c0, k0, xn_t, g0, g1, mixmat,
                                  coeffs, bq_state, agc_state, ring,
                                  *, fr: int, to: int, m: int = 2,
                                  precision: str = "highest",
                                  lookahead: int = 2,
                                  agc_params: tuple,
                                  lag: int,
                                  interpret: bool = False):
    """AGC-bearing fused pipeline (see _fused_agc_kernel).

    Extra inputs over fused_resample_biquad_mix:
    k0: scalar int32 — GLOBAL grid-step index of this block's first step
        (= output_frame_offset // (m*to)); indexes the sq-history ring.
    agc_state: [12, 128] packed per-stream carries (rows 0-3 rms_sum,
        4-7 peak, 8-11 gain; stream s at (s//128, s%128)).
    ring: [rs_slots, m*to, 8, 128] HBM ring of squared outputs (donated,
        aliased to the ring output). rs_slots must be
        ceil(lag / (m*to)) + 2 so reads never collide with writes.
    agc_params: (att, rel, target, max_gain, floor, inv_window) floats.
    lag: RMS window length in FRAMES (8192 interleaved / C=2 = 4096).

    Returns (mix [8, K*to], bq_state', agc_state' [12,128], ring').
    """
    P = _prepare(chunks, c0, xn_t, g0, g1, mixmat, coeffs, bq_state,
                 fr=fr, to=to, m=m, precision=precision, lookahead=lookahead)
    n_t = P["n_t"]
    dt = P["dt"]
    mto = m * to
    rs_slots = ring.shape[0]
    assert ring.shape == (rs_slots, mto, 8, 128)
    assert rs_slots >= -(-lag // mto) + 2
    assert agc_state.shape == (12, 128)
    k0 = jnp.asarray(k0, jnp.int32).reshape(1)
    mem = pltpu.ANY if interpret else pltpu.VMEM

    in_specs = _common_in_specs(P, mem, P["K"])
    # insert k0 after c0; append agc_state + ring
    in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((12, 128), lambda t: (0, 0),
                                 memory_space=mem))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))   # ring (HBM)

    out3, out_state, out_agc, ring_out = pl.pallas_call(
        functools.partial(
            _fused_agc_kernel, m=m, to=to, precision=P["prec"],
            int3=P["int3"], lookahead=lookahead, agc=agc_params,
            rs_slots=rs_slots, lag=lag,
        ),
        grid=(n_t,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, mto, 8), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((LANES, 4), lambda t: (0, 0), memory_space=mem),
            pl.BlockSpec((12, 128), lambda t: (0, 0), memory_space=mem),
            pl.BlockSpec(memory_space=pltpu.ANY),            # ring out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_t, mto, 8), dt),
            jax.ShapeDtypeStruct((LANES, 4), dt),
            jax.ShapeDtypeStruct((12, 128), dt),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
        ),
        scratch_shapes=_common_scratch(P, m, to) + [
            pltpu.VMEM((12, 128), dt),            # agc carry
            pltpu.VMEM((mto, 8, 128), dt),        # old window
            pltpu.VMEM((2, mto, 8, 128), dt),     # sq out (double-buffered)
            pltpu.SemaphoreType.DMA((2,)),        # ring reads
            pltpu.SemaphoreType.DMA((2,)),        # ring writes
        ],
        input_output_aliases={10: 3},             # ring in -> ring out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(P["c0"], k0, P["c"], P["chunks"], xn_t, P["g0t"], P["g1p"],
      P["mixt"], P["st"], agc_state, ring)

    mix = out3.reshape(P["K"] * to, 8).T
    new_state = tuple(out_state[:, i] for i in range(4))
    return mix, new_state, out_agc, ring_out
