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
biquad agrees only to ~ulp level. The resample matmul accumulates on the
MXU in a different order than the unfused einsum, ~1e-6-class (f32
roundoff), not bitwise. The mix: per-stream gains are folded into the
PCM at init so the mix matrix is 0/1-valued (exact in bf16); the kernel
then splits y into two exact bf16 pieces and runs two DEFAULT-precision
passes — every product exact, residual < 2^-18 relative per (gain-folded,
~1/S-scaled) lane value. Measured end-to-end vs the exact unfused chain
at 512 streams on v5e: max |err| 2.75e-8 (int3) / 3.71e-8 (int2).

Piece modes ("precision"): "int3" (default via "auto") stores the PCM as
three exact bf16 pieces (all 24 f32 mantissa bits; 6 B/sample of HBM
traffic); "int2" drops the third piece (4 B/sample, ~15% faster block
time, residual < 2^-18 relative per lane — fine for incoherent program
material, can reach ~4e-6 absolute only if all S streams carry identical
in-phase full-scale content).

Serial-loop form: ``lookahead`` > 1 selects the scattered look-ahead
recurrence; NEGATIVE ``lookahead`` runs the SAME |lookahead|-deep
recurrence STATICALLY UNROLLED (a trace-time Python loop instead of
``fori_loop``), so every x_scr/y_scr row access is a static VMEM
address — measured 12-33% faster blocks on v5e (BENCHMARKS.md round-3);
bit-identical on hardware, ~1 ulp under the CPU interpreter (XLA FMA
contraction may differ between the rolled and unrolled forms).

An alternative blocked parallel-in-time biquad (``subblk`` > 0: G
interleaved zero-history sub-block chains + rank-2(G-1) boundary
correction riding the mix matmul) is implemented and tested but ~15%
slower than the look-ahead loop on v5e — scattered dynamic-row VMEM
access outweighs the pipelining win. Kept as an opt-in for future
hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import LOG2_10, LOG10_2, exp2_precise, log2_precise

LANES = 1024  # 8 sublanes x 128 lanes = one f32 vreg per biquad time step


def _ipow(x, n: int):
    """x ** n for a traced scalar and static positive int, as explicit
    squaring (Mosaic-friendly: no integer_pow lowering)."""
    r = None
    b = x
    while n:
        if n & 1:
            r = b if r is None else r * b
        b = b * b
        n >>= 1
    return r


def _tree_sum(terms):
    # pairwise reduction: depth log2(n) instead of n — the serial loops
    # are partly latency-bound, so the add-tree depth IS the cost
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1]
               for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _fused_kernel(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                  mixt_ref, ab_ref, state_ref, lim_ref, gv_ref,
                  out_ref, out_state_ref, out_lim_ref,
                  carry, xraw, x_scr, y_scr, sems, corr_scr, limc,
                  *, m: int, to: int, precision, int3: bool,
                  lookahead: int = 1, subblk: int = 0,
                  binary_mix: bool = False, bfold: bool = False,
                  wsplit: bool = False, firfold: bool = False,
                  ufir: bool = False, i8: bool = False,
                  pcm_bits: int = 15,
                  ring_chunks: int = 0, limiter: tuple = None,
                  gain_post: bool = False, nslot: int = 3):
    _fused_body(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                mixt_ref, state_ref, out_ref, out_state_ref,
                carry, xraw, x_scr, y_scr, sems,
                m=m, to=to, precision=precision, int3=int3,
                lookahead=lookahead, subblk=subblk, binary_mix=binary_mix,
                bfold=bfold, wsplit=wsplit, firfold=firfold, ufir=ufir,
                i8=i8, pcm_bits=pcm_bits, ring_chunks=ring_chunks,
                ab_ref=ab_ref, corr_scr=corr_scr, nslot=nslot,
                gv_ref=gv_ref, gain_post=gain_post,
                limiter=limiter, lim_ref=lim_ref,
                out_lim_ref=out_lim_ref, limc=limc)


def _fused_agc_kernel(c0_ref, k0_ref, agcp_ref, c_ref, chunks_ref, xn_ref,
                      g0t_ref, g1_ref, mixt_ref, state_ref, agc_ref,
                      ring_in_ref, lim_ref,
                      out_ref, out_state_ref, out_agc_ref, ring_ref,
                      out_lim_ref,
                      carry, xraw, x_scr, y_scr, sems,
                      agc_carry, old_scr, sq_scr, rsems, wsems, limc,
                      tr_a=None, tr_b=None, tr_c=None, gb_scr=None,
                      *, m: int, to: int, precision, int3: bool,
                      lookahead: int, rs_slots: int, lag: int,
                      bfold: bool = False, wsplit: bool = False,
                      firfold: bool = False, ufir: bool = False,
                      i8: bool = False, pcm_bits: int = 15,
                      ring_chunks: int = 0,
                      limiter: tuple = None, agc_group: int = 0,
                      agc_rel0: str = "",
                      nslot: int = 3):
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
                bfold=bfold, wsplit=wsplit, firfold=firfold, ufir=ufir,
                i8=i8, pcm_bits=pcm_bits, ring_chunks=ring_chunks,
                agc=True, agcp_ref=agcp_ref,
                k0_ref=k0_ref, agc_ref=agc_ref, ring_ref=ring_ref,
                out_agc_ref=out_agc_ref, agc_carry=agc_carry,
                old_scr=old_scr, sq_scr=sq_scr, rsems=rsems, wsems=wsems,
                rs_slots=rs_slots, lag=lag, agc_group=agc_group,
                agc_rel0=agc_rel0,
                tr_a=tr_a, tr_b=tr_b, tr_c=tr_c, gb_scr=gb_scr,
                nslot=nslot,
                limiter=limiter, lim_ref=lim_ref,
                out_lim_ref=out_lim_ref, limc=limc)


def _fused_body(c0_ref, c_ref, chunks_ref, xn_ref, g0t_ref, g1_ref,
                mixt_ref, state_ref,
                out_ref, out_state_ref,
                carry, xraw, x_scr, y_scr, sems,
                *, m: int, to: int, precision, int3: bool,
                lookahead: int = 1, subblk: int = 0,
                binary_mix: bool = False, bfold: bool = False,
                wsplit: bool = False, firfold: bool = False,
                ufir: bool = False, i8: bool = False,
                pcm_bits: int = 15, ring_chunks: int = 0,
                limiter: tuple = None, lim_ref=None, out_lim_ref=None,
                limc=None,
                gv_ref=None, gain_post: bool = False,
                ab_ref=None, corr_scr=None,
                agc=None, agcp_ref=None, k0_ref=None, agc_ref=None,
                ring_ref=None, agc_group: int = 0,
                agc_rel0: str = "",
                tr_a=None, tr_b=None, tr_c=None, gb_scr=None,
                out_agc_ref=None, agc_carry=None, old_scr=None,
                sq_scr=None, rsems=None, wsems=None,
                rs_slots: int = 0, lag: int = 0, nslot: int = 3):
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

    # lookahead < 0 selects the STATICALLY UNROLLED serial loop: the
    # same look-ahead-|LA| recurrence, but as a Python loop over the
    # mto/|LA| iterations so every x_scr/y_scr row access is a static
    # VMEM address (the fori_loop form computes each row offset from
    # the traced induction variable — dynamic-address issue overhead on
    # an issue-bound loop).
    unroll = lookahead < 0
    lookahead = abs(lookahead)

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
        # global grid-step index for the sq-history ring (NOTE: must not
        # be shadowed — the resample loop below iterates `k` over chunks)
        gstep = k0_ref[0] + t_idx

        @pl.when(t_idx == 0)
        def _load_agc_state():
            agc_carry[...] = agc_ref[...]

        # old-window reads: the sq values leaving the 8192-interleaved
        # RMS ring this step = this kernel's own squared outputs from
        # `lag` frames ago, stored in the HBM ring `rs_slots` steps deep.
        # When lag is not a multiple of m*to the old block straddles two
        # ring slots at a STATIC intra-slot offset (two fixed-shape
        # DMAs); when lag % (m*to) == 0 (any power-of-two rate ratio)
        # the old block IS one full slot and only the slot-B copy runs
        # (row_a == mto, len_a == 0 — a zero-length slice would be out
        # of bounds).
        # agc_group > 0: the ring's row unit is a GROUP of agc_group
        # frames (one [8,128] row of per-group window sums, halves
        # duplicated) — ring traffic drops by the group factor; the same
        # straddle arithmetic applies in group units (the wrapper
        # asserts agc_group | lag and agc_group | m*to).
        rr = mto // agc_group if agc_group else mto     # ring rows/step
        rlag = lag // agc_group if agc_group else lag   # lag in rows
        q_off = rlag // rr
        row_a = (q_off + 1) * rr - rlag     # first row within slot A
        len_a = rr - row_a
        if len_a:
            slot_a = jax.lax.rem(
                gstep - (q_off + 1) + 2 * rs_slots, rs_slots
            )
            cp_a = pltpu.make_async_copy(
                ring_ref.at[slot_a, pl.ds(row_a, len_a)],
                old_scr.at[pl.ds(0, len_a)], rsems.at[0],
            )
            cp_a.start()
        if row_a:
            slot_b = jax.lax.rem(gstep - q_off + 2 * rs_slots, rs_slots)
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
                ring_ref.at[jax.lax.rem(gstep - 2, rs_slots)],
                wsems.at[wslot],
            ).wait()

    # 1: pipelined chunk DMAs, 3 slots deep — step t's chunks land in slot
    # t%3 (issued 2 steps ahead); ONE combined [m, fr_p, LANES] copy per
    # step (separate per-chunk copies pay per-descriptor latency that
    # caps effective HBM bandwidth well below peak).
    # ring_chunks > 0: the chunk buffer is a ROLLING ring (streaming-farm
    # feed) — indices wrap modulo the ring size. The wrapper guarantees
    # ring_chunks % m == 0 and c0 % m == 0, so one m-chunk DMA never
    # straddles the wrap seam.
    def _chunk_at(t):
        idx = c0 + t * m
        if ring_chunks:
            idx = jax.lax.rem(idx, ring_chunks)
        return idx

    def _start(t, slot):
        pltpu.make_async_copy(
            chunks_ref.at[pl.ds(_chunk_at(t), m)],
            xraw.at[slot], sems.at[slot],
        ).start()

    NSLOT = nslot
    slot = jax.lax.rem(t_idx, NSLOT)

    @pl.when(t_idx == 0)
    def _warm():
        # fill the pipeline: NSLOT-1 copies in flight before the
        # steady-state prefetch below issues the NSLOT'th
        for j in range(min(NSLOT - 1, n_t)):
            _start(t_idx + j, jax.lax.rem(t_idx + j, NSLOT))

    @pl.when(t_idx + (NSLOT - 1) < n_t)
    def _prefetch():
        _start(t_idx + (NSLOT - 1),
               jax.lax.rem(t_idx + (NSLOT - 1), NSLOT))

    # 2: resample each chunk on the MXU, stage time-major
    if not int3:
        g0t = g0t_ref[...]
    g1col = g1_ref[:, 0:1]  # [to, 1]
    out_dt = x_scr.dtype
    pltpu.make_async_copy(
        chunks_ref.at[pl.ds(_chunk_at(t_idx), m)],
        xraw.at[slot], sems.at[slot],
    ).wait()
    if firfold:
        # FIR-folded resample: one stacked dot per chunk yields
        # u = FIR(resample(x)) (rows 0..to-1, summed over the three
        # weight pieces) plus the two RAW resampled tail frames
        # (rows to..to+1) that seed the next chunk's boundary fixup and
        # the carried x-history state. Rows 0/1 of each chunk reference
        # x[-1]/x[-2] from the PREVIOUS chunk, which the weight matrix
        # cannot see — the fixup adds those carried-tail terms.
        # Piece groups are padded to 8-row multiples (sublane-aligned
        # accumulator slices).
        to2 = -(-(to + 2) // 8) * 8
        xp1 = carry[0]
        xp2 = carry[1]
        for k in range(m):
            acc = jnp.dot(g0t_ref[...], xraw[slot, k],
                          preferred_element_type=out_dt)
            u = (acc[0:to] + acc[to2 : to2 + to]
                 + acc[2 * to2 : 2 * to2 + to])
            tl = (acc[to : to + 2] + acc[to2 + to : to2 + to + 2]
                  + acc[2 * to2 + to : 2 * to2 + to + 2])
            t3 = tl.reshape(2, 8, 128)
            x_scr[k * to : (k + 1) * to] = u.reshape(to, 8, 128)
            # row fixups as ref read-modify-writes (.at[].add would be a
            # scatter-add, which Mosaic does not lower)
            x_scr[k * to] = x_scr[k * to] + (b1 * xp1 + b2 * xp2)
            x_scr[k * to + 1] = x_scr[k * to + 1] + b2 * xp1
            xp2 = t3[0]
            xp1 = t3[1]
        carry[0] = xp1
        carry[1] = xp2
    else:
      for k in range(m):
        xnk = xn_ref[pl.ds(t_idx * m + k, 1), :]       # [1, LANES]
        if int3:
            # exact single-pass bf16 matmul: g0t is the integer-scaled
            # lerp operator tiled npc-x along the contraction axis, xraw
            # holds the PCM split into exact bf16 pieces stacked the
            # same way, so ONE dot computes the summed pieces with
            # every product exact; the f32 lerp is reproduced up to one
            # final 1/to scale rounding. With bfold the boundary frame
            # rides a padding row, so the dot includes the g1 term too.
            # wsplit (to > 256): the integer operator is stacked as
            # [w_hi; w_lo] with w = 4*hi + lo, both halves bf16-exact;
            # the recombine is two array ops over the chunk.
            # i8: the pieces are int8 BYTES (hi = k >> 8, lo_c =
            # (k & 255) - 128 of the int16 sample k) at HALF the chunk
            # DMA bytes of the bf16 pieces; one convert pass widens them
            # to (exactly representable) bf16 integers and the SAME dot
            # reconstructs sum(w*k) exactly — the 2^8 piece scale and
            # the +128 lo bias live in the operator tiles
            # (build_fused_operator), so the only other change is the
            # 2^-15 factor folded into the output scale below.
            xk_p = xraw[slot, k]
            if i8:
                xk_p = xk_p.astype(jnp.bfloat16)
            acc = jnp.dot(g0t_ref[...], xk_p,
                          preferred_element_type=out_dt)
            if wsplit:
                acc = 4.0 * acc[:to] + acc[to:]
            if bfold:
                # gain_post rides the existing 1/to scale: gv_ref holds
                # gains/to (see the wrapper), so the per-lane stream
                # gain costs ZERO extra passes on this (default) path.
                # Keeping the HBM chunks raw means content that splits
                # exactly into two bf16 pieces (all 16-bit-sourced PCM)
                # rides the int2 layout with a provably-zero third
                # piece. Equivalent by linearity of resample+biquad
                # (amplify commutes, src/source/amplify.rs:10-22); f32
                # rounding moves by ~1 ulp vs the init-time PCM fold.
                if gain_post:
                    yk = acc.reshape(to, 8, 128) * gv_ref[...]
                else:
                    # i8: the dot yields integer sums sum(w*k); the
                    # 2^-15 sample scale folds into this one constant
                    # (exact exponent shift — bit-identical results)
                    yk = acc * ((1.0 / (to * float(1 << pcm_bits)))
                                if i8 else (1.0 / to))
            else:
                assert not i8, "i8 requires the bfold layout"
                yk = acc * (1.0 / to) + g1col * xnk
                if gain_post:
                    yk = yk.reshape(to, 8, 128) * gv_ref[...]
        else:
            xk = xraw[slot, k]                         # [fr_p, LANES]
            yk = jnp.dot(g0t, xk, preferred_element_type=out_dt,
                         precision=precision)
            yk = yk + g1col * xnk                      # [to, LANES]
            if gain_post:
                yk = yk.reshape(to, 8, 128) * gv_ref[...]
        x_scr[k * to : (k + 1) * to] = yk.reshape(to, 8, 128)

    # 3: biquad recurrence over the m*to resampled steps
    if firfold or ufir:
        # pure 2-term IIR on u values, unrolled LA-deep with the u-form
        # coefficient rows (see _prepare): the leading u term has
        # coefficient 1, so output k costs k+2 FMAs — ~40% fewer
        # serial-loop ops than the full-biquad unrolling.
        # firfold: u comes FIR-folded out of the resample dot (x_scr);
        # ufir: u is computed HERE as three full-width vector passes
        # (b0 x + b1 x[-1] + b2 x[-2] has no serial dependency) into
        # y_scr, which the loop then overwrites row-by-row with y —
        # the FIR leaves the issue-bound serial loop at the cost of
        # ~3 vector passes, WITHOUT firfold's 3x-stacked weight dot
        # (the part measured slower than the serial savings).
        if ufir:
            y_scr[0] = b0 * x_scr[0] + b1 * carry[0] + b2 * carry[1]
            y_scr[1] = b0 * x_scr[1] + b1 * x_scr[0] + b2 * carry[0]
            y_scr[pl.ds(2, mto - 2)] = (
                b0 * x_scr[pl.ds(2, mto - 2)]
                + b1 * x_scr[pl.ds(1, mto - 2)]
                + b2 * x_scr[pl.ds(0, mto - 2)]
            )
            u_buf = y_scr
        else:
            u_buf = x_scr
        LA = max(lookahead, 1)

        def step_ff(i, acc):
            py1, py2 = acc
            t = LA * i
            us = [u_buf[t + j] for j in range(LA)]
            ys = []
            base = 5
            for k in range(LA):
                if k == 0:
                    y = _tree_sum([us[0], -(a1 * py1), -(a2 * py2)])
                else:
                    nco = k + 2
                    cf = [c_ref[base + j] for j in range(nco)]
                    base += nco
                    terms = [us[k]]
                    terms += [cf[j] * us[k - 1 - j] for j in range(k)]
                    terms += [cf[k] * py1, cf[k + 1] * py2]
                    y = _tree_sum(terms)
                y_scr[t + k] = y
                ys.append(y)
            if LA == 1:
                return (ys[-1], py1)
            return (ys[-1], ys[-2])

        if unroll:
            acc = (carry[2], carry[3])
            for i in range(mto // LA):
                acc = step_ff(i, acc)
            y1, y2 = acc
        else:
            y1, y2 = jax.lax.fori_loop(
                0, mto // LA, step_ff, (carry[2], carry[3])
            )
        carry[2] = y1
        carry[3] = y2
        if ufir:
            # x history for the next block's FIR rows 0/1
            carry[0] = x_scr[mto - 1]
            carry[1] = x_scr[mto - 2]
    elif subblk:
        # blocked parallel-in-time biquad (non-AGC path):
        #   a. FIR part u = b0 x + b1 x[-1] + b2 x[-2] as ARRAY ops (no
        #      serial dependency — full-width row slices),
        #   b. the 2-term IIR y = u - a1 y[-1] - a2 y[-2] as G = mto/L
        #      INTERLEAVED chains, each over its own L-row sub-block with
        #      zero y-history: the G independent recurrences pipeline in
        #      the VPU, so the loop runs at issue rate, not FMA latency,
        #   c. a serial O(G) boundary sweep turning each sub-block's
        #      zero-history tail into the TRUE boundary values via the
        #      homogeneous responses alpha/beta (linearity of the IIR),
        #   d. the per-row corrections are NOT applied to y_scr — they
        #      ride the mix matmul as a rank-2(G-1) update (see step 4).
        # Deviation vs the sequential scan: the correction add reorders
        # the recurrence arithmetic (~1 ulp relative), same class as the
        # scattered look-ahead unrolling it replaces.
        L = subblk
        G = mto // L
        aL1 = c_ref[5]   # alpha[L-1]
        aL2 = c_ref[6]   # alpha[L-2]
        bL1 = c_ref[7]   # beta[L-1]
        bL2 = c_ref[8]   # beta[L-2]

        # a: FIR into y_scr (rows 0/1 use the carried x history)
        y_scr[0] = b0 * x_scr[0] + b1 * carry[0] + b2 * carry[1]
        y_scr[1] = b0 * x_scr[1] + b1 * x_scr[0] + b2 * carry[0]
        y_scr[pl.ds(2, mto - 2)] = (
            b0 * x_scr[pl.ds(2, mto - 2)]
            + b1 * x_scr[pl.ds(1, mto - 2)]
            + b2 * x_scr[pl.ds(0, mto - 2)]
        )

        # b: G interleaved zero-history IIR chains (chain 0 seeds from
        # the true carry, so its rows need no correction)
        def iir_step(i, ys):
            out = list(ys)
            for g in range(G):
                y1g, y2g = out[2 * g], out[2 * g + 1]
                row = g * L + i
                yv = y_scr[row] - a1 * y1g - a2 * y2g
                y_scr[row] = yv
                out[2 * g] = yv
                out[2 * g + 1] = y1g
            return tuple(out)

        # the zero seeds must carry the same vreg layout as the loaded
        # carries or Mosaic rejects the loop-carry relayout
        zero = carry[2] * 0.0
        iv = (carry[2], carry[3]) + (zero, zero) * (G - 1)
        jax.lax.fori_loop(0, L, iir_step, iv)

        # c: serial boundary sweep (tiny): p = true (y[end-1], y[end-2])
        p1 = y_scr[L - 1]
        p2 = y_scr[L - 2]
        for g in range(1, G):
            corr_scr[2 * (g - 1)] = p1
            corr_scr[2 * (g - 1) + 1] = p2
            np1 = y_scr[(g + 1) * L - 1] + aL1 * p1 + bL1 * p2
            np2 = y_scr[(g + 1) * L - 2] + aL2 * p1 + bL2 * p2
            p1, p2 = np1, np2
        x1 = x_scr[mto - 1]
        x2 = x_scr[mto - 2]
        y1 = p1
        y2 = p2
    elif lookahead > 1:
        # scattered look-ahead: all `lookahead` outputs of one iteration
        # are expressed directly in the iteration-entry state, so the
        # serial dependency chain advances `lookahead` samples per round
        # trip (the loop is latency-bound, not issue-bound). Coefficient
        # rows come from c_ref[5:] (see the wrapper derivation).
        LA = lookahead
        init = (carry[0], carry[1], carry[2], carry[3])

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

        if unroll:
            acc = init
            for i in range(m * to // LA):
                acc = step_la(i, acc)
            x1, x2, y1, y2 = acc
        else:
            x1, x2, y1, y2 = jax.lax.fori_loop(
                0, m * to // LA, step_la, init)
    else:
        init = (carry[0], carry[1], carry[2], carry[3])

        def step(t, acc):
            x1, x2, y1, y2 = acc
            xcur = x_scr[t]
            y = b0 * xcur + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            y_scr[t] = y
            return (xcur, x1, y, y1)

        if unroll:
            acc = init
            for t in range(m * to):
                acc = step(t, acc)
            x1, x2, y1, y2 = acc
        else:
            x1, x2, y1, y2 = jax.lax.fori_loop(0, m * to, step, init)

    if not (firfold or ufir):
        # firfold/ufir already stored their carries (x tail in the
        # resample loop / FIR pre-pass, y tail in the u-form IIR branch)
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
        # AGC parameters are DATA (SMEM scalars), not trace constants:
        # live set_attack/set_release/set_enabled on the fused farm path
        # are pure state updates with zero re-trace (src/source/agc.rs
        # knob semantics)
        att = agcp_ref[0]
        rel = agcp_ref[1]
        target = agcp_ref[2]
        mg = agcp_ref[3]
        floor_ = agcp_ref[4]
        invw = agcp_ref[5]
        if len_a:
            cp_a.wait()
        if row_a:
            cp_b.wait()
        dtv = y_scr.dtype
        ring_bf16 = sq_scr.dtype == jnp.bfloat16
        if agc_group:
            # GROUP-RATE AGC (opt-in, documented deviation vs the
            # per-interleaved-sample smoother of agc.rs:397-496): window
            # sums and peaks reduce once per AG-frame group; the
            # group-end RMS window sum is EXACT (the same quantized
            # group sums enter and later leave the ring); the gain
            # smoother advances once per group with speed^(2*AG) —
            # identical to 2*AG per-sub-step updates toward a
            # group-constant desired gain; gains apply as a group
            # staircase (AG/fs seconds per step). See the AgcGroup
            # contract note in effects/agc.py.
            AG = agc_group
            G = mto // AG
            p2 = 2 * AG
            attG = _ipow(att, p2)
            relG = _ipow(rel, p2)
            crelG = 1.0 - relG

            # stage A (independent per group, pipelined): current group
            # window sums + group peaks; publish quantized sums to the
            # ring slot; park [d_group, peak_group] in x_scr row g
            # (x_scr is dead after the IIR; row g was consumed by group
            # g//AG <= g, so the write never clobbers unread input)
            def group_sums(g_i, _):
                yg = y_scr[pl.ds(g_i * AG, AG)]        # [AG, 8, 128]
                sq = yg * yg
                cur = sq[0]
                mx = jnp.abs(yg[0])
                for j in range(1, AG):
                    cur = cur + sq[j]
                    mx = jnp.maximum(mx, jnp.abs(yg[j]))
                cur4 = cur[0:4] + cur[4:8]             # [4, 128]
                ym = jnp.maximum(mx[0:4], mx[4:8])
                curq = jnp.concatenate([cur4, cur4], axis=0).astype(
                    sq_scr.dtype
                )
                sq_scr[wslot, g_i] = curq
                d = (curq[0:4].astype(dtv)
                     - old_scr[g_i][0:4].astype(dtv))
                x_scr[g_i] = jnp.concatenate([d, ym], axis=0)
                return 0

            if unroll:
                for _g in range(G):
                    group_sums(_g, 0)
            else:
                jax.lax.fori_loop(0, G, group_sums, 0)

            # serial pass 1: running-sum + peak chains (1 add + 2 ops
            # per GROUP instead of per sub-step)
            def chain_loop(g_i, carrs):
                rs, pk = carrs
                v = x_scr[g_i]
                rs = rs + v[0:4]
                ymg = v[4:8]
                pk = jnp.maximum(ymg, relG * pk + crelG * ymg)
                x_scr[g_i] = jnp.concatenate([rs, pk], axis=0)
                return (rs, pk)

            if unroll:
                acc_c = (agc_carry[0:4], agc_carry[4:8])
                for _g in range(G):
                    acc_c = chain_loop(_g, acc_c)
                rs, pk = acc_c
            else:
                rs, pk = jax.lax.fori_loop(
                    0, G, chain_loop, (agc_carry[0:4], agc_carry[4:8])
                )

            # pass 2 (vector): desired gain for every group at once
            v = x_scr[pl.ds(0, G)]
            rs_g = v[:, 0:4]
            pk_g = v[:, 4:8]
            rg = jnp.where(
                rs_g > 0.0, target * jax.lax.rsqrt(rs_g * invw), mg
            )
            pg = jnp.where(
                pk_g > 0.0, jnp.minimum(target / pk_g, mg), mg
            )
            des = jnp.maximum(jnp.minimum(rg, pg), floor_)
            x_scr[pl.ds(0, G)] = jnp.concatenate([des, des], axis=1)

            # serial pass 3: the dual-rate gain smoother, once per group
            def gain_loop(g_i, gv):
                dd = x_scr[g_i][0:4]
                speed = jnp.where(dd > gv, attG, relG)
                gv = jnp.clip(gv * speed + dd * (1.0 - speed), 0.1, mg)
                x_scr[g_i] = jnp.concatenate([gv, gv], axis=0)
                return gv

            if unroll:
                g = agc_carry[8:12]
                for _g in range(G):
                    g = gain_loop(_g, g)
            else:
                g = jax.lax.fori_loop(0, G, gain_loop, agc_carry[8:12])

            # pass 4 (vector): apply the group-staircase gains
            def apply_loop(g_i, _):
                gg = x_scr[g_i]
                y_scr[pl.ds(g_i * AG, AG)] = (
                    y_scr[pl.ds(g_i * AG, AG)] * gg[None]
                )
                return 0

            if unroll:
                for _g in range(G):
                    apply_loop(_g, 0)
            else:
                jax.lax.fori_loop(0, G, apply_loop, 0)
            agc_carry[0:4] = rs
            agc_carry[4:8] = pk
            agc_carry[8:12] = g
        else:
          # AW=4 balances fori overhead against Mosaic compile time (the
          # AW=8 unroll measured ~11 min of kernel compile through the
          # tunnel's AOT helper)
          AW = next(w for w in (4, 2, 1) if mto % w == 0)

          # stage A (vector, full-width): publish this step's squares and
          # precompute the per-sub-step RMS deltas d = sq - old into x_scr
          # (dead after the IIR), so the serial chain below carries only
          # the truly sequential ops. y*y == |y|*|y| in f32, and
          # rs + (sqv - old) reassociates nothing vs the per-sub-step
          # form. With a bf16 ring, the value ADDED to the running sum is
          # the same quantized value SUBTRACTED `lag` frames later (the
          # delta is formed from the quantized square), so the window sum
          # carries no drift — only a ~2^-9-relative per-sample noise on
          # the 8192-sample mean (documented AGC parity budget).
          #
          # rel0f/rel0b plans (round-5) store the ring in the PACKED
          # basis instead: row = (sq@ch0 | sq@ch0 + sq@ch1), i.e. the
          # (lo | lo+hi) form the rel0 plan's repack pass derives per
          # step — the packed deltas then come straight out of the
          # ring subtract and the repack pass vanishes. The enter =
          # leave invariant holds verbatim in this basis (the packed
          # values are what enter the running sum and what leave it
          # `lag` rows later), so the window still carries zero drift;
          # only the hi sub-step's quantization point moves (bf16 of
          # the frame sum vs sum of bf16 squares — same ~2^-9 noise
          # class on the 8192-sample mean).
          yv = y_scr[...]
          sqv = yv * yv
          packed_ring = (agc_rel0 == "rel0f"
                         or agc_rel0.startswith("rel0b")
                         or agc_rel0.startswith("rel0c"))
          if packed_ring:
              plo = sqv[:, 0:4]
              sqv = jnp.concatenate([plo, plo + sqv[:, 4:8]], axis=1)
          if ring_bf16:
              sqq = sqv.astype(jnp.bfloat16)
              sq_scr[wslot] = sqq
              sqf = sqq.astype(dtv)
          else:
              sq_scr[wslot] = sqv
              sqf = sqv
          x_scr[...] = sqf - old_scr[...].astype(dtv)

          if agc_rel0 == "rel0":
            # rel == 0 STRUCTURAL PLAN (the default AgcSettings has
            # release_time = 0, agc.rs:78, whose duration_to_coefficient
            # is exactly 0.0): two of the three serial chains vanish —
            #   peak:  pk' = max(xs, 0*pk + 1*xs) = xs  (memoryless);
            #   gain:  g' = clamp(min(d, att*g + (1-att)*d), 0.1, mg)
            #          — for d > g the affine term is <= d so min takes
            #          the att branch; for d < g it exceeds d so min
            #          takes d (the rel=0 branch); ties land within
            #          1 ulp of the reference's branch form. The upper
            #          clamp provably never binds (d <= mg and the
            #          affine mix of g, d <= mg stays <= mg).
            # Only the window sum (1 add/row) and the smoother stay
            # serial, and the desired-gain computer runs FULL-WIDTH per
            # row: the lo half carries the ch0 sub-step, the hi half
            # the ch1 sub-step — one rsqrt/div pass covers both phases.
            # stage A': repack d rows as (d0 | d0+d1) halves so one
            # vreg add yields both interleaved window sums
            dv = x_scr[...]
            dlo_all = dv[:, 0:4]
            x_scr[...] = jnp.concatenate(
                [dlo_all, dlo_all + dv[:, 4:8]], axis=1
            )
            catt = 1.0 - att

            def rel0_loop(t, carrs):
                rs2, g = carrs
                rsv = rs2 + x_scr[t]       # (rs@ch0 | rs@ch1)
                y = y_scr[t]
                ay = jnp.abs(y)
                rg = jnp.where(
                    rsv > 0.0, target * jax.lax.rsqrt(rsv * invw), mg
                )
                pg = jnp.where(
                    ay > 0.0, jnp.minimum(target / ay, mg), mg
                )
                des = jnp.maximum(jnp.minimum(rg, pg), floor_)
                dlo = des[0:4]
                g = jnp.maximum(0.1, jnp.minimum(dlo, att * g + catt * dlo))
                glo = g
                dhi = des[4:8]
                g = jnp.maximum(0.1, jnp.minimum(dhi, att * g + catt * dhi))
                y_scr[t] = y * jnp.concatenate([glo, g], axis=0)
                hi = rsv[4:8]
                return (jnp.concatenate([hi, hi], axis=0), g)

            rs0 = jnp.concatenate([agc_carry[0:4], agc_carry[0:4]], axis=0)
            if unroll:
                acc_r = (rs0, agc_carry[8:12])
                for _t in range(mto):
                    acc_r = rel0_loop(_t, acc_r)
                rs2, g = acc_r
            else:
                rs2, g = jax.lax.fori_loop(
                    0, mto, rel0_loop, (rs0, agc_carry[8:12])
                )
            agc_carry[0:4] = rs2[0:4]
            # peak rows 4:8 stay untouched (memoryless at rel = 0)
            agc_carry[8:12] = g
          elif agc_rel0 == "rel0f":
            # rel0f: the LEAN rel0 plan (round-5). Three reductions over
            # rel0, all inside the documented ulp-class AGC budget:
            #   1. PACKED ring basis (stage A above): the (lo | lo+hi)
            #      repack pass disappears — x_scr rows arrive as packed
            #      deltas. The hi-half window sum reassociates exactly
            #      like rel0's dlo+dhi pre-add did (ulp-class, tested).
            #   2. FOLDED desired gain: min(t*rsqrt(ms), min(t/|y|, mg))
            #      == min(t * rsqrt(max(ms, y*y)), mg) because rsqrt is
            #      monotone-decreasing and t/|y| = t*rsqrt(y*y) up to
            #      1 ulp — one rsqrt covers both the RMS and peak terms
            #      (the zero guard folds too: q <= 0 iff both terms are,
            #      since y*y >= 0). Saves the divide, a cmp/select pair,
            #      and the |y| pass (y*y == |y|*|y| bitwise).
            #   3. floor is pinned 0.0 (effects/agc.py) and rg/pg are
            #      built from non-negative factors, so max(des, floor)
            #      is an identity — dropped (NaN-free by construction:
            #      rsqrt(q>0) is finite).
            catt = 1.0 - att

            def rel0f_loop(t, carrs):
                rs2, g = carrs
                rsv = rs2 + x_scr[t]       # packed (rs@ch0 | rs@ch1)
                y = y_scr[t]
                q = jnp.maximum(rsv * invw, y * y)
                des = jnp.where(
                    q > 0.0,
                    jnp.minimum(target * jax.lax.rsqrt(q), mg), mg,
                )
                dlo = des[0:4]
                g = jnp.maximum(0.1, jnp.minimum(dlo, att * g + catt * dlo))
                glo = g
                dhi = des[4:8]
                g = jnp.maximum(0.1, jnp.minimum(dhi, att * g + catt * dhi))
                y_scr[t] = y * jnp.concatenate([glo, g], axis=0)
                hi = rsv[4:8]
                return (jnp.concatenate([hi, hi], axis=0), g)

            rs0 = jnp.concatenate([agc_carry[0:4], agc_carry[0:4]], axis=0)
            if unroll:
                acc_r = (rs0, agc_carry[8:12])
                for _t in range(mto):
                    acc_r = rel0f_loop(_t, acc_r)
                rs2, g = acc_r
            else:
                rs2, g = jax.lax.fori_loop(
                    0, mto, rel0f_loop, (rs0, agc_carry[8:12])
                )
            agc_carry[0:4] = rs2[0:4]
            # peak rows 4:8 stay untouched (memoryless at rel = 0)
            agc_carry[8:12] = g
          elif agc_rel0.startswith("rel0b") or agc_rel0.startswith("rel0c"):
            # rel0b: BLOCKED PARALLEL-IN-TIME rel0 smoother (round-5,
            # VERDICT r4 ask #1). Each rel0 smoother step is
            #   f_i(g) = min(H_i, max(0.1, att*g + B_i)),
            #   B_i = (1-att)*d_i,  H_i = max(0.1, d_i)
            # — a clamp-of-affine with CONSTANT slope att, closed under
            # composition:  f2(f1(g)) = min(H', max(L', att^2 g + B'))
            #   B' = att*B1 + B2
            #   L' = max(0.1, att*L1 + B2)
            #   H' = min(H2, max(0.1, att*H1 + B2))
            # (identity on the reachable gain domain [0.1, mg] is
            # (B=0, L=0, H=mg)). The mto-row step splits into RPC = 8
            # chunks of R rows: per-chunk prefix maps compose in
            # parallel across chunks (pass 2), an 8-step boundary pass
            # threads g through the chunk maps (pass 3), and the gains
            # reconstruct as g_j = min(H_j, max(L_j, att^j g0 + B_j))
            # (pass 4). Sequential depth drops ~RPC-fold — but on the
            # fused farm every lane/sublane is already occupied by
            # streams (unlike ops/limiter_block.py, whose 11x came
            # from parking time chunks on 126 FREE lanes), so blocking
            # only re-shapes the op stream, it cannot shrink it: per
            # sub-step the compose+apply costs ~9 vreg-ops vs the
            # direct smoother's ~4. MEASURED (round-5): the blocked
            # form WINS anyway (+4.7% farm at RPC=8/int2/T=7680,
            # 275.2 vs 288.1 us/block interleaved) — the serial rel0
            # loop is STALL-bound on the smoother's ~8-op dependency
            # chain (in-order VPU), not issue-bound; rel0f's −5
            # ops/row measured a 0.0% wash, which is the same
            # diagnosis. Blocking trades issue slots for chain depth.
            tiled = agc_rel0.startswith("rel0c")
            RPC = (int(agc_rel0[5:]) if len(agc_rel0) > 5
                   else (16 if tiled else 8))
            assert mto % RPC == 0, f"{agc_rel0} needs {RPC} | m*to"
            R = mto // RPC
            catt = 1.0 - att

            if tiled:
                # rel0c (round-5, extends rel0b): the two remaining
                # mto-step serial row loops — the window running sum
                # (pass 0) and the gain apply (pass 5) — become
                # chunk-parallel TILE passes, so every serial stage now
                # steps over [RPC, 8, 128] tiles (or the tiny boundary
                # rows), never single rows:
                #   A. one full-array relayout puts the packed deltas in
                #      the transposed (position-major) basis;
                #   P. R tile steps compute per-chunk LOCAL window sums
                #      (a blocked prefix over the packed hi halves —
                #      rsv = (R_prev + dlo | R_prev + dlo + dhi), so
                #      only the hi half carries the recurrence);
                #   B. RPC boundary steps turn the chunk totals into
                #      per-chunk base offsets (exclusive prefix on top
                #      of the window carry);
                #   C. one full-width pass adds the offsets, computes
                #      the folded desired gain (one rsqrt over all
                #      mto rows at once), and emits the B/H maps.
                # The window sum reassociates per chunk (base + local
                # vs strictly serial) — the same ulp class as the
                # blocked smoother composition, inside the documented
                # AGC budget.
                def t_nat2tr(v):
                    return v.reshape(RPC, R, 8, 128).transpose(
                        1, 0, 2, 3).reshape(mto, 8, 128)

                def t_tr2nat(v):
                    return v.reshape(R, RPC, 8, 128).transpose(
                        1, 0, 2, 3).reshape(mto, 8, 128)

                tr_a[...] = t_nat2tr(x_scr[...])

                def relc_prefix(r, acc):
                    sl = pl.ds(r * RPC, RPC)
                    v = tr_a[sl]
                    lo = acc + v[:, 0:4]
                    acc = acc + v[:, 4:8]
                    tr_a[sl] = jnp.concatenate([lo, acc], axis=1)
                    return acc

                z4c = jnp.zeros((RPC, 4, 128), dtv)
                if unroll:
                    accp = z4c
                    for _r in range(R):
                        accp = relc_prefix(_r, accp)
                else:
                    accp = jax.lax.fori_loop(0, R, relc_prefix, z4c)

                def relc_off(c, base):
                    gb_scr[c] = jnp.concatenate([base, base], axis=0)
                    return base + accp[c]

                if unroll:
                    bse = agc_carry[0:4]
                    for _c in range(RPC):
                        bse = relc_off(_c, bse)
                else:
                    bse = jax.lax.fori_loop(
                        0, RPC, relc_off, agc_carry[0:4]
                    )
                agc_carry[0:4] = bse

                off = gb_scr[...]
                rsv_t = tr_a[...] + jnp.broadcast_to(
                    off[None], (R, RPC, 8, 128)).reshape(mto, 8, 128)
                yt = t_nat2tr(y_scr[...])
                q = jnp.maximum(rsv_t * invw, yt * yt)
                des = jnp.where(
                    q > 0.0,
                    jnp.minimum(target * jax.lax.rsqrt(q), mg), mg,
                )
                tr_a[...] = catt * des
                tr_b[...] = jnp.maximum(0.1, des)
            else:
                # pass 0 (serial): running sums; elementwise smoother-map
                # params (B, H) land TRANSPOSED (row t -> trans row
                # (t % R) * RPC + t // R) so pass 2 reads [RPC, 8, 128]
                # contiguous slices per within-chunk position.
                def rel0b_p0(t, rs2):
                    rsv = rs2 + x_scr[t]
                    y = y_scr[t]
                    q = jnp.maximum(rsv * invw, y * y)
                    des = jnp.where(
                        q > 0.0,
                        jnp.minimum(target * jax.lax.rsqrt(q), mg), mg,
                    )
                    if isinstance(t, int):
                        ti = (t % R) * RPC + t // R
                    else:
                        ti = jax.lax.rem(t, R) * RPC + jax.lax.div(t, R)
                    tr_a[ti] = catt * des
                    tr_b[ti] = jnp.maximum(0.1, des)
                    hi = rsv[4:8]
                    return jnp.concatenate([hi, hi], axis=0)

                rs0 = jnp.concatenate(
                    [agc_carry[0:4], agc_carry[0:4]], axis=0
                )
                if unroll:
                    for _t in range(mto):
                        rs0 = rel0b_p0(_t, rs0)
                else:
                    rs0 = jax.lax.fori_loop(0, mto, rel0b_p0, rs0)
                agc_carry[0:4] = rs0[0:4]

            # pass 2: within-chunk prefix composition, all chunks at
            # once ([RPC, ...] slices; lo half then hi half per row).
            def rel0b_p2(j, acc):
                Bc, Lc_, Hc = acc
                sl = pl.ds(j * RPC, RPC)
                vB = tr_a[sl]
                vH = tr_b[sl]
                bl, bh = vB[:, 0:4], vB[:, 4:8]
                Bl = att * Bc + bl
                Ll = jnp.maximum(0.1, att * Lc_ + bl)
                Hl = jnp.minimum(vH[:, 0:4],
                                 jnp.maximum(0.1, att * Hc + bl))
                Bh = att * Bl + bh
                Lh = jnp.maximum(0.1, att * Ll + bh)
                Hh = jnp.minimum(vH[:, 4:8],
                                 jnp.maximum(0.1, att * Hl + bh))
                tr_a[sl] = jnp.concatenate([Bl, Bh], axis=1)
                tr_b[sl] = jnp.concatenate([Hl, Hh], axis=1)
                tr_c[sl] = jnp.concatenate([Ll, Lh], axis=1)
                return (Bh, Lh, Hh)

            z4 = jnp.zeros((RPC, 4, 128), dtv)
            acc2 = (z4, z4, z4 + mg)
            if unroll:
                for _j in range(R):
                    acc2 = rel0b_p2(_j, acc2)
            else:
                acc2 = jax.lax.fori_loop(0, R, rel0b_p2, acc2)

            # pass 3 (serial over the RPC chunks): thread g through the
            # chunk-total maps; park each chunk's carry-in gain in gb.
            attR = _ipow(att, 2 * R)

            def rel0b_p3(c, g):
                gb_scr[c] = jnp.concatenate([g, g], axis=0)
                row = (R - 1) * RPC + c
                v = tr_a[row][4:8]
                L = tr_c[row][4:8]
                H = tr_b[row][4:8]
                return jnp.minimum(H, jnp.maximum(L, attR * g + v))

            g = agc_carry[8:12]
            if unroll:
                for _c in range(RPC):
                    g = rel0b_p3(_c, g)
            else:
                g = jax.lax.fori_loop(0, RPC, rel0b_p3, g)
            agc_carry[8:12] = g

            # pass 4: reconstruct every sub-step's gain from its chunk's
            # carry-in (att^j powers advance as scalar data each step —
            # the same f32 mults the serial smoother would issue).
            g0c = gb_scr[...][:, 0:4]

            def rel0b_p4(j, ap):
                sl = pl.ds(j * RPC, RPC)
                B = tr_a[sl]
                L = tr_c[sl]
                H = tr_b[sl]
                ap2 = ap * att
                glo = jnp.minimum(
                    H[:, 0:4],
                    jnp.maximum(L[:, 0:4], ap * g0c + B[:, 0:4]),
                )
                ghi = jnp.minimum(
                    H[:, 4:8],
                    jnp.maximum(L[:, 4:8], ap2 * g0c + B[:, 4:8]),
                )
                tr_a[sl] = jnp.concatenate([glo, ghi], axis=1)
                return ap2 * att

            ap0 = att + jnp.zeros((), dtv)
            if unroll:
                ap = ap0
                for _j in range(R):
                    ap = rel0b_p4(_j, ap)
            else:
                jax.lax.fori_loop(0, R, rel0b_p4, ap0)

            # pass 5: apply the gains.
            if tiled:
                # one full-width multiply after relayout to row order
                y_scr[...] = y_scr[...] * t_tr2nat(tr_a[...])
            else:
                def rel0b_p5(t, _):
                    if isinstance(t, int):
                        ti = (t % R) * RPC + t // R
                    else:
                        ti = jax.lax.rem(t, R) * RPC + jax.lax.div(t, R)
                    y_scr[t] = y_scr[t] * tr_a[ti]
                    return 0

                if unroll:
                    for _t in range(mto):
                        rel0b_p5(_t, 0)
                else:
                    jax.lax.fori_loop(0, mto, rel0b_p5, 0)
          else:
            # serial stage (agc.rs:397-496): running-sum + peak chains
            # with the desired-gain computer hoisted per AW-group, then
            # the data-dependent gain smoother. (A fully vectorized des
            # phase with per-sub-step rs/pk scratches was measured
            # SLOWER: its VMEM forced the chunk-DMA pipeline to 2-deep,
            # losing more to DMA serialization than the half-vreg des
            # ops cost.)
            crel = 1.0 - rel

            def agc_loop(i, carrs):
                rs, pk, g = carrs
                t0 = i * AW
                vals = []
                for j in range(AW):
                    d = x_scr[t0 + j]
                    y = y_scr[t0 + j]
                    for c in (0, 1):
                        xs = jnp.abs(y[4 * c : 4 * c + 4])
                        rs = rs + d[4 * c : 4 * c + 4]
                        pk = jnp.maximum(xs, rel * pk + crel * xs)
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
                        dd = des[2 * j + c]
                        speed = jnp.where(dd > g, att, rel)
                        g = g * speed + dd * (1.0 - speed)
                        g = jnp.clip(g, 0.1, mg)
                        y_scr[t0 + j, 4 * c : 4 * c + 4] = (
                            y[4 * c : 4 * c + 4] * g
                        )
                return (rs, pk, g)

            if unroll:
                acc_a = (agc_carry[0:4], agc_carry[4:8], agc_carry[8:12])
                for _i in range(mto // AW):
                    acc_a = agc_loop(_i, acc_a)
                rs, pk, g = acc_a
            else:
                rs, pk, g = jax.lax.fori_loop(
                    0, mto // AW, agc_loop,
                    (agc_carry[0:4], agc_carry[4:8], agc_carry[8:12]),
                )
            agc_carry[0:4] = rs
            agc_carry[4:8] = pk
            agc_carry[8:12] = g

        # publish this step's squares into the ring
        wcp = pltpu.make_async_copy(
            sq_scr.at[wslot],
            ring_ref.at[jax.lax.rem(gstep, rs_slots)],
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
                    ring_ref.at[jax.lax.rem(gstep - 1 + rs_slots,
                                             rs_slots)],
                    wsems.at[jax.lax.rem(t_idx + 1, 2)],
                ).wait()

        @pl.when(t_idx == n_t - 1)
        def _store_agc():
            out_agc_ref[...] = agc_carry[...]

    # 4: gain + stream-axis mix as one matmul
    y_t = y_scr[...].reshape(mto, LANES)
    if binary_mix:
        # the gains are FOLDED INTO THE PCM at init, so mixt is a 0/1
        # selection matrix — exactly representable in bf16. Splitting y
        # into three exact bf16 pieces (24 mantissa bits) then makes
        # every product of the three DEFAULT-precision passes exact:
        # the result equals the f32 dot to 1 ulp at ~1/4 the cost of a
        # HIGHEST (6-pass, both-operand-split) matmul.
        mb = mixt_ref[...]

        def _dot2(a):
            # 2-piece exact-product split: residual < 2^-18 relative per
            # lane value. The gains are folded into the data, so lane
            # values carry ~1/S scale and the summed mix error stays
            # ~1e-7 absolute — well inside the 1e-6 contract, at half
            # the split cost of a full 3-piece (24-bit) split.
            p1 = a.astype(jnp.bfloat16)
            p2 = (a - p1.astype(a.dtype)).astype(jnp.bfloat16)
            return (
                jnp.dot(p1, mb, preferred_element_type=a.dtype)
                + jnp.dot(p2, mb, preferred_element_type=a.dtype)
            )

        mix = _dot2(y_t)
        if subblk and mto // subblk > 1:
            # rank-2(G-1) boundary correction riding the mix: the
            # per-row sub-block corrections alpha[t] p1_g + beta[t] p2_g
            # contribute ab[row, :] @ (corr @ M) to the mix — two tiny
            # matmuls instead of a full-width correction pass
            R = _dot2(corr_scr[...].reshape(corr_scr.shape[0], LANES))
            mix = mix + jnp.dot(
                ab_ref[...], R, preferred_element_type=y_t.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
    else:
        mix = jnp.dot(y_t, mixt_ref[...], preferred_element_type=y_t.dtype,
                      precision=jax.lax.Precision.HIGHEST)  # [m*to, 8]
        if subblk and mto // subblk > 1:
            R = jnp.dot(
                corr_scr[...].reshape(corr_scr.shape[0], LANES),
                mixt_ref[...], preferred_element_type=y_t.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            mix = mix + jnp.dot(
                ab_ref[...], R, preferred_element_type=y_t.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

    # 5 (optional): the master-bus limiter as the kernel epilogue
    # (src/source/limit.rs:854-988; the blocked parallel-in-time plan of
    # ops/limiter_block.py restructured PER GRID STEP). Folding it here
    # removes the separate dispatch plus the XLA transposes around it —
    # measured ~20 us/block at T=4160, vs ~1-2 us for this epilogue.
    # Layout: P_l time-chunks on lanes, channels on sublanes; all
    # Lc-deep local prefix loops UNROLLED into registers (Lc <= 16).
    if limiter is not None:
        att_l, rel_l, thr_l, kw_l, ik8_l = limiter
        P_l = 1
        while P_l * 2 <= 128 and mto % (P_l * 2) == 0:
            P_l *= 2
        Lc = mto // P_l
        assert Lc <= 16, "in-kernel limiter needs mto = Lc*P with Lc<=16"
        cr_l = 1.0 - rel_l
        ca_l = 1.0 - att_l
        tiny = float(np.finfo(np.float32).tiny)
        dtm = mix.dtype

        @pl.when(t_idx == 0)
        def _load_lim():
            limc[:, 0:2] = lim_ref[...]

        # [mto, 8] -> [Lc, 8, 128]: chunk p on lane p, channel on
        # sublane (time t = p*Lc + tl); lanes >= P_l are padding whose
        # garbage gains are sliced away before the inverse transpose
        x3 = jnp.pad(
            mix.reshape(P_l, Lc, 8).transpose((1, 2, 0)),
            ((0, 0), (0, 0), (0, 128 - P_l)),
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def gain_db(v):
            bias_db = (log2_precise(jnp.abs(v) + tiny)
                       * (LOG10_2 * 20.0) - thr_l)
            kb = bias_db * 2.0
            xk = kb + kw_l
            quad = xk * xk * ik8_l
            return jnp.where(
                kb < -kw_l, 0.0,
                jnp.where(jnp.abs(kb) <= kw_l, quad, bias_db),
            )

        bs, cs = [], []
        B = jnp.full((8, 128), -3.0e38, dtm)
        Cc = jnp.zeros((8, 128), dtm)
        for tl in range(Lc):
            d = gain_db(x3[tl])
            B = jnp.maximum(d, rel_l * B + cr_l * d)
            Cc = rel_l * Cc + cr_l * d
            bs.append(B)
            cs.append(Cc)

        A1 = jnp.full((8, 128), rel_l ** Lc, dtm)
        B1, C1 = bs[-1], cs[-1]
        k = 1
        while k < P_l:
            As_ = pltpu.roll(A1, k, 1)
            Bs_ = pltpu.roll(B1, k, 1)
            Cs_ = pltpu.roll(C1, k, 1)
            mk = lane >= k
            B1 = jnp.where(mk, jnp.maximum(B1, A1 * Bs_ + C1), B1)
            C1 = jnp.where(mk, A1 * Cs_ + C1, C1)
            A1 = jnp.where(mk, A1 * As_, A1)
            k *= 2
        zero8 = jnp.zeros((8, 128), dtm)
        i0 = limc[:, 0:1]
        As_ = pltpu.roll(A1, 1, 1)
        Bs_ = pltpu.roll(B1, 1, 1)
        Cs_ = pltpu.roll(C1, 1, 1)
        v_integ = jnp.where(
            lane == 0, i0 + zero8, jnp.maximum(Bs_, As_ * i0 + Cs_)
        )

        cps = []
        Cp = zero8
        for tl in range(Lc):
            integ = jnp.maximum(
                bs[tl], (rel_l ** (tl + 1)) * v_integ + cs[tl]
            )
            Cp = att_l * Cp + ca_l * integ
            cps.append(Cp)

        A2 = jnp.full((8, 128), att_l ** Lc, dtm)
        C2 = cps[-1]
        k = 1
        while k < P_l:
            As_ = pltpu.roll(A2, k, 1)
            Cs_ = pltpu.roll(C2, k, 1)
            mk = lane >= k
            C2 = jnp.where(mk, A2 * Cs_ + C2, C2)
            A2 = jnp.where(mk, A2 * As_, A2)
            k *= 2
        p0 = limc[:, 1:2]
        As_ = pltpu.roll(A2, 1, 1)
        Cs_ = pltpu.roll(C2, 1, 1)
        v_peak = jnp.where(lane == 0, p0 + zero8, As_ * p0 + Cs_)

        # gains + the rodio stereo coupling (ch0 pairs the fresh ch0
        # peak with ch1's PREVIOUS-sample peak; ch1 sees both fresh)
        prev = v_peak
        ys = []
        for tl in range(Lc):
            peak = (att_l ** (tl + 1)) * v_peak + cps[tl]
            mp = jnp.maximum(
                peak[0:1, :], jnp.where(sub == 0, prev[1:2, :], peak)
            )
            ys.append(x3[tl] * exp2_precise(mp * (-0.05 * LOG2_10)))
            prev = peak

        # carries: the step's true last sample = (tl = Lc-1, lane P_l-1)
        integ_last = jnp.maximum(
            bs[Lc - 1], (rel_l ** Lc) * v_integ + cs[Lc - 1]
        )
        limc[:, 0:1] = integ_last[:, P_l - 1 : P_l]
        limc[:, 1:2] = prev[:, P_l - 1 : P_l]

        mix = (jnp.stack(ys, axis=0)[:, :, :P_l]
               .transpose((2, 0, 1)).reshape(mto, 8))

        @pl.when(t_idx == n_t - 1)
        def _store_lim():
            out_lim_ref[...] = limc[:, 0:2]

    out_ref[...] = mix[None]

    @pl.when(t_idx == n_t - 1)
    def _store_state():
        out_state_ref[...] = carry[...].reshape(4, LANES).T


def build_fused_operator(g0, g1, coeffs, *, fr: int, to: int, m: int,
                         fr_p: int, npc: int, precision: str,
                         lookahead: int, subblk: int = 0,
                         bfold: bool = False, firfold: bool = False,
                         ufir: bool = False,
                         wsplit: bool = False, dt=jnp.float32,
                         coeffs_static: tuple = None):
    """Derive the kernel's COEFF-DEPENDENT constants: the packed SMEM
    coefficient vector ``c`` (look-ahead / u-form rows), the staged
    resample weight matrix ``g0t`` (FIR-folded when ``firfold``) and the
    subblk correction matrix ``ab``. Callers hold the result in their
    STATE and pass it to the fused entries as the ``op`` argument:
    retune = recompute here (host, once per knob change) + swap into the
    state — zero re-trace AND zero per-block rebuild cost (an earlier
    design derived these inside the per-block emit, which put ~60 scalar
    ops and the weight build inside the render scan body)."""
    int3 = npc > 1
    mto = m * to
    assert precision not in ("i8", "i24") or (
        int3 and bfold and not firfold), (
        "i8/i24 are int8-piece bfold layouts; firfold has its own "
        "weight stacking"
    )
    b0, b1, b2, a1, a2 = (jnp.asarray(v, dt) for v in coeffs)

    # -- biquad SMEM constants: either the blocked-IIR homogeneous
    # responses (subblk) or the scattered look-ahead coefficient rows --
    if subblk:
        # blocked-IIR constants: homogeneous responses of the recurrence
        # y[t] = -a1 y[t-1] - a2 y[t-2] to unit boundary values —
        # alpha for y[-1] = 1, beta for y[-2] = 1 (f32, same arithmetic
        # the sequential recurrence would produce). This opt-in path
        # derives them with HOST numpy, so it needs concrete coeffs
        # (the default paths accept traced coeffs = live retune).
        assert coeffs_static is not None, (
            "subblk requires coeffs_static (concrete biquad coefficients)"
        )
        assert mto % subblk == 0 and subblk >= 4
        L = subblk
        G = mto // L
        assert G <= 8, "interleave depth capped at 8 chains"
        _a1 = np.float32(coeffs_static[3])
        _a2 = np.float32(coeffs_static[4])
        alpha = np.zeros(L, np.float32)
        beta = np.zeros(L, np.float32)
        pa1, pa2 = np.float32(1.0), np.float32(0.0)   # y[-1], y[-2]
        pb1, pb2 = np.float32(0.0), np.float32(1.0)
        for t in range(L):
            alpha[t] = -_a1 * pa1 - _a2 * pa2
            beta[t] = -_a1 * pb1 - _a2 * pb2
            pa2, pa1 = pa1, alpha[t]
            pb2, pb1 = pb1, beta[t]
        packed = [b0, b1, b2, a1, a2,
                  jnp.asarray(alpha[L - 1], dt), jnp.asarray(alpha[L - 2], dt),
                  jnp.asarray(beta[L - 1], dt), jnp.asarray(beta[L - 2], dt)]
        # AB[g*L + t, 2(g-1)] = alpha[t], AB[g*L + t, 2(g-1)+1] = beta[t]
        # for g >= 1 (chain 0 is seeded with the true carry)
        CP = max(2 * (G - 1), 2)
        ab_np = np.zeros((mto, CP), np.float32)
        for g in range(1, G):
            ab_np[g * L : (g + 1) * L, 2 * (g - 1)] = alpha
            ab_np[g * L : (g + 1) * L, 2 * (g - 1) + 1] = beta
        ab = jnp.asarray(ab_np, dt)
    elif firfold or ufir:
        # u-form look-ahead rows (shared by firfold and ufir): with the
        # FIR out of the loop the kernel runs the PURE 2-term IIR
        #   y[t] = u[t] - a1 y[t-1] - a2 y[t-2]
        # Unrolled LA-deep, output k is expressed in the iteration-entry
        # state as
        #   y[t+k] = u[t+k] + sum_{j=1..k} g_j u[t+k-j] + alpha_k y1
        #            + beta_k y2
        # (leading u coefficient is 1 — one add, no multiply), so each
        # group of LA outputs costs ~(k+2) FMAs per output instead of the
        # (k+4)-term rows of the full-biquad unrolling.
        LA = max(abs(lookahead), 1)
        W = LA + 2  # basis: u[t+LA-1], ..., u[t], y[t-1], y[t-2]
        zero = jnp.zeros((), dt)
        one = jnp.ones((), dt)

        def u_unit(j):  # basis vector for u[t+j], j in [0, LA-1]
            v = [zero] * W
            v[LA - 1 - j] = one
            return v

        def madd(*pairs):
            out = [zero] * W
            for coef, vec in pairs:
                out = [o + coef * e for o, e in zip(out, vec)]
            return out

        y_p1 = [zero] * LA + [one, zero]     # y[t-1]
        y_p2 = [zero] * (LA + 1) + [one]     # y[t-2]
        packed = [b0, b1, b2, a1, a2]
        for k in range(LA):
            row = madd((-a1, y_p1), (-a2, y_p2))
            if k >= 1:
                # [g_1..g_k, alpha_k, beta_k] — k+2 coefficients (row 0
                # uses a1/a2 from the base slots directly)
                packed.extend(row[LA - k : LA + 2])
            y_full = madd((one, row), (one, u_unit(k)))
            y_p2 = y_p1
            y_p1 = y_full
        CP = 2
        ab = jnp.zeros((mto, CP), dt)
    else:
        # look-ahead coefficient rows: y[t+k] = b0 x[t+k] + row_k . basis
        # with basis = (x[t+LA-2], ..., x[t], x[t-1], x[t-2], y[t-1],
        # y[t-2]), derived by unrolling the recurrence into itself. Row k
        # has k+4 meaningful coefficients (x[t+k-1..t], x1, x2, y1, y2).
        LA = max(abs(lookahead), 2)
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
        CP = 2
        ab = jnp.zeros((mto, CP), dt)
    n_smem = -(-len(packed) // 8) * 8
    c = jnp.stack(packed + [jnp.zeros((), dt)] * (n_smem - len(packed)))

    # -- resample weight layout (shared by both biquad modes) --
    if firfold:
        # FIR-folded operator W = F . G0: row t of the stacked weight
        # matrix is b0 g0[t] + b1 g0[t-1] + b2 g0[t-2] (rows < 0 zero —
        # the kernel adds the carried-tail terms to rows 0/1), INCLUDING
        # the boundary column (padding row fr carries the next chunk's
        # first frame, bfold layout), so ONE dot emits the biquad's
        # whole FIR half; two extra rows emit the RAW resampled tail
        # frames [to-2, to-1] the next chunk's fixup and the carried
        # x-history state need. The f32 weights are split into three
        # exact bf16 pieces stacked along the output axis (every
        # product of the DEFAULT-precision dot exact, f32-accumulated);
        # tiled npc-x along the contraction axis to match the stacked
        # PCM pieces.
        w0 = jnp.pad(jnp.asarray(g0, dt).T, ((0, 0), (0, fr_p - fr)))
        w0 = w0.at[:, fr].set(jnp.asarray(g1, dt))
        zrow = jnp.zeros((1, fr_p), dt)
        wf = (b0 * w0
              + b1 * jnp.concatenate([zrow, w0[:-1]], axis=0)
              + b2 * jnp.concatenate([zrow, zrow, w0[:-2]], axis=0))
        stack = jnp.concatenate([wf, w0[to - 2 : to]], 0)  # [to+2, fr_p]
        # pad each piece group to an 8-row multiple so the kernel's
        # accumulator slices land on sublane-aligned offsets (misaligned
        # row slices force Mosaic relayouts that dwarf the MXU cost)
        to2p = -(-(to + 2) // 8) * 8
        stack = jnp.pad(stack, ((0, to2p - (to + 2)), (0, 0)))
        wp1 = stack.astype(jnp.bfloat16)
        res = stack - wp1.astype(dt)
        wp2 = res.astype(jnp.bfloat16)
        wp3 = (res - wp2.astype(dt)).astype(jnp.bfloat16)
        g0t = jnp.concatenate([wp1, wp2, wp3], axis=0)  # [3*to2p, fr_p]
        g0t = jnp.concatenate([g0t] * npc, axis=1)
    elif int3:
        # integer-scaled lerp weights: g0*to has entries in [0, to],
        # exactly representable in bf16 for to <= 256 (split 4*hi+lo
        # above that); tiled npc-x along the contraction axis to match
        # the stacked bf16 pieces
        wint = jnp.rint(jnp.asarray(g0, dt) * to).T        # [to, fr]
        wint = jnp.pad(wint, ((0, 0), (0, fr_p - fr)))
        if bfold:
            assert fr_p > fr, "bfold needs an int-piece padding row"
            # boundary frame lives in padding row fr of each chunk; its
            # weight column is the (integer-exact) g1 * to
            wint = wint.at[:, fr].set(jnp.rint(jnp.asarray(g1, dt) * to))
        if wsplit:
            w_hi = jnp.floor(wint / 4.0)
            w_lo = wint - 4.0 * w_hi
            g1w = jnp.concatenate([w_hi, w_lo], axis=0)   # [2*to, fr_p]
        else:
            g1w = wint
        if precision == "i8":
            # i8 byte pieces: the PCM is k/2^15 with k int16, stored as
            # hi = k >> 8 and lo_c = (k & 255) - 128, both int8 (half
            # the chunk bytes of the bf16 int2 pieces). The single dot
            # reconstructs sum(w * k) with every PRODUCT exact and an
            # f32 accumulator (so <= 1 ulp once |sum w*k| exceeds 2^24
            # — possible at to > 512 full-scale; ADVICE r4 #1):
            #   tile0 = W * 2^8 (exact in bf16 — a pure exponent shift
            #   of the <= 256 integer weights) against the hi piece,
            #   tile1 = W against lo_c, and the lo byte's +128 offset
            #   (sum_cols w = to per output row, boundary included via
            #   the bfold column) rides TWO bias columns fr+1 / fr+2 of
            #   tile1 whose weights split B = 128*to into exact bf16
            #   pieces, against constant-1 operand rows the wrapper
            #   plants in the chunks. Zero extra kernel ops; the only
            #   change downstream is the final scale 1/(to*2^15).
            assert bfold, "i8 needs the bfold layout (rowsum = to)"
            assert fr_p >= fr + 3, "i8 needs two bias padding rows"
            B = np.float64(128.0) * to
            pB = float(jnp.asarray(np.float32(B), jnp.bfloat16))
            rB = np.float32(B - pB)
            rows = slice(to, 2 * to) if wsplit else slice(0, to)
            t1 = g1w.at[rows, fr + 1].set(pB).at[rows, fr + 2].set(rB)
            t0 = g1w * 256.0
            g0t = jnp.concatenate(
                [t0.astype(jnp.bfloat16), t1.astype(jnp.bfloat16)],
                axis=1,
            )
        elif precision == "i24":
            # i24 byte pieces (round-5, VERDICT r4 ask #5): the PCM is
            # k/2^23 with k int24, stored as b2 = k >> 16,
            # b1 = ((k >> 8) & 255) - 128, b0 = (k & 255) - 128 — three
            # int8 pieces (3 B/sample of chunk DMA: half int3's bf16
            # bytes, 3/4 of int2's) reconstructing
            # k = 2^16 b2 + 2^8 b1 + b0 + 128*(2^8 + 1). One dot over
            # the three tiles [W*2^16 | W*2^8 | W+bias] computes
            # sum(w*k): every product exact (piece magnitudes <= 2^15
            # before the exponent-shift scales), f32-accumulated (the
            # cross-scale sum rounds to <= 1 ulp relative — the same
            # class as the i8 layout past 2^24; within the documented
            # ~5e-7 parity budget). The +128*(257) bias rides THREE
            # bias columns fr+1..fr+3 of the b0 tile (B = 128*257*to
            # needs up to 24 mantissa bits -> exact 3-way bf16 split)
            # against constant-1 operand rows the wrapper plants in the
            # b0 piece. Downstream the only change is the 1/(to*2^23)
            # output scale.
            assert bfold, "i24 needs the bfold layout (rowsum = to)"
            assert fr_p >= fr + 4, "i24 needs three bias padding rows"
            B = np.float64(128.0) * 257.0 * to
            p1B = float(jnp.asarray(np.float32(B), jnp.bfloat16))
            r1B = np.float64(B) - p1B
            p2B = float(jnp.asarray(np.float32(r1B), jnp.bfloat16))
            r2B = np.float64(r1B) - p2B
            p3B = float(jnp.asarray(np.float32(r2B), jnp.bfloat16))
            assert r2B == p3B, "i24 bias must split into 3 bf16 pieces"
            rows = slice(to, 2 * to) if wsplit else slice(0, to)
            t0 = (g1w.at[rows, fr + 1].set(p1B)
                  .at[rows, fr + 2].set(p2B)
                  .at[rows, fr + 3].set(p3B))
            g0t = jnp.concatenate(
                [(g1w * 65536.0).astype(jnp.bfloat16),
                 (g1w * 256.0).astype(jnp.bfloat16),
                 t0.astype(jnp.bfloat16)],
                axis=1,
            )
        else:
            g0t = jnp.concatenate([g1w.astype(jnp.bfloat16)] * npc, axis=1)
    else:
        assert not bfold, "bfold requires an int-piece layout"
        g0t = jnp.pad(jnp.asarray(g0, dt).T, ((0, 0), (0, fr_p - fr)))
    return dict(c=c, g0t=g0t, ab=ab)


def fused_layout(chunks, *, to: int, m: int, firfold: bool = False,
                 subblk: int = 0):
    """Static layout facts derived from the chunk buffer shape:
    (int3, Nc, npc, fr_p, wsplit). int8 chunk dtype selects the "i8"
    byte-piece layout (npc = 2 int8 pieces, half the chunk DMA bytes of
    the bf16 int2 pieces)."""
    int3 = chunks.ndim == 4
    if int3:
        Nc, npc, fr_p, _ = chunks.shape
        i8 = chunks.dtype == jnp.int8
        assert npc in (2, 3) and (i8 or chunks.dtype == jnp.bfloat16)
        # int8 pieces: npc=2 is the 16-bit "i8" layout, npc=3 the
        # 24-bit "i24" layout (round-5; still fewer chunk bytes than
        # the 2-piece bf16 int2 layout: 3 B/sample vs 4)
        assert to <= 1024, "int-piece path requires integer weights <= 1024"
        # the i8 layout's halved xraw scratch frees enough scoped VMEM
        # for a fourth chunk per grid step — validated at to <= 160
        # (m*to <= 640, the flagship ratio); larger `to` at m = 4 can
        # exceed the 16 MB scoped-VMEM limit with an opaque Mosaic
        # error, so the envelope is asserted here (ADVICE r4 #3)
        assert m <= (4 if i8 and npc == 2 and m * to <= 640 else 3), (
            "int-piece m exceeds the 16MB VMEM budget "
            f"(m={m}, to={to}; i8 m=4 is validated for m*to <= 640)"
        )
        # weights <= 256 are bf16-exact directly; above that the integer
        # operator splits as w = 4*hi + lo (hi <= to/4 <= 256, lo <= 3,
        # both exact) and the kernel recombines the two accumulator
        # halves — the exact single-pass trick at ANY rational ratio.
        # firfold sidesteps the split: its weights are f32 split into
        # three exact bf16 pieces, so any magnitude rides the same dot.
        wsplit = to > 256 and not firfold
        assert not wsplit or m * to <= 1280, "to > 256 needs m = 1"
    else:
        Nc, fr_p, _ = chunks.shape
        npc = 1
        wsplit = False
    return int3, Nc, npc, fr_p, wsplit


def _prepare(chunks, c0, xn_t, g0, g1, mixmat, coeffs, bq_state,
             *, fr: int, to: int, m: int, precision: str, lookahead: int,
             subblk: int = 0, binary_mix: bool = False,
             bfold: bool = False, firfold: bool = False,
             ufir: bool = False,
             coeffs_static: tuple = None, op=None):
    """Shared per-call prep: layout facts, state packing, and (when the
    caller did not supply a precomputed ``op``) the coeff-dependent
    operator build."""
    int3, Nc, npc, fr_p, wsplit = fused_layout(
        chunks, to=to, m=m, firfold=firfold, subblk=subblk
    )
    i8 = precision in ("i8", "i24")
    assert i8 == (chunks.dtype == jnp.int8), (
        "precision='i8'/'i24' if and only if the chunks are int8 pieces"
    )
    if i8:
        assert npc == (3 if precision == "i24" else 2), (
            "i8 is two byte pieces, i24 is three"
        )
        assert bfold and not firfold, (
            f"{precision} requires the bfold layout and the non-firfold "
            "weight form"
        )
        assert fr_p >= fr + (4 if precision == "i24" else 3), (
            f"{precision} needs its bias padding rows"
        )
    if firfold:
        # FIR-fold constraints: the boundary frame must ride the padding
        # row (the folded weights reference it), the PCM must be in the
        # exact-piece layout, chunks must be >= 2 output rows deep (the
        # carried-tail fixup touches rows 0 and 1), and the IIR
        # look-ahead must tile the block
        assert int3 and bfold, "firfold requires the int-piece bfold layout"
        assert to >= 2, "firfold needs >= 2 output rows per chunk"
        assert not subblk, "firfold and subblk are alternative IIR plans"
        assert (m * to) % max(abs(lookahead), 1) == 0
    assert fr_p >= fr and fr_p % 16 == 0
    K = xn_t.shape[0]
    assert xn_t.shape == (K, LANES) and K % m == 0
    dt = xn_t.dtype

    if ufir:
        assert not firfold and not subblk, (
            "ufir is an alternative IIR plan to firfold/subblk"
        )
    if op is None:
        op = build_fused_operator(
            g0, g1, coeffs, fr=fr, to=to, m=m, fr_p=fr_p, npc=npc,
            precision=precision, lookahead=lookahead, subblk=subblk,
            bfold=bfold, firfold=firfold, ufir=ufir, wsplit=wsplit, dt=dt,
            coeffs_static=coeffs_static,
        )
    c, g0t, ab = op["c"], op["g0t"], op["ab"]
    CP = ab.shape[1]

    st = jnp.stack(list(bq_state), axis=1)             # [LANES, 4]
    g1p = jnp.zeros((to, 8), dt).at[:, 0].set(g1)
    c0 = jnp.asarray(c0, jnp.int32).reshape(1)
    if int3:
        chunks = chunks.reshape(Nc, npc * fr_p, LANES)
    mixt = mixmat.T
    if binary_mix:
        mixt = mixt.astype(jnp.bfloat16)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "int3": jax.lax.Precision.DEFAULT,
            "int2": jax.lax.Precision.DEFAULT,
            "i8": jax.lax.Precision.DEFAULT,
            "i24": jax.lax.Precision.DEFAULT}[precision]
    return dict(int3=int3, fr_p=fr_p, K=K, dt=dt, st=st, g1p=g1p, c=c,
                c0=c0, g0t=g0t, mixt=mixt, prec=prec, chunks=chunks,
                n_t=K // m, ab=ab, n_corr=CP, npc=npc,
                bfold=bfold, wsplit=wsplit, i8=i8,
                pcm_bits=23 if precision == "i24" else 15)


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


def _common_scratch(P, m, to, nslot: int = 4):
    piece_dt = jnp.int8 if P["i8"] else jnp.bfloat16
    return [
        pltpu.VMEM((4, 8, 128), P["dt"]),
        pltpu.VMEM((nslot, m, P["npc"] * P["fr_p"], LANES), piece_dt)
        if P["int3"] else pltpu.VMEM((nslot, m, P["fr_p"], LANES),
                                     P["dt"]),
        pltpu.VMEM((m * to, 8, 128), P["dt"]),
        pltpu.VMEM((m * to, 8, 128), P["dt"]),
        pltpu.SemaphoreType.DMA((nslot,)),
    ]


@functools.partial(
    jax.jit,
    static_argnames=("fr", "to", "m", "interpret", "precision", "lookahead",
                     "subblk", "binary_mix", "bfold", "firfold", "ufir",
                     "coeffs_static", "ring_chunks", "limiter",
                     "dma_depth"),
)
def fused_resample_biquad_mix(chunks, c0, xn_t, g0, g1, mixmat, coeffs,
                              bq_state, *, fr: int, to: int, m: int = 2,
                              precision: str = "highest",
                              lookahead: int = 2,
                              subblk: int = 0,
                              binary_mix: bool = False,
                              bfold: bool = False,
                              firfold: bool = False,
                              ufir: bool = False,
                              coeffs_static: tuple = None,
                              ring_chunks: int = 0,
                              op=None,
                              limiter: tuple = None,
                              lim_state=None,
                              gains=None,
                              dma_depth: int = 4,
                              interpret: bool = False):
    """Fused pipeline over one block, reading straight from the chunked
    buffer.

    chunks: [Nc, fr_p, LANES] pre-chunked time-major PCM (HBM resident,
    rows fr..fr_p-1 zero, zero-padded past the stream end). c0: scalar int32 first chunk index.
    xn_t: [K, LANES] — xn_t[k] is the first frame of chunk c0 + k + 1.
    g0: [fr, to]; g1: [to]; mixmat: [8, LANES] gain+mix rows (rows >= C
    and lanes >= wide zero). coeffs: (b0, b1, b2, a1, a2).
    bq_state: (x1, x2, y1, y2) each [LANES]. K % m == 0.

    subblk > 0 selects the blocked parallel-in-time biquad (sub-block
    length; must divide m*to with m*to/subblk <= 8 chains); 0 keeps the
    scattered look-ahead serial loop. binary_mix promises mixmat is 0/1
    valued (gains folded into the PCM — or supplied via ``gains``),
    enabling the exact 3-pass split-operand mix.

    gains: optional [8, 128] per-lane gain plane (lane l at (l//128,
    l%128), unused lanes 1.0). When given, the kernel multiplies the
    resample output by it ("gain_post") instead of expecting the fold in
    the PCM — the chunks then hold RAW samples, so 16-bit-sourced content
    splits exactly into two bf16 pieces (precision="int2" is lossless).

    Returns (mix [8, K*to], new bq_state tuple each [LANES]).
    """
    P = _prepare(chunks, c0, xn_t, g0, g1, mixmat, coeffs, bq_state,
                 fr=fr, to=to, m=m, precision=precision, lookahead=lookahead,
                 subblk=subblk, binary_mix=binary_mix, bfold=bfold,
                 firfold=firfold, ufir=ufir, coeffs_static=coeffs_static,
                 op=op)
    n_t = P["n_t"]
    dt = P["dt"]
    mem = pltpu.ANY if interpret else pltpu.VMEM
    if lim_state is None:
        lim_state = jnp.zeros((8, 2), dt)
    gain_post = gains is not None
    if gain_post:
        assert not firfold, "gain_post and firfold are exclusive"
        assert gains.shape == (8, 128)
        if P["bfold"]:
            # the bfold kernel folds the gain into its existing 1/to
            # scale pass (zero extra cost) — pre-divide here (i8 dots
            # yield integer sums, so the 2^-15 sample scale rides too)
            gains = gains * ((1.0 / (to * float(1 << P["pcm_bits"])))
                             if P["i8"]
                             else (1.0 / to))
    else:
        gains = jnp.ones((8, 128), dt)
    in_specs = _common_in_specs(P, mem, P["K"])
    in_specs.insert(7, pl.BlockSpec(P["ab"].shape, lambda t: (0, 0),
                                    memory_space=mem))  # ab
    in_specs.append(pl.BlockSpec((8, 2), lambda t: (0, 0),
                                 memory_space=mem))     # limiter carries
    in_specs.append(pl.BlockSpec((8, 128), lambda t: (0, 0),
                                 memory_space=mem))     # per-lane gains
    out3, out_state, out_lim = pl.pallas_call(
        functools.partial(_fused_kernel, m=m, to=to, precision=P["prec"],
                          int3=P["int3"], lookahead=lookahead,
                          subblk=subblk, binary_mix=binary_mix,
                          bfold=P["bfold"], wsplit=P["wsplit"],
                          firfold=firfold, ufir=ufir, i8=P["i8"],
                          pcm_bits=P["pcm_bits"],
                          ring_chunks=ring_chunks,
                          limiter=limiter, gain_post=gain_post,
                          nslot=dma_depth),
        grid=(n_t,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, m * to, 8), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((LANES, 4), lambda t: (0, 0), memory_space=mem),
            pl.BlockSpec((8, 2), lambda t: (0, 0), memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_t, m * to, 8), dt),
            jax.ShapeDtypeStruct((LANES, 4), dt),
            jax.ShapeDtypeStruct((8, 2), dt),
        ),
        scratch_shapes=_common_scratch(P, m, to, dma_depth) + [
            pltpu.VMEM((P["n_corr"], 8, 128), dt),     # corr rows
            pltpu.VMEM((8, 128), dt),                  # limiter carries
        ],
        interpret=interpret,
    )(P["c0"], P["c"], P["chunks"], xn_t, P["g0t"], P["g1p"], P["mixt"],
      P["ab"], P["st"], lim_state, gains.astype(dt))

    mix = out3.reshape(P["K"] * to, 8).T
    new_state = tuple(out_state[:, i] for i in range(4))
    if limiter is not None:
        return mix, new_state, out_lim
    return mix, new_state


@functools.partial(
    jax.jit,
    static_argnames=("fr", "to", "m", "interpret", "precision", "lookahead",
                     "lag", "bfold", "firfold", "ufir", "ring_chunks",
                     "limiter", "agc_group", "agc_rel0", "dma_depth"),
    donate_argnames=("ring",),
)
def fused_resample_biquad_agc_mix(chunks, c0, k0, xn_t, g0, g1, mixmat,
                                  coeffs, bq_state, agc_state, ring,
                                  *, fr: int, to: int, m: int = 2,
                                  precision: str = "highest",
                                  lookahead: int = 2,
                                  agc_params,
                                  lag: int,
                                  bfold: bool = False,
                                  firfold: bool = False,
                                  ufir: bool = False,
                                  ring_chunks: int = 0,
                                  op=None,
                                  limiter: tuple = None,
                                  lim_state=None,
                                  agc_group: int = 0,
                                  agc_rel0: str = "",
                                  dma_depth: int = 4,
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
                 fr=fr, to=to, m=m, precision=precision, lookahead=lookahead,
                 bfold=bfold, firfold=firfold, ufir=ufir, op=op)
    n_t = P["n_t"]
    dt = P["dt"]
    mto = m * to
    assert not (agc_rel0 and agc_group), (
        "agc_rel0 is the EXACT rel=0 plan; group mode has its own branch"
    )
    rel0b = (agc_rel0.startswith("rel0b")
             or agc_rel0.startswith("rel0c"))
    assert agc_rel0 in ("", "rel0", "rel0f") or rel0b
    rpc = 0
    if rel0b:
        rpc = (int(agc_rel0[5:]) if len(agc_rel0) > 5
               else (16 if agc_rel0.startswith("rel0c") else 8))
        assert rpc in (8, 16, 32, 64) and mto % rpc == 0, (
            f"{agc_rel0} chunk count {rpc} must divide m*to = {mto}"
        )
    if agc_group:
        assert agc_group >= 2, "agc_group must be >= 2 (or 0 = exact)"
        assert mto % agc_group == 0, (
            f"agc_group {agc_group} must divide m*to = {mto}"
        )
        assert lag % agc_group == 0, (
            f"agc_group {agc_group} must divide the RMS lag {lag}"
        )
    rr = mto // agc_group if agc_group else mto    # ring rows per step
    rlag = lag // agc_group if agc_group else lag  # lag in ring rows
    rs_slots = ring.shape[0]
    assert ring.shape == (rs_slots, rr, 8, 128)
    assert rs_slots >= -(-rlag // rr) + 2
    # the slot-B read of step t touches slot t - lag//mto; ring writes
    # are only waited two steps after issue, so the read would race the
    # in-flight write when the RMS window is shorter than two grid steps
    assert lag >= 2 * mto, (
        f"fused AGC needs RMS lag {lag} >= 2*m*to = {2 * mto}; "
        "use a smaller m or emit block"
    )
    assert agc_state.shape == (12, 128)
    k0 = jnp.asarray(k0, jnp.int32).reshape(1)
    dtp = P["dt"]
    agcp = jnp.stack(
        [jnp.asarray(v, dtp) for v in agc_params]
        + [jnp.zeros((), dtp)] * (8 - len(agc_params))
    )  # SMEM data: live AGC knobs, zero re-trace
    mem = pltpu.ANY if interpret else pltpu.VMEM

    if lim_state is None:
        lim_state = jnp.zeros((8, 2), dtp)
    in_specs = _common_in_specs(P, mem, P["K"])
    # insert k0 + agc params after c0; append agc_state + ring + lim
    in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs.insert(2, pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((12, 128), lambda t: (0, 0),
                                 memory_space=mem))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))   # ring (HBM)
    in_specs.append(pl.BlockSpec((8, 2), lambda t: (0, 0),
                                 memory_space=mem))         # limiter

    out3, out_state, out_agc, ring_out, out_lim = pl.pallas_call(
        functools.partial(
            _fused_agc_kernel, m=m, to=to, precision=P["prec"],
            int3=P["int3"], lookahead=lookahead,
            rs_slots=rs_slots, lag=lag, bfold=P["bfold"],
            wsplit=P["wsplit"], firfold=firfold, ufir=ufir,
            i8=P["i8"], pcm_bits=P["pcm_bits"],
            ring_chunks=ring_chunks, limiter=limiter,
            agc_group=agc_group, agc_rel0=agc_rel0, nslot=dma_depth,
        ),
        grid=(n_t,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, mto, 8), lambda t: (t, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((LANES, 4), lambda t: (0, 0), memory_space=mem),
            pl.BlockSpec((12, 128), lambda t: (0, 0), memory_space=mem),
            pl.BlockSpec(memory_space=pltpu.ANY),            # ring out
            pl.BlockSpec((8, 2), lambda t: (0, 0), memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_t, mto, 8), dt),
            jax.ShapeDtypeStruct((LANES, 4), dt),
            jax.ShapeDtypeStruct((12, 128), dt),
            jax.ShapeDtypeStruct(ring.shape, ring.dtype),
            jax.ShapeDtypeStruct((8, 2), dt),
        ),
        scratch_shapes=_common_scratch(P, m, to, dma_depth) + [
            pltpu.VMEM((12, 128), dt),            # agc carry
            pltpu.VMEM((rr, 8, 128), ring.dtype),   # old window
            pltpu.VMEM((2, rr, 8, 128), ring.dtype),  # sq (dbl-buffered)
            pltpu.SemaphoreType.DMA((2,)),        # ring reads
            pltpu.SemaphoreType.DMA((2,)),        # ring writes
            pltpu.VMEM((8, 128), dt),             # limiter carries
        ] + ([
            pltpu.VMEM((mto, 8, 128), dt),        # rel0b B / gains
            pltpu.VMEM((mto, 8, 128), dt),        # rel0b H
            pltpu.VMEM((mto, 8, 128), dt),        # rel0b L
            pltpu.VMEM((rpc, 8, 128), dt),        # rel0b chunk g_in
        ] if rel0b else []),
        input_output_aliases={11: 3},             # ring in -> ring out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(P["c0"], k0, agcp, P["c"], P["chunks"], xn_t, P["g0t"], P["g1p"],
      P["mixt"], P["st"], agc_state, ring, lim_state)

    mix = out3.reshape(P["K"] * to, 8).T
    new_state = tuple(out_state[:, i] for i in range(4))
    if limiter is not None:
        return mix, new_state, out_agc, ring_out, out_lim
    return mix, new_state, out_agc, ring_out
