"""Flagship workload: the 512-stream batched DSP pipeline.

BASELINE.json config 5: decode -> resample -> channel-convert -> effects ->
mix -> limit for 512 concurrent 48 kHz stereo streams on one chip. This
module builds that graph for benches, the graft entry, and the multichip
dry run.

Layout: the WIDE-CHANNEL batch — the stream axis folds into the channel
axis (512 stereo streams = one 1024-channel chain), so the whole pipeline
is plain dense ops with no vmap:

  SamplesBuffer[1024ch PCM @44.1k]
    -> Resample 48k        (MXU matmul against the constant lerp operator)
    -> BltFilter low-pass  (1024 biquad lanes, sequential or assoc scan)
    -> Amplify             (per-stream gains as a per-channel vector)
    -> WideMixer           (sum over the stream axis -> [2, T])
    -> Limit               (master-bus soft-knee limiter)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.node import Node, State, clip_valid
from .core.types import StreamSpec, float_dtype
from .effects.basic import Amplify
from .effects.blt import BltFilter
from .effects.limit import Limit, LimitSettings
from .conversions.resample import Resample, resample_output_frames
from .parallel.batch import WideMixer
from .refimpl.effects import blt_coefficients
from .sources.generators import SamplesBuffer


def _resolve_lookahead(lookahead, mto: int) -> int:
    """``lookahead="auto"``: the STATICALLY UNROLLED look-ahead-8 serial
    loop on TPU (negative = unrolled, ops/fused.py; measured 12-33%
    faster blocks than the fori_loop form on v5e — static VMEM row
    addresses remove the dynamic-offset issue overhead on an issue-bound
    loop), the rolled look-ahead-4 elsewhere (the unrolled kernel's
    ~10x larger program is slow to build under the CPU interpreter).
    The width is reduced to the largest power-of-two divisor of m*to."""
    if lookahead != "auto":
        return int(lookahead)
    on_tpu = jax.default_backend() == "tpu"
    la = 8 if on_tpu else 4
    while la > 1 and mto % la:
        la //= 2
    return -la if on_tpu else la


def _two_piece_exact(data) -> bool:
    """True iff every sample of ``data`` splits EXACTLY into two bf16
    pieces (p1 = bf16(x); p2 = bf16(x - p1) with zero remainder).

    Holds for all content whose significand fits 16 bits at one exponent
    split — in particular every 16-bit-PCM-sourced f32 (k/2^15: p1 takes
    the top <= 8 significand bits after rounding, the residual's <= 8
    remaining bits are exactly representable). For such content the
    int-piece kernel's third piece is identically zero, so the "int2"
    layout is LOSSLESS — same output, 2/3 the chunk DMA traffic.

    One device pass at pipeline-build time (never per block)."""
    if data is None:
        return False
    p1 = data.astype(jnp.bfloat16).astype(data.dtype)
    r = data - p1
    p2 = r.astype(jnp.bfloat16).astype(data.dtype)
    return bool(jnp.all(r == p2))


def _int16_grid_exact(data) -> bool:
    """True iff every sample of ``data`` lies EXACTLY on the 16-bit PCM
    grid (x = k / 2^15 with k an int16) — true by construction for all
    content decoded from 16-bit sources. Such content rides the "i8"
    byte-piece chunk layout LOSSLESSLY at HALF the int2 chunk traffic
    (2 B/sample): hi/lo bytes as int8 pieces, reconstructed exactly by
    the kernel's single dot (ops/fused.py build_fused_operator).

    One device pass at pipeline-build time (never per block)."""
    if data is None:
        return False
    s = data * 32768.0  # exact: a pure exponent shift in f32
    k = jnp.rint(s)
    return bool(jnp.all((s == k) & (k >= -32768.0) & (k <= 32767.0)))


def _content_probe(input_node) -> tuple:
    """(int16_grid_exact, int24_grid_exact, two_piece_exact) for the
    node's PCM, computed
    in ONE fused device pass with ONE readback and CACHED on the node
    (ADVICE r4 #4: the auto-precision path ran both probes as separate
    blocking full-buffer reductions per constructed pipeline — build
    latency growing with content length)."""
    data = getattr(input_node, "_data", None)
    if data is None:
        return (False, False, False)
    cached = getattr(input_node, "_content_probe_cache", None)
    if cached is not None:
        return cached
    s = data * 32768.0  # exact: a pure exponent shift in f32
    k = jnp.rint(s)
    g16 = jnp.all((s == k) & (k >= -32768.0) & (k <= 32767.0))
    s24 = data * 8388608.0
    k24 = jnp.rint(s24)
    g24 = jnp.all((s24 == k24) & (k24 >= -8388608.0)
                  & (k24 <= 8388607.0))
    p1 = data.astype(jnp.bfloat16).astype(data.dtype)
    r = data - p1
    p2 = r.astype(jnp.bfloat16).astype(data.dtype)
    tp = jnp.all(r == p2)
    res = np.asarray(jnp.stack([g16, g24, tp]))  # one device round trip
    out = (bool(res[0]), bool(res[1]), bool(res[2]))
    try:
        input_node._content_probe_cache = out
    except Exception:
        pass
    return out


class FusedWidePipeline(Node):
    """Resample + biquad + gain + stream-mix as ONE Pallas mega-kernel.

    Fuses the flagship's Resample -> BltFilter -> Amplify -> WideMixer
    chain (see :mod:`rodio_tpu.ops.fused`) so each block makes a single
    HBM pass over the input PCM instead of four stage round-trips.

    Constraints vs the unfused chain:
    - the upstream must be RANDOM_ACCESS with ``slice_frames`` (a
      SamplesBuffer / Decoder), at most 1024 wide channels;
    - ``emit`` block sizes must be multiples of ``m * to`` (the kernel's
      time-grid chunk, e.g. 320 frames for 44.1k->48k with m=2);
    - outputs match the unfused chain to ~1e-6 (f32 matmul accumulation
      order differs), except the final drain frame of the stream, which the
      unfused resampler emits as the raw last input frame
      (conversions/resample.py drain rule) while the kernel resamples it
      with a zero right-neighbor — one frame at the stream tail.
    """

    def __init__(self, input_node: Node, to_rate: int, gains,
                 n_streams: int, kind: str = "low_pass",
                 freq: float = 2000.0, q: float = 0.5, *, m: int = 2,
                 precision: str = "auto", lookahead="auto",
                 subblk: int = 0, firfold="auto", ufir: bool = False,
                 gain_post="auto",
                 with_agc: bool = False, agc_settings=None,
                 agc_ring: str = "bf16", agc_group: int = 0,
                 agc_plan: str = "auto",
                 dma_depth="auto", master_limit=None):
        assert getattr(input_node, "RANDOM_ACCESS", False) and hasattr(
            input_node, "slice_frames"
        ), "FusedWidePipeline needs a sliceable random-access source"
        self.input = input_node
        wide = input_node.spec.channels
        if wide % n_streams:
            raise ValueError("channel count not divisible by stream count")
        self.n_streams = n_streams
        C = wide // n_streams
        self.spec = StreamSpec(C, to_rate)
        from_rate = input_node.spec.sample_rate
        import math

        g = math.gcd(from_rate, to_rate)
        self.from_ = from_rate // g
        self.to = to_rate // g
        assert self.from_ != self.to, "identity ratio: use the plain chain"
        self.dma_depth = dma_depth
        #: gain_post: per-lane gains applied in-kernel on the resample
        #: output (one vector multiply) instead of folded into the PCM
        #: at init. The HBM chunks then hold RAW samples — so when the
        #: content splits exactly into two bf16 pieces (true for ALL
        #: 16-bit-sourced PCM: p1 takes the top 8 significand bits, the
        #: residual's remaining <= 8 bits fit p2 exactly), the third
        #: int-piece is identically zero and "int2" is LOSSLESS, at 2/3
        #: the chunk DMA traffic of int3.
        self.gain_post = False
        gp_ok = (not with_agc) and firfold is not True
        if precision == "auto":
            # int3: exact bf16 dots (integer-scaled weights + exact
            # 3-way bf16 split of the PCM); weights <= 256 ride one
            # dot, bigger ratios split the operator as 4*hi + lo
            # (ops/fused.py wsplit) up to to = 1024.
            # Content probe: when every input sample is two-bf16-piece
            # exact, drop to int2 (provably identical output — the
            # dropped piece is all zeros). The AGC layout never folds
            # gains into the PCM, so it qualifies directly; the plain
            # path switches the fold to the in-kernel gain_post multiply.
            precision = "int3" if self.to <= 1024 else "highest"
            if (precision == "int3" and firfold is not True
                    and (with_agc or gain_post is not False)):
                g16, g24, tp2 = _content_probe(input_node)
                if g16:
                    # 16-bit-grid content: int8 BYTE pieces — lossless
                    # at half int2's chunk DMA traffic (1/3 of int3's)
                    precision = "i8"
                    self.gain_post = not with_agc
                elif g24:
                    # 24-bit-grid content (24-bit masters): three int8
                    # pieces — information-lossless at 3/4 of int2's
                    # chunk bytes (round-5, VERDICT r4 ask #5)
                    precision = "i24"
                    self.gain_post = not with_agc
                elif tp2:
                    precision = "int2"
                    self.gain_post = not with_agc
        elif precision == "i8":
            assert firfold is not True, "i8 and firfold are exclusive"
            assert self.to <= 1024, "i8 rides the int-piece path (to<=1024)"
            assert _content_probe(input_node)[0], (
                "precision='i8' needs content exactly on the int16 grid "
                "(k / 2^15) — off-grid samples would be silently rounded"
            )
            self.gain_post = gp_ok
        elif precision == "i24":
            assert firfold is not True, "i24 and firfold are exclusive"
            assert self.to <= 1024, "i24 rides the int-piece path"
            assert _content_probe(input_node)[1], (
                "precision='i24' needs content exactly on the int24 grid "
                "(k / 2^23) — off-grid samples would be silently rounded"
            )
            self.gain_post = gp_ok
        elif (precision == "int2" and gp_ok and gain_post == "auto"):
            # explicit int2 keeps the round-2 folded layout unless the
            # content is piece-exact (then raw chunks cost nothing and
            # remove the fold's residual from the parity budget)
            self.gain_post = _content_probe(input_node)[2]
        if gain_post is True or gain_post is False:
            # explicit override (bench A/B isolation); valid for any
            # content — only the int2 LOSSLESSNESS claim needs the probe
            self.gain_post = bool(gain_post) and gp_ok
        if precision in ("i8", "i24") and not with_agc:
            # int8-piece chunks must stay RAW: a gain fold would move
            # the PCM off the sample grid and the byte split would
            # silently round
            assert self.gain_post, (
                f"{precision} requires gain_post (raw chunks); use "
                "int3/int2 for a folded-gain layout"
            )
        if m == "auto":
            # m=3 chunks/grid-step fits the 16 MB scoped-VMEM limit only
            # in the int2 layout (at dma_depth 3); measured fastest
            # there, no help elsewhere (BENCHMARKS.md round-3). The i8
            # byte pieces halve the landing pads again: m=4 with a
            # 5-deep DMA pipeline fits at to <= 160 and measured the
            # round-4 record (~670-690k); to in (160, 320] keeps m=3
            # (the m*to staging scratch, not the pads, is the binding
            # budget there) with the deeper 4-slot pipeline.
            if precision == "i8" and self.to <= 160 and not with_agc:
                m = 4
            elif (precision in ("int2", "i8", "i24") and self.to <= 320
                    and not with_agc):
                m = 3
            else:
                m = 2
            if dma_depth == "auto":
                if precision == "i8":
                    self.dma_depth = 5 if m == 4 else 4
                else:
                    self.dma_depth = 3 if m == 3 else 4
        if self.dma_depth == "auto":
            if precision == "i8":
                self.dma_depth = 5 if m >= 4 else 4
            else:
                self.dma_depth = 3 if m >= 3 else 4
        self.dma_depth = int(self.dma_depth)
        self.m = int(m)
        if (lookahead == "auto" and self.m >= 3
                and jax.default_backend() == "tpu"):
            # u8 regresses at m=3 (wider rows + 3-chunk VMEM pressure);
            # unrolled-4 measured best there (BENCHMARKS.md round-3)
            lookahead = -4
        if precision in ("int3", "int2", "i8", "i24") and self.to > 320:
            self.m = 1  # VMEM budget for large-`to` grids
        self.precision = precision
        self.lookahead = _resolve_lookahead(lookahead, self.m * self.to)
        #: boundary-frame folding (padding-row g1 term); int-piece only
        self.bfold = precision in ("int3", "int2", "i8", "i24")
        #: chunk row padding: i8 parks its two constant-1 bias rows at
        #: fr+1 / fr+2, so it needs >= 3 padding rows past fr
        self._frp = -(-(self.from_
                        + {"i8": 3, "i24": 4}.get(precision, 1))
                      // 16) * 16
        if firfold == "auto":
            # FIR-fold (u-form IIR + weight-folded FIR) measured SLOWER
            # than look-ahead-4 on v5e (the 3x-stacked weight dot costs
            # more than the serial-loop savings) — opt-in until a
            # hardware generation where the MXU/VPU balance flips
            firfold = False
        self.firfold = bool(firfold)
        if self.firfold:
            assert self.bfold and self.to >= 2 and not subblk, (
                "firfold requires the int-piece bfold layout, to >= 2, "
                "and the look-ahead IIR plan"
            )
        #: ufir: FIR as 3 full-width vector passes + the u-form 2-term
        #: IIR serial loop (firfold's loop without its 3x-stacked weight
        #: dot) — roughly halves the issue-bound serial-loop ops
        self.ufir = bool(ufir)
        if self.ufir:
            assert not self.firfold and not subblk, (
                "ufir is an alternative IIR plan to firfold/subblk"
            )
        # optional in-kernel master-bus limiter (the blocked limiter as
        # the mega-kernel epilogue). Same parity class as the node path's
        # TPU default (the blocked parallel-in-time kernel, ~4e-6 vs the
        # sequential order). MEASURED SLOWER than the separate Limit
        # dispatch on v5e (+35 vs +3.8 us/block — per-grid-step
        # log2/exp2 + lane scans on [8,128] tiles don't amortize like
        # the full-block kernel); opt-in for one-dispatch deployments.
        self._limiter = None
        if master_limit is not None:
            from .core.math import duration_to_coefficient
            from .core.types import duration_to_nanos

            assert C == 2, "in-kernel master limiter is stereo"
            mto = self.m * self.to
            P_l = 1
            while P_l * 2 <= 128 and mto % (P_l * 2) == 0:
                P_l *= 2
            assert mto // P_l <= 16, (
                "in-kernel limiter needs m*to = Lc*pow2 with Lc <= 16"
            )
            ls = master_limit
            self._limiter = (
                float(duration_to_coefficient(
                    0, to_rate, nanos=duration_to_nanos(ls.attack))),
                float(duration_to_coefficient(
                    0, to_rate, nanos=duration_to_nanos(ls.release))),
                float(np.float32(ls.threshold)),
                float(np.float32(ls.knee_width)),
                float(np.float32(1.0) / (np.float32(8.0)
                                         * np.float32(ls.knee_width))),
            )
        # reuse the resampler's constant lerp operator
        self._rs = Resample(input_node, to_rate)
        self._kind, self._freq, self._q = kind, float(freq), float(q)
        ap = blt_coefficients(kind, to_rate, freq, q)
        self.coeffs = tuple(
            float(v) for v in (ap.b0, ap.b1, ap.b2, ap.a1, ap.a2)
        )
        gains = np.asarray(gains, dtype=np.float32)
        per_lane = np.repeat(gains, C) if gains.shape == (n_streams,) else gains
        assert per_lane.shape == (wide,)
        from .ops.fused import LANES

        assert wide <= LANES, "fused pipeline supports <= 1024 wide channels"
        self.with_agc = bool(with_agc)
        if with_agc:
            # the in-kernel AGC needs the CHANNEL-MAJOR wide layout
            # (lane = c*(LANES//2) + s): ch0 of every stream on sublanes
            # 0..3 of each time row, ch1 on 4..7 (ops/fused.py)
            assert C == 2, "fused AGC supports stereo streams"
            from .effects.agc import AgcSettings, RMS_WINDOW_SIZE
            from .core.math import duration_to_coefficient
            from .core.types import duration_to_nanos

            st = agc_settings or AgcSettings()
            attack_ns = min(duration_to_nanos(st.attack_time),
                            10_000_000_000)
            release_ns = min(duration_to_nanos(st.release_time),
                             10_000_000_000)
            self._agc_params = (
                float(duration_to_coefficient(0, to_rate, nanos=attack_ns)),
                float(duration_to_coefficient(0, to_rate, nanos=release_ns)),
                float(np.float32(st.target_level)),
                float(np.float32(st.absolute_max_gain)),
                0.0,
                float(np.float32(1.0) / np.float32(RMS_WINDOW_SIZE)),
            )
            self._lag = RMS_WINDOW_SIZE // C
            assert agc_ring in ("bf16", "f32")
            self._agc_ring = agc_ring
            # group-rate AGC (opt-in, documented deviation): window sums
            # / peaks / the gain smoother advance once per agc_group
            # frames instead of per interleaved sample; group-end RMS
            # stays exact, the smoother uses speed^(2*AG), gains apply
            # as a group staircase. See ops/fused.py group branch.
            self._agc_group = int(agc_group)
            if agc_group:
                mto_ = self.m * self.to
                assert (agc_group >= 2 and mto_ % agc_group == 0
                        and self._lag % agc_group == 0), (
                    f"agc_group {agc_group} must be >= 2 and divide both "
                    f"m*to = {mto_} and the RMS lag {self._lag}"
                )
            # agc_plan: "rel0" (OPT-IN) is the EXACT structural plan
            # for release_time = 0 (coefficient exactly 0.0, the
            # default settings): the peak detector is memoryless and
            # the smoother collapses to a clamped-min form, dropping
            # two of the three serial chains (ops/fused.py rel0
            # branch). STATIC — the kernel plan is baked at trace time
            # (a cached outer jit would never see a host-side flip), so
            # "auto" keeps the serial plan, which serves EVERY live
            # knob; rel0 pipelines raise on set_agc_params(release!=0).
            # rel0f = the LEAN rel0 (packed ring basis + folded-rsqrt
            # desired gain, round-5); rel0b = the blocked
            # parallel-in-time rel0 smoother (measured A/B record —
            # see ops/fused.py rel0b note). Same exactness contract
            # and live-knob rules as rel0.
            assert agc_plan in ("auto", "serial", "rel0", "rel0f",
                                "rel0b", "rel0b16", "rel0b32",
                                "rel0b64", "rel0c", "rel0c8",
                                "rel0c16", "rel0c32")
            if agc_plan.startswith("rel0"):
                assert self._agc_params[1] == 0.0 and not agc_group, (
                    f"agc_plan='{agc_plan}' requires release_time=0 "
                    "and no group mode"
                )
            self._agc_rel0 = (agc_plan
                              if agc_plan.startswith("rel0") else "")
            half = LANES // 2
            # lane permutation: new lane l = c*half + s <- old row s*C + c;
            # unused stream slots point at a zero row of the padded data
            perm = np.full(LANES, min(wide, LANES - 1), dtype=np.int64)
            for s in range(n_streams):
                for c in range(C):
                    perm[c * half + s] = s * C + c
            self._perm = perm
            M = np.zeros((8, LANES), dtype=np.float32)
            for s in range(n_streams):
                for c in range(C):
                    M[c, c * half + s] = per_lane[s * C + c]
        else:
            self._perm = None
            # per-stream gains are FOLDED INTO THE PCM at init (exact f32
            # scale, applied once), so the mix matrix is pure 0/1 channel
            # selection — exactly representable in bf16, which lets the
            # kernel run an EXACT 3-pass split-operand mix instead of a
            # 6-pass HIGHEST matmul (ops/fused.py step 4)
            M = np.zeros((8, LANES), dtype=np.float32)
            for c in range(C):
                M[c, c:wide:C] = 1.0
            self._gain_fold = per_lane
        self._mixmat = jnp.asarray(M)
        self._wide = wide
        self._lanes = LANES
        self._s0 = getattr(input_node, "_start", 0)
        # optional blocked-IIR sub-block length (ops/fused.py step 3).
        # Default 0 = scattered look-ahead loop: on v5e the interleaved
        # chains measured ~15% SLOWER than look-ahead-4 (scattered
        # dynamic-row access dominates), so the blocked path stays an
        # opt-in alternative for future tuning
        self.subblk = 0 if with_agc else int(subblk)

    def total_frames(self) -> Optional[int]:
        n_in = self.input.total_frames()
        if n_in is None:
            return None
        return resample_output_frames(n_in, self.from_, self.to)

    def init_state(self) -> State:
        dt = float_dtype()
        z = jnp.zeros((self._lanes,), dtype=dt)
        in_state = self.input.init_state()
        # one-time device-side restructure of the PCM: lane-padded,
        # time-major, pre-chunked at the resample stride so per-block
        # access is a runtime chunk index — no window copies per emit
        data = in_state["data"]
        fr = self.from_
        data_t = jnp.pad(
            data, ((0, self._lanes - data.shape[0]), (0, 0))
        ).T[self._s0 :]                                 # [F - s0, LANES]
        if self._perm is not None:
            data_t = data_t[:, self._perm]              # channel-major lanes
        elif self.gain_post:
            # chunks stay RAW: the kernel applies the per-lane gains on
            # the resample output (see ops/fused.py gain_post), keeping
            # the two-bf16-piece split of the content exact
            pass
        else:
            # fold the per-stream gains into the PCM (binary mix matrix)
            g = jnp.pad(
                jnp.asarray(self._gain_fold),
                (0, self._lanes - self._wide), constant_values=1.0,
            )
            data_t = data_t * g[None, :]
        nc = data_t.shape[0] // fr
        # one guaranteed zero-padding row past fr: the BOUNDARY FRAME
        # (first frame of the next chunk) rides there, so the kernel's
        # single int-piece dot computes the whole lerp including the g1
        # term (g1*to is integer-exact in bf16) — no rank-1 xnext pass
        # (i8 reserves two more rows for its constant-1 bias operands)
        fr_p = self._frp
        chunks = jnp.pad(
            data_t[: nc * fr].reshape(nc, fr, self._lanes),
            ((0, 0), (0, fr_p - fr), (0, 0)),
        )
        boundary = jnp.concatenate(
            [data_t[fr::fr][: nc - 1], jnp.zeros((1, self._lanes),
                                                 data_t.dtype)], axis=0
        )  # [nc, LANES]: first frame of chunk j+1 (zero past the end)
        chunks = chunks.at[:, fr, :].set(boundary)
        if self.precision == "i8":
            # int8 BYTE pieces: content is int16-grid-exact by
            # construction (__init__ probes/asserts), so k = x * 2^15 is
            # the exact sample integer; hi = k >> 8 (arithmetic) and
            # lo_c = (k & 255) - 128 both fit int8 and reconstruct
            # k = 256*hi + (lo_c + 128). The +128 bias rides two
            # constant-1 operand rows at fr+1 / fr+2 of the LO piece
            # against the operator's split bias columns
            # (ops/fused.py build_fused_operator) — half int2's chunk
            # bytes; every PRODUCT is exact, f32-accumulated (<= 1 ulp
            # once |sum w*k| can exceed 2^24, i.e. to > 512 at full
            # scale — ADVICE r4 #1; within the documented ~5e-7 class).
            k = jnp.rint(chunks * 32768.0).astype(jnp.int32)
            hi = jax.lax.shift_right_arithmetic(
                k, jnp.int32(8)).astype(jnp.int8)
            lo = ((k & 255) - 128).astype(jnp.int8)
            lo = lo.at[:, fr + 1, :].set(1).at[:, fr + 2, :].set(1)
            chunks = jnp.stack([hi, lo], axis=1)
        elif self.precision == "i24":
            # THREE int8 byte pieces of the exact int24 sample
            # k = x * 2^23 (content is 24-bit-grid-exact by
            # construction): b2 = k >> 16, b1/b0 offset-bytes, so
            # k = 2^16 b2 + 2^8 b1 + b0 + 128*257. The bias rides
            # three constant-1 operand rows at fr+1..fr+3 of the b0
            # piece against the operator's 3-way bias-column split
            # (ops/fused.py build_fused_operator i24 branch) — 3/4 of
            # int2's chunk bytes, half of int3's; every product exact,
            # f32-accumulated (same <= 1 ulp class as i8, documented
            # ~5e-7 parity budget).
            k = jnp.rint(chunks * 8388608.0).astype(jnp.int32)
            b2 = jax.lax.shift_right_arithmetic(
                k, jnp.int32(16)).astype(jnp.int8)
            b1 = (((k >> 8) & 255) - 128).astype(jnp.int8)
            b0 = ((k & 255) - 128).astype(jnp.int8)
            b0 = (b0.at[:, fr + 1, :].set(1)
                  .at[:, fr + 2, :].set(1)
                  .at[:, fr + 3, :].set(1))
            chunks = jnp.stack([b2, b1, b0], axis=1)
        elif self.precision in ("int3", "int2"):
            # exact bf16 piece split: 3 pieces reproduce all 24 f32
            # mantissa bits bitwise; 2 pieces ("int2") drop the last
            # (residual < 2^-18 relative — after gain folding the lane
            # values carry ~1/S scale, so the summed-mix error stays
            # ~1e-7 absolute) for 2/3 the HBM traffic
            p1 = chunks.astype(jnp.bfloat16)
            r = chunks - p1.astype(chunks.dtype)
            p2 = r.astype(jnp.bfloat16)
            if self.precision == "int3":
                p3 = (r - p2.astype(chunks.dtype)).astype(jnp.bfloat16)
                chunks = jnp.stack([p1, p2, p3], axis=1)
            else:
                chunks = jnp.stack([p1, p2], axis=1)
        xn_all_t = data_t[::fr]                         # [Fc, LANES]
        # the PCM lives only in the chunked layout: drop the upstream
        # buffer's copy (emit touches just its pos/end scalars)
        in_state = {k: v for k, v in in_state.items() if k != "data"}
        state = {
            "in": in_state,
            "chunks": chunks,
            "xn_all_t": xn_all_t,
            "out_o": jnp.zeros((), dtype=jnp.int32),
            "drained": jnp.asarray(False),
            "bq": (z, z, z, z),
            # biquad coefficients live in the STATE (the kernel takes
            # them as data): retune() is a pure state update with zero
            # re-trace, matching the node path (src/source/blt.rs:68-91).
            # "op" holds the DERIVED operator (packed SMEM rows + the
            # staged weight matrix), precomputed HERE so the per-block
            # emit pays nothing for the liveness (deriving it inside the
            # render scan measured ~25% slower blocks).
            "coeffs": jnp.asarray(self.coeffs, dtype=dt),
            "op": self._build_op(self.coeffs),
        }
        if self.gain_post:
            gp = jnp.pad(
                jnp.asarray(self._gain_fold),
                (0, self._lanes - self._wide), constant_values=1.0,
            )
            # per-lane gain plane, lane l at (l//128, l%128) — the same
            # LANES -> (8, 128) split the kernel's time rows use
            state["gv"] = gp.reshape(8, 128).astype(dt)
        if self._limiter is not None:
            state["lim"] = jnp.zeros((8, 2), dtype=dt)
        if self.with_agc:
            mto = self.m * self.to
            # agc_group scales the ring's row unit from a frame to a
            # group of agc_group frames (per-group window sums)
            rr = mto // self._agc_group if self._agc_group else mto
            rlag = (self._lag // self._agc_group if self._agc_group
                    else self._lag)
            rs_slots = -(-rlag // rr) + 2
            state["agc"] = (
                jnp.zeros((12, 128), dtype=dt).at[8:12].set(1.0)
            )
            # RMS sq-history ring: bf16 halves the per-block HBM ring
            # traffic (the dominant fused-AGC cost); the running window
            # sum adds and later subtracts the SAME quantized square, so
            # there is no drift — only ~2^-9-relative noise on the
            # 8192-sample mean, inside the documented 2e-5 AGC parity
            # contract for program material. agc_ring="f32" keeps the
            # exact mode.
            rdt = jnp.bfloat16 if self._agc_ring == "bf16" else dt
            state["ring"] = jnp.zeros((rs_slots, rr, 8, 128), dtype=rdt)
            state["agc_par"] = jnp.asarray(self._agc_params, dtype=dt)
        return state

    def _build_op(self, coeffs):
        """Host-side derivation of the kernel's coeff-dependent operator
        (ops/fused.py:build_fused_operator) — once per knob change, so
        blocks pay zero rebuild cost."""
        from .ops.fused import build_fused_operator

        fr = self.from_
        fr_p = self._frp
        npc = {"int3": 3, "int2": 2, "i8": 2,
               "i24": 3}.get(self.precision, 1)
        wsplit = (npc > 1) and self.to > 256 and not self.firfold
        return build_fused_operator(
            self._rs._G0, self._rs._g1, coeffs, fr=fr, to=self.to,
            m=self.m, fr_p=fr_p, npc=npc, precision=self.precision,
            lookahead=self.lookahead, subblk=self.subblk,
            bfold=self.bfold, firfold=self.firfold, ufir=self.ufir,
            wsplit=wsplit,
            dt=float_dtype(),
            # the subblk boundary responses must derive from the SAME
            # coefficients the kernel runs (a retune passes the new
            # ones here — using build-time self.coeffs would silently
            # correct sub-block boundaries with stale alpha/beta)
            coeffs_static=tuple(coeffs) if self.subblk else None,
        )

    def retune(self, state: State, kind: Optional[str] = None,
               freq: Optional[float] = None,
               q: Optional[float] = None) -> State:
        """Live filter retune on the fused farm path: recompute the
        biquad coefficients AND the derived operator host-side and swap
        them into the state — the kernel reads both as data, so this is
        zero re-trace (the reference's free to_low_pass knob,
        src/source/blt.rs:68-91). Filter history (bq carries) persists
        across the change, as the reference's does."""
        kind = self._kind if kind is None else kind
        freq = self._freq if freq is None else float(freq)
        q = self._q if q is None else float(q)
        ap = blt_coefficients(kind, self.spec.sample_rate, freq, q)
        co = tuple(float(v) for v in (ap.b0, ap.b1, ap.b2, ap.a1, ap.a2))
        return {**state,
                "coeffs": jnp.asarray(co, dtype=float_dtype()),
                "op": self._build_op(co)}

    def set_agc_params(self, state: State, *, attack=None, release=None,
                       target_level=None, absolute_max_gain=None) -> State:
        """Live AGC knobs on the fused path (agc.rs set_attack_time /
        set_release_time semantics): pure state update, zero re-trace."""
        assert self.with_agc
        from .core.math import duration_to_coefficient
        from .core.types import duration_to_nanos

        att, rel, tgt, mg, fl, invw = (float(v) for v in
                                       np.asarray(state["agc_par"]))
        rate = self.spec.sample_rate
        if attack is not None:
            ns = min(duration_to_nanos(attack), 10_000_000_000)
            att = float(duration_to_coefficient(0, rate, nanos=ns))
        if release is not None:
            ns = min(duration_to_nanos(release), 10_000_000_000)
            rel = float(duration_to_coefficient(0, rate, nanos=ns))
            if rel != 0.0 and getattr(self, "_agc_rel0", False):
                # the rel0 structural plan is only valid at release
                # coefficient exactly 0, and the plan is baked into
                # every already-compiled step (a host-side flip would
                # be silently ignored by cached outer jits) — fail
                # loudly; live nonzero release needs the default
                # serial plan.
                raise ValueError(
                    "this pipeline was built with agc_plan='rel0' "
                    "(release_time=0); live nonzero release requires "
                    "the default serial plan"
                )
        if target_level is not None:
            tgt = float(np.float32(target_level))
        if absolute_max_gain is not None:
            mg = float(np.float32(absolute_max_gain))
        return {**state, "agc_par": jnp.asarray(
            (att, rel, tgt, mg, fl, invw), dtype=float_dtype())}

    def emit(self, state: State, n: int):
        import jax

        from .ops.fused import fused_resample_biquad_mix

        fr, to, m = self.from_, self.to, self.m
        assert n % (m * to) == 0, (
            f"fused block {n} must be a multiple of {m * to}"
        )
        dt = float_dtype()
        K = n // to
        chunks = state["chunks"]
        pad = getattr(self.input, "PAD_FRAMES", 0)
        assert K * fr + fr <= pad, (
            f"fused block {n} needs {K * fr + fr} pad frames > {pad}; "
            "use a smaller block"
        )
        o0 = state["out_o"]  # invariant: multiple of `to`
        c0 = o0 // to
        start, in_end = self.input.access_window(state["in"])

        # window stays in bounds: the clamp only engages past the drain
        # point, where outputs are masked to zero anyway
        c0c = jnp.clip(c0, 0, chunks.shape[0] - K).astype(jnp.int32)
        xn_t = jax.lax.dynamic_slice(
            state["xn_all_t"], (c0c + 1, jnp.int32(0)),
            (K, self._lanes),
        )

        interpret = jax.default_backend() != "tpu"
        extra = {}
        if self.with_agc:
            from .ops.fused import fused_resample_biquad_agc_mix

            k0 = o0 // jnp.int32(m * to)
            res = fused_resample_biquad_agc_mix(
                chunks, c0c, k0, xn_t, self._rs._G0, self._rs._g1,
                self._mixmat, tuple(state["coeffs"][i] for i in range(5)),
                state["bq"], state["agc"],
                state["ring"], fr=fr, to=to, m=m,
                precision=self.precision, lookahead=self.lookahead,
                agc_params=tuple(state["agc_par"][i] for i in range(6)),
                lag=self._lag,
                bfold=self.bfold, firfold=self.firfold, ufir=self.ufir,
                op=state["op"],
                limiter=self._limiter,
                lim_state=state.get("lim"),
                agc_group=self._agc_group,
                agc_rel0=self._agc_rel0,
                dma_depth=self.dma_depth,
                interpret=interpret,
            )
            if self._limiter is not None:
                mix8, bq, agc_new, ring_new, lim_new = res
                extra = {"agc": agc_new, "ring": ring_new, "lim": lim_new}
            else:
                mix8, bq, agc_new, ring_new = res
                extra = {"agc": agc_new, "ring": ring_new}
        else:
            res = fused_resample_biquad_mix(
                chunks, c0c, xn_t, self._rs._G0, self._rs._g1, self._mixmat,
                tuple(state["coeffs"][i] for i in range(5)),
                state["bq"], fr=fr, to=to, m=m,
                precision=self.precision, lookahead=self.lookahead,
                subblk=self.subblk, binary_mix=True,
                bfold=self.bfold, firfold=self.firfold, ufir=self.ufir,
                coeffs_static=self.coeffs if self.subblk else None,
                op=state["op"],
                limiter=self._limiter,
                lim_state=state.get("lim"),
                gains=state.get("gv"),
                dma_depth=self.dma_depth,
                interpret=interpret,
            )
            if self._limiter is not None:
                mix8, bq, lim_new = res
                extra = {"lim": lim_new}
            else:
                mix8, bq = res
        out = mix8[: self.spec.channels, :]

        # validity + drain bookkeeping (conversions/resample.py:322-339)
        o = o0 + jnp.arange(n, dtype=jnp.int32)
        left_g = (o // to) * fr + (fr * (o % to)) // to
        full = left_g <= in_end - 2
        n_full = jnp.sum(full.astype(jnp.int32))
        cand_left = jnp.take(left_g, n_full, mode="clip")
        drain_ok = (n_full < n) & (cand_left == in_end - 1)
        valid = jnp.where(
            state["drained"], 0, n_full + drain_ok.astype(jnp.int32)
        )
        i_idx = jnp.arange(n, dtype=jnp.int32)
        out = jnp.where(i_idx[None, :] < valid, out, 0.0)
        drained_new = state["drained"] | drain_ok | (valid < n)
        return (
            {**state, "out_o": o0 + n, "drained": drained_new, "bq": bq,
             **extra},
            out.astype(dt),
            clip_valid(valid, n),
        )


class ChunkRingFeed:
    """Device-resident ROLLING chunk ring: the live-feed counterpart of
    FusedWidePipeline's init-time pre-chunking, so the streaming farm's
    constant-memory path gets the fused mega-kernel instead of the
    unfused chain (VERDICT r2 #3; replaces the pull cadence of
    /root/reference/src/stream.rs:536-548 with a push ring).

    Every steady push carries EXACTLY ``Kp`` chunks of frames (Kp*fr);
    chunk j's boundary row (frame (j+1)*fr, the bfold padding-row g1
    term) comes from the carried tail of the previous push, so pushes
    stay chunk-aligned with STATIC shapes. The ring wraps modulo
    ``ring_chunks`` (the kernel's ring_chunks DMA indexing); writes are
    Kp-aligned and reads m-aligned, so neither straddles the seam.
    """

    #: live input: no seekable past
    LIVE = True

    def __init__(self, wide: int, in_rate: int, fr: int, Kp: int,
                 ring_chunks: int, precision: str, per_lane_gain,
                 gain_post: bool = False):
        from .ops.fused import LANES

        assert wide <= LANES
        self.spec = StreamSpec(wide, in_rate)
        self.fr = int(fr)
        self.Kp = int(Kp)
        self.ring_chunks = int(ring_chunks)
        assert ring_chunks % Kp == 0
        self.fr_p = -(-(fr + 1) // 16) * 16
        assert precision in ("int3", "int2")
        self.npc = 3 if precision == "int3" else 2
        self._lanes = LANES
        #: gain_post: keep the ring RAW (gains ride the kernel's scale
        #: pass instead of a push-time fold) — with an i16 wire the raw
        #: samples are k/2^15, whose two-bf16-piece split is exact, so
        #: precision="int2" is LOSSLESS at 2/3 the ring traffic (and the
        #: push jit drops one full-width multiply + one piece subtract)
        self.gain_post = bool(gain_post)
        g = np.asarray(per_lane_gain, np.float32)
        assert g.shape == (wide,)
        self._gain = jnp.asarray(
            np.pad(g, (0, LANES - wide), constant_values=1.0)
        )

    def total_frames(self):
        return None

    def init_state(self):
        dt = float_dtype()
        return {
            "chunks": jnp.zeros(
                (self.ring_chunks, self.npc, self.fr_p, self._lanes),
                dtype=jnp.bfloat16,
            ),
            "w": jnp.zeros((), jnp.int32),       # chunks written (abs)
            "carry": jnp.zeros((self.fr, self._lanes), dtype=dt),
            "overflow": jnp.asarray(False),
            "ended": jnp.asarray(False),
            # per-lane gains live in the STATE, not the push closure:
            # the sharded farm runs every shard through shard 0's
            # traced push/emit (sharding.py contract: "only state
            # CONTENT may differ"), so a closure constant would apply
            # shard 0's gains on every chip (round-5 sharded-farm
            # fuzzer finding)
            "gain": self._gain,
        }

    def push(self, state, block, *, prime: bool = False):
        """Append one push. ``block``: [wide, (Kp+1)*fr] on the PRIME
        push (chunks 0..Kp-1 plus the first carry), [wide, Kp*fr] on
        steady pushes. Gains are folded into the PCM here (binary mix
        matrix downstream). Pure jit-side function."""
        fr, Kp, fr_p = self.fr, self.Kp, self.fr_p
        L = self._lanes
        T = (Kp + 1) * fr if prime else Kp * fr
        assert block.shape[1] == T
        dt = float_dtype()
        bt = jnp.pad(
            block.astype(dt), ((0, L - block.shape[0]), (0, 0))
        )
        if not self.gain_post:
            bt = bt * state["gain"][:, None]
        span = bt.T                                  # [T, LANES]
        if not prime:
            span = jnp.concatenate([state["carry"], span], axis=0)
        # span rows [0, (Kp+1)*fr): chunks w..w+Kp-1 with boundaries
        base = span[: Kp * fr].reshape(Kp, fr, L)
        chunks = jnp.pad(base, ((0, 0), (0, fr_p - fr), (0, 0)))
        bnd = span[fr :: fr][:Kp]                    # [Kp, LANES]
        chunks = chunks.at[:, fr, :].set(bnd)
        p1 = chunks.astype(jnp.bfloat16)
        r = chunks - p1.astype(dt)
        p2 = r.astype(jnp.bfloat16)
        pieces = [p1, p2]
        if self.npc == 3:
            pieces.append((r - p2.astype(dt)).astype(jnp.bfloat16))
        pk = jnp.stack(pieces, axis=1)  # [Kp, npc, fr_p, LANES]
        slot = jax.lax.rem(state["w"], jnp.int32(self.ring_chunks))
        ring = jax.lax.dynamic_update_slice(
            state["chunks"], pk,
            (slot, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )
        return {
            **state,
            "chunks": ring,
            "w": state["w"] + Kp,
            "carry": span[Kp * fr :],
        }

    def end(self, state):
        return {**state, "ended": jnp.asarray(True)}


class FusedFarmPipeline(Node):
    """Resample + biquad + gain + stream-mix mega-kernel over a LIVE
    chunk-ring feed (the streaming farm's device path). Mirrors
    FusedWidePipeline but reads the rolling ring with modulo chunk
    indexing; per-stream gains are folded at push time, so the mix is
    the exact binary-split matmul. Coefficients live in the state
    (live retune, zero re-trace)."""

    def __init__(self, feed: ChunkRingFeed, to_rate: int, n_streams: int,
                 kind: str = "low_pass", freq: float = 2000.0,
                 q: float = 0.5, *, m: int = 2, lookahead="auto",
                 firfold: bool = False):
        import math

        self.firfold = bool(firfold)

        self.input = feed
        wide = feed.spec.channels
        assert wide % n_streams == 0
        self.n_streams = n_streams
        C = wide // n_streams
        self.spec = StreamSpec(C, to_rate)
        g = math.gcd(feed.spec.sample_rate, to_rate)
        self.from_ = feed.spec.sample_rate // g
        self.to = to_rate // g
        assert self.from_ == feed.fr
        assert self.from_ != self.to and self.to >= 2
        self.m = m
        self.lookahead = _resolve_lookahead(lookahead, m * self.to)
        self.precision = "int3" if feed.npc == 3 else "int2"
        from .conversions.resample import Resample as _R

        class _Spec:  # minimal shim for Resample's operator build
            pass

        # reuse the constant lerp operator from a throwaway Resample
        src = _Spec()
        src.spec = StreamSpec(wide, feed.spec.sample_rate)
        src.input = None
        self._rs = _R.__new__(_R)
        self._rs.from_, self._rs.to = self.from_, self.to
        self._rs.spec = StreamSpec(wide, to_rate)
        _R._build_lerp_matrix(self._rs)
        self._kind, self._freq, self._q = kind, float(freq), float(q)
        if kind is None:
            # no filter stage requested: identity biquad (b0=1)
            self.coeffs = (1.0, 0.0, 0.0, 0.0, 0.0)
        else:
            ap = blt_coefficients(kind, to_rate, freq, q)
            self.coeffs = tuple(
                float(v) for v in (ap.b0, ap.b1, ap.b2, ap.a1, ap.a2)
            )
        from .ops.fused import LANES

        M = np.zeros((8, LANES), dtype=np.float32)
        for c in range(C):
            M[c, c:wide:C] = 1.0
        self._mixmat = jnp.asarray(M)
        self._lanes = LANES

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        dt = float_dtype()
        z = jnp.zeros((self._lanes,), dtype=dt)
        return {
            "in": self.input.init_state(),
            "out_o": jnp.zeros((), dtype=jnp.int32),
            "bq": (z, z, z, z),
            "coeffs": jnp.asarray(self.coeffs, dtype=dt),
            "op": self._build_op(self.coeffs),
        }

    def _build_op(self, coeffs):
        from .ops.fused import build_fused_operator

        return build_fused_operator(
            self._rs._G0, self._rs._g1, coeffs, fr=self.from_, to=self.to,
            m=self.m, fr_p=self.input.fr_p, npc=self.input.npc,
            precision=self.precision, lookahead=self.lookahead,
            bfold=True, firfold=self.firfold, dt=float_dtype(),
        )

    def retune(self, state: State, kind: Optional[str] = None,
               freq: Optional[float] = None,
               q: Optional[float] = None) -> State:
        """Zero-re-trace live retune (src/source/blt.rs:68-91)."""
        kind = self._kind if kind is None else kind
        freq = self._freq if freq is None else float(freq)
        q = self._q if q is None else float(q)
        ap = blt_coefficients(kind, self.spec.sample_rate, freq, q)
        co = tuple(float(v) for v in (ap.b0, ap.b1, ap.b2, ap.a1, ap.a2))
        return {**state, "coeffs": jnp.asarray(co, dtype=float_dtype()),
                "op": self._build_op(co)}

    def emit(self, state: State, n: int):
        import jax as _jax

        from .ops.fused import fused_resample_biquad_mix

        fr, to, m = self.from_, self.to, self.m
        assert n % (m * to) == 0
        dt = float_dtype()
        K = n // to
        ins = state["in"]
        o0 = state["out_o"]
        c0 = o0 // to                   # absolute chunk index
        # demand/overwrite guards become the feed's overflow flag: the
        # block needs chunks [c0, c0+K) resident — neither unwritten nor
        # already overwritten by newer pushes
        Nc = self.input.ring_chunks
        overflow = ins["overflow"] | (ins["w"] < c0 + K) | (
            c0 < ins["w"] - Nc
        )
        xn_t = jnp.zeros((K, self._lanes), dtype=dt)  # bfold: unused
        interpret = _jax.default_backend() != "tpu"
        # gain_post lanes come from the feed STATE (see ChunkRingFeed
        # init_state: shard-varying content must ride the state)
        gv = (ins["gain"].reshape(8, 128).astype(dt)
              if self.input.gain_post else None)
        mix8, bq = fused_resample_biquad_mix(
            ins["chunks"], c0, xn_t, self._rs._G0, self._rs._g1,
            self._mixmat, tuple(state["coeffs"][i] for i in range(5)),
            state["bq"], fr=fr, to=to, m=m,
            precision=self.precision, lookahead=self.lookahead,
            binary_mix=True, bfold=True, firfold=self.firfold,
            ring_chunks=Nc, op=state["op"], gains=gv,
            interpret=interpret,
        )
        out = mix8[: self.spec.channels, :]
        new_in = {**ins, "overflow": overflow}
        return (
            {**state, "in": new_in, "out_o": o0 + n, "bq": bq},
            out.astype(dt),
            jnp.asarray(n, jnp.int32),
        )


def make_flagship(n_streams: int = 512, *, seconds: float = 4.0,
                  in_rate: int = 44100, out_rate: int = 48000,
                  channels: int = 2, seed: int = 0,
                  scan_mode: str = "exact", with_agc: bool = False,
                  source_pcm: Optional[np.ndarray] = None,
                  max_block: int = 8192, lookahead="auto",
                  precision: str = "auto", firfold="auto",
                  ufir: bool = False, gain_post="auto",
                  agc_ring: str = "bf16", agc_group: int = 0,
                  agc_plan: str = "auto", m="auto",
                  dma_depth="auto", inkernel_limit: bool = False,
                  block_bf16: bool = False):
    """Build (master_node, state) for the flagship pipeline.

    ``source_pcm``: optional [channels, frames] PCM at in_rate shared as the
    base content (e.g. decoded music.wav); per-stream copies are rotated so
    the batch is heterogeneous. Without it, deterministic pseudo-noise.
    """
    rng = np.random.default_rng(seed)
    frames = int(seconds * in_rate)
    if source_pcm is None:
        base = rng.standard_normal((channels, frames)).astype(np.float32) * 0.1
    else:
        base = np.asarray(source_pcm, dtype=np.float32)
        if base.shape[1] < frames:
            reps = -(-frames // base.shape[1])
            base = np.tile(base, (1, reps))
        base = base[:channels, :frames]

    # wide-channel data: [S*C, frames], each stream a rotated copy
    shifts = rng.integers(0, frames, size=n_streams)
    wide = np.empty((n_streams * channels, frames), dtype=np.float32)
    for s in range(n_streams):
        wide[s * channels : (s + 1) * channels] = np.roll(
            base, int(shifts[s]), axis=1
        )

    gains = (
        rng.uniform(0.5, 1.5, size=n_streams).astype(np.float32) / n_streams
    )
    per_channel_gain = np.repeat(gains, channels)

    # pad the buffer for the largest contiguous fused-window read the
    # requested block size needs (K*fr + fr, flagship emit) — unlocks
    # T past the 8192-frame class default (VERDICT r4 ask #8)
    g = np.gcd(in_rate, out_rate)
    fr_, to_ = in_rate // g, out_rate // g
    pad_needed = (max_block // to_ + 2) * fr_
    chain = SamplesBuffer(
        n_streams * channels, in_rate, wide,
        pad_frames=max(8192, -(-pad_needed // 256) * 256),
    )
    if scan_mode == "fused":
        fused = FusedWidePipeline(
            chain, out_rate, gains, n_streams, "low_pass", 2000.0, 0.5,
            with_agc=with_agc, lookahead=lookahead, precision=precision,
            firfold=firfold, ufir=ufir, gain_post=gain_post,
            agc_ring=agc_ring, agc_group=agc_group, agc_plan=agc_plan,
            m=m, dma_depth=dma_depth,
            master_limit=LimitSettings() if inkernel_limit else None,
        )
        if inkernel_limit:
            # opt-in: the master-bus limiter as the mega-kernel epilogue
            # (one dispatch, same blocked plan + parity class as the node
            # path's TPU default). MEASURED SLOWER on v5e: the epilogue's
            # per-grid-step log2/exp2 + lane scans on [8,128] tiles cost
            # ~35 us/block, while the separate blocked-limiter dispatch
            # costs only ~3.8 us/block (interleaved A/B, BENCHMARKS.md
            # round-3 findings) — kept for the one-dispatch deployment
            # story, default OFF
            return fused, fused.init_state()
        master = Limit(fused, LimitSettings(), mode="auto")
        return master, master.init_state()
    chain = Resample(chain, out_rate, max_block=max_block)
    if block_bf16:
        # opt-in bf16 block contract (conversions/blockdtype.py): the
        # resampler's [S*C, T] output materializes at half width (cast
        # fused into the matmul epilogue); the biquad kernel upcasts on
        # load and stores bf16 back — both big HBM round-trips halve
        from .conversions.blockdtype import Bf16Boundary

        chain = Bf16Boundary(chain)
    chain = BltFilter(chain, "low_pass", 2000.0, 0.5, mode=scan_mode)
    if with_agc:
        from .effects.agc import AgcSettings, AutomaticGainControl

        chain = AutomaticGainControl(
            chain, AgcSettings(), mode=scan_mode, streams=n_streams
        )
    chain = Amplify(chain, per_channel_gain)
    chain = WideMixer(chain, n_streams)
    master = Limit(chain, LimitSettings(), mode=scan_mode)
    return master, master.init_state()
