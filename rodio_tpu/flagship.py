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
                 precision: str = "auto", lookahead: int = 4,
                 subblk: int = 0,
                 with_agc: bool = False, agc_settings=None):
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
        self.m = m
        self.lookahead = lookahead
        if precision == "auto":
            # int3: exact bf16 dots (integer-scaled weights + exact
            # 3-way bf16 split of the PCM); weights <= 256 ride one
            # dot, bigger ratios split the operator as 4*hi + lo
            # (ops/fused.py wsplit) up to to = 1024
            precision = "int3" if self.to <= 1024 else "highest"
        if precision in ("int3", "int2") and self.to > 320:
            self.m = 1  # VMEM budget for large-`to` grids
        self.precision = precision
        #: boundary-frame folding (padding-row g1 term); int-piece only
        self.bfold = precision in ("int3", "int2")
        # reuse the resampler's constant lerp operator
        self._rs = Resample(input_node, to_rate)
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
        fr_p = -(-(fr + 1) // 16) * 16
        chunks = jnp.pad(
            data_t[: nc * fr].reshape(nc, fr, self._lanes),
            ((0, 0), (0, fr_p - fr), (0, 0)),
        )
        boundary = jnp.concatenate(
            [data_t[fr::fr][: nc - 1], jnp.zeros((1, self._lanes),
                                                 data_t.dtype)], axis=0
        )  # [nc, LANES]: first frame of chunk j+1 (zero past the end)
        chunks = chunks.at[:, fr, :].set(boundary)
        if self.precision in ("int3", "int2"):
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
        }
        if self.with_agc:
            mto = self.m * self.to
            rs_slots = -(-self._lag // mto) + 2
            state["agc"] = (
                jnp.zeros((12, 128), dtype=dt).at[8:12].set(1.0)
            )
            state["ring"] = jnp.zeros((rs_slots, mto, 8, 128), dtype=dt)
        return state

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
        pad = getattr(type(self.input), "PAD_FRAMES", 0)
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
            mix8, bq, agc_new, ring_new = fused_resample_biquad_agc_mix(
                chunks, c0c, k0, xn_t, self._rs._G0, self._rs._g1,
                self._mixmat, self.coeffs, state["bq"], state["agc"],
                state["ring"], fr=fr, to=to, m=m,
                precision=self.precision, lookahead=self.lookahead,
                agc_params=self._agc_params, lag=self._lag,
                bfold=self.bfold,
                interpret=interpret,
            )
            extra = {"agc": agc_new, "ring": ring_new}
        else:
            mix8, bq = fused_resample_biquad_mix(
                chunks, c0c, xn_t, self._rs._G0, self._rs._g1, self._mixmat,
                self.coeffs, state["bq"], fr=fr, to=to, m=m,
                precision=self.precision, lookahead=self.lookahead,
                subblk=self.subblk, binary_mix=True,
                bfold=self.bfold,
                interpret=interpret,
            )
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


def make_flagship(n_streams: int = 512, *, seconds: float = 4.0,
                  in_rate: int = 44100, out_rate: int = 48000,
                  channels: int = 2, seed: int = 0,
                  scan_mode: str = "exact", with_agc: bool = False,
                  source_pcm: Optional[np.ndarray] = None,
                  max_block: int = 8192, lookahead: int = 4,
                  precision: str = "auto"):
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

    chain = SamplesBuffer(n_streams * channels, in_rate, wide)
    if scan_mode == "fused":
        fused = FusedWidePipeline(
            chain, out_rate, gains, n_streams, "low_pass", 2000.0, 0.5,
            with_agc=with_agc, lookahead=lookahead, precision=precision,
        )
        master = Limit(fused, LimitSettings(), mode="auto")
        return master, master.init_state()
    chain = Resample(chain, out_rate, max_block=max_block)
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
