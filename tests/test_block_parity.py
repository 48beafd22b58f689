"""Block engine vs scalar reference engine parity.

Every test builds the same audio graph twice — once with the per-sample
refimpl oracle, once with the block engine — and compares outputs at f32
tolerance (the BASELINE 1e-6 contract).
"""
import numpy as np
import pytest

import rodio_tpu.refimpl as ri
from rodio_tpu.effects import (
    AgcSettings,
    Amplify,
    AutomaticGainControl,
    BltFilter,
    ChannelVolume,
    Delay,
    Distortion,
    Limit,
    LimitSettings,
    LinearGainRamp,
    Mix,
    SkipDuration,
    TakeDuration,
)
from rodio_tpu.conversions import Resample, Uniform
from rodio_tpu.graph import render
from rodio_tpu.sources import Chirp, SamplesBuffer, SignalGenerator, Zero


def interleave(block):
    """[C, F] -> interleaved 1-D"""
    return np.asarray(block).T.reshape(-1)


def ref_collect(src, limit=500_000):
    out = []
    for _ in range(limit):
        v = src.next()
        if v is None:
            break
        out.append(v)
    return np.asarray(out, dtype=np.float32)


def rand_buffer(rng, channels, frames, rate=48000):
    data = rng.uniform(-1, 1, size=frames * channels).astype(np.float32)
    return (
        ri.SamplesBuffer(channels, rate, data),
        SamplesBuffer(channels, rate, data),
        data,
    )


# ---------------- sources ----------------

def test_buffer_passthrough(rng):
    ref, blk, data = rand_buffer(rng, 2, 1000)
    out = render(blk, block_frames=256)
    np.testing.assert_array_equal(interleave(out), data)


def test_buffer_odd_blocks(rng):
    ref, blk, data = rand_buffer(rng, 2, 777)
    out = render(blk, block_frames=256)
    np.testing.assert_array_equal(interleave(out), data)


@pytest.mark.parametrize("func", ["sine", "triangle", "square", "sawtooth"])
def test_generator_parity(func):
    ref = ri.SignalGenerator(48000, 440.0, func)
    blk = SignalGenerator(48000, 440.0, func)
    n = 2048
    expected = ref_collect(ref, n)[:n]
    got = interleave(render(blk, max_frames=n, block_frames=512))
    # the reference accumulates phase in f32 (drifts); the block engine is
    # closed-form. For continuous waveforms the drift over 2048 samples stays
    # within 2e-4; discontinuous ones (square/sawtooth) may flip the single
    # sample AT a jump when the phases differ by one ulp.
    err = np.abs(got - expected)
    if func in ("square", "sawtooth"):
        assert np.sum(err > 2e-4) <= 4  # only isolated edge samples
    else:
        np.testing.assert_allclose(got, expected, atol=2e-4)


def test_generator_f64_accuracy():
    # the block engine should be CLOSER to the ideal waveform than the
    # accumulating reference over long windows
    n = 48000 * 5
    blk = SignalGenerator(48000, 440.0, "sine")
    got = interleave(render(blk, max_frames=n, block_frames=4096))
    i = np.arange(n, dtype=np.float64)
    ideal = np.sin(2 * np.pi * ((i * (440.0 / 48000.0)) % 1.0))
    assert np.max(np.abs(got - ideal)) < 5e-5


def test_chirp_parity():
    ref = ri.Chirp(48000, 100.0, 1000.0, 500_000_000)
    blk = Chirp(48000, 100.0, 1000.0, 0.5)
    expected = ref_collect(ref)
    got = interleave(render(blk, block_frames=1024))
    assert len(got) == len(expected)
    # the chirp phase reaches ~3000 rad; XLA's sin argument reduction differs
    # from libm's there by ~1e-4 (the reference's own formula has the same
    # f32 phase granularity, so neither is "righter")
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_chirp_parity_small_phase():
    # at small phase arguments the engines agree tightly
    ref = ri.Chirp(48000, 20.0, 60.0, 200_000_000)
    blk = Chirp(48000, 20.0, 60.0, 0.2)
    expected = ref_collect(ref)
    got = interleave(render(blk, block_frames=1024))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_zero_finite():
    blk = Zero(2, 48000, num_frames=100)
    out = render(blk, block_frames=64)
    assert out.shape == (2, 100)
    assert np.all(out == 0)


# ---------------- resampler ----------------

@pytest.mark.parametrize(
    "from_rate,to_rate",
    [
        (44100, 48000),
        (48000, 44100),
        (48000, 96000),
        (96000, 48000),
        (22050, 48000),
        (48000, 8000),
        (44100, 192000),
        (12000, 2400),
        (1000, 7000),
    ],
)
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("path", ["fast", "generic"])
def test_resample_parity(rng, from_rate, to_rate, channels, path):
    frames = 997
    data = rng.uniform(-1, 1, size=frames * channels).astype(np.float32)
    ref_src = ri.SamplesBuffer(channels, from_rate, data)

    class _Iter:
        def __init__(self, s):
            self.s = s

        def next(self):
            return self.s.next()

    conv = ri.SampleRateConverter(_Iter(ref_src), from_rate, to_rate, channels)
    expected = []
    while True:
        v = conv.next()
        if v is None:
            break
        expected.append(v)
    expected = np.asarray(expected, dtype=np.float32)

    src = SamplesBuffer(channels, from_rate, data)
    if path == "generic":
        src = _HideRandomAccess(src)  # force the streaming ring path
    blk = Resample(src, to_rate, max_block=1024)
    assert blk.total_frames() == len(expected) // channels
    got = interleave(render(blk, block_frames=251))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=2e-7)


class _HideRandomAccess:
    """Wrapper that hides gather access so the resampler exercises its
    generic streaming-ring path."""

    def __init__(self, inner):
        self._inner = inner
        self.spec = inner.spec

    def total_frames(self):
        return self._inner.total_frames()

    def init_state(self):
        return self._inner.init_state()

    def emit(self, state, n):
        return self._inner.emit(state, n)


def test_resample_identity(rng):
    _, blk_src, data = rand_buffer(rng, 2, 500, rate=44100)
    blk = Resample(blk_src, 44100)
    got = interleave(render(blk, block_frames=128))
    np.testing.assert_array_equal(got, data)


def test_uniform_rodio_compat_long_buffer(rng):
    """Span re-bootstrap every 32768 samples (src/source/uniform.rs:56)."""
    channels, frames = 2, 40_000  # 80k samples -> 3 spans
    data = rng.uniform(-1, 1, size=frames * channels).astype(np.float32)
    ref_u = ri.UniformSourceIterator(
        ri.SamplesBuffer(channels, 44100, data), 2, 48000
    )
    expected = ref_collect(ref_u)
    blk = Uniform(
        SamplesBuffer(channels, 44100, data), 2, 48000, rodio_compat=True
    )
    got = interleave(render(blk, block_frames=1024))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=2e-7)


def test_uniform_channel_upmix(rng):
    _, blk_src, data = rand_buffer(rng, 1, 300)
    blk = Uniform(blk_src, 2, 48000)
    got = render(blk)
    np.testing.assert_array_equal(got[0], data)
    np.testing.assert_array_equal(got[1], data)


# ---------------- stateless effects ----------------

def test_amplify_parity(rng):
    ref_src, blk_src, _ = rand_buffer(rng, 2, 500)
    expected = ref_collect(ri.Amplify(ref_src, 0.7))
    got = interleave(render(Amplify(blk_src, 0.7), block_frames=128))
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_distortion_parity(rng):
    ref_src, blk_src, _ = rand_buffer(rng, 2, 500)
    expected = ref_collect(ri.Distortion(ref_src, 3.0, 0.8))
    got = interleave(render(Distortion(blk_src, 3.0, 0.8), block_frames=128))
    np.testing.assert_allclose(got, expected, atol=1e-7)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("clamp_end", [True, False])
def test_ramp_parity(rng, channels, clamp_end):
    ref_src, blk_src, _ = rand_buffer(rng, channels, 2000)
    dur_ns = 25_000_000  # 25 ms -> ramp over 1200 frames
    expected = ref_collect(
        ri.LinearGainRamp(ref_src, dur_ns, 0.2, 0.9, clamp_end)
    )
    blk = LinearGainRamp(blk_src, 0.025, 0.2, 0.9, clamp_end)
    got = interleave(render(blk, block_frames=256))
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("channels", [1, 2])
def test_take_parity(rng, channels):
    ref_src, blk_src, _ = rand_buffer(rng, channels, 2000)
    dur_ns = 17_345_678
    expected = ref_collect(ri.TakeDuration(ref_src, dur_ns))
    blk = TakeDuration(blk_src, dur_ns / 1e9)
    got = interleave(render(blk, block_frames=256))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


@pytest.mark.parametrize("channels", [1, 2])
def test_take_fadeout_ms_truncation_parity(rng, channels):
    """fadeout gain = floor(remaining_ns/1e6)/floor(total_ns/1e6) — the
    reference's whole-millisecond as_millis truncation
    (src/source/take.rs:36-38), reproduced exactly by the block engine's
    (ms, ns-within-ms) i32 carry. Odd block size so blocks straddle ms
    boundaries (1 ms = 44.1 frames here)."""
    ref_src, blk_src, _ = rand_buffer(rng, channels, 12000, rate=44100)
    dur_ns = 234_567_000
    ref = ri.TakeDuration(ref_src, dur_ns)
    ref.set_filter_fadeout()
    expected = ref_collect(ref)
    blk = TakeDuration(blk_src, dur_ns / 1e9, fadeout=True)
    got = interleave(render(blk, block_frames=193))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_take_fadeout_long_position_i32_carry(rng):
    """Positions past 2.1 s would overflow naive i32 nanosecond math
    (frame*c*dps > 2^31); the carried (fade_ms, fade_r) pair keeps every
    traced value inside i32 at any position."""
    ref_src, blk_src, _ = rand_buffer(rng, 2, 25000, rate=8000)
    dur_ns = 3_000_000_000  # 3 s > 2^31 ns
    ref = ri.TakeDuration(ref_src, dur_ns)
    ref.set_filter_fadeout()
    expected = ref_collect(ref, limit=200_000)
    blk = TakeDuration(blk_src, dur_ns / 1e9, fadeout=True)
    got = interleave(render(blk, block_frames=1024))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_take_mid_frame_padding():
    # duration ending mid-frame pads with silence (src/source/take.rs:115-123)
    ref_src = ri.SamplesBuffer(2, 44100, [1.0] * 20)
    dps = 1_000_000_000 // (44100 * 2)
    expected = ref_collect(ri.TakeDuration(ref_src, dps * 5))
    blk = TakeDuration(SamplesBuffer(2, 44100, [1.0] * 20), dps * 5 / 1e9)
    got = interleave(render(blk, block_frames=16))
    assert len(got) == len(expected) == 6
    np.testing.assert_array_equal(got, expected)


def test_delay_parity(rng):
    ref_src, blk_src, _ = rand_buffer(rng, 2, 1000)
    dur_ns = 3_000_000
    expected = ref_collect(ri.Delay(ref_src, dur_ns))
    got = interleave(render(Delay(blk_src, 0.003), block_frames=128))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_skip_parity(rng):
    ref_src, blk_src, _ = rand_buffer(rng, 2, 2000)
    dur_ns = 10_000_000
    expected = ref_collect(ri.skip_duration(ref_src, dur_ns))
    got = interleave(render(SkipDuration(blk_src, 0.010), block_frames=256))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_channel_volume_parity(rng):
    ref_src, blk_src, _ = rand_buffer(rng, 2, 600)
    expected = ref_collect(ri.ChannelVolume(ref_src, [0.5, 2.0, 0.25]))
    got = interleave(
        render(ChannelVolume(blk_src, [0.5, 2.0, 0.25]), block_frames=128)
    )
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_mix_parity(rng):
    ref_a, blk_a, _ = rand_buffer(rng, 2, 700)
    ref_b, blk_b, _ = rand_buffer(rng, 2, 400)
    expected = ref_collect(ri.Mix(ref_a, ref_b))
    got = interleave(render(Mix(blk_a, blk_b), block_frames=128))
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_mix_different_formats(rng):
    """input2 gets uniformized to input1's format (src/source/mix.rs:20-22)."""
    ref_a, blk_a, _ = rand_buffer(rng, 2, 500, rate=48000)
    data_b = rng.uniform(-1, 1, size=300).astype(np.float32)
    ref_b = ri.SamplesBuffer(1, 44100, data_b)
    blk_b = SamplesBuffer(1, 44100, data_b)
    expected = ref_collect(ri.Mix(ref_a, ref_b))
    got = interleave(
        render(Mix(blk_a, blk_b, rodio_compat=True), block_frames=128)
    )
    assert len(got) == len(expected)
    np.testing.assert_allclose(got, expected, atol=2e-7)


# ---------------- stateful effects ----------------

@pytest.mark.parametrize("kind", ["low_pass", "high_pass"])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("mode", ["exact", "parallel"])
def test_blt_parity(rng, kind, channels, mode):
    ref_src, blk_src, _ = rand_buffer(rng, channels, 3000, rate=44100)
    expected = ref_collect(ri.BltFilter(ref_src, kind, 1200.0, 0.5))
    blk = BltFilter(blk_src, kind, 1200.0, 0.5, mode=mode)
    got = interleave(render(blk, block_frames=512))
    assert len(got) == len(expected)
    # exact mode matches up to FMA contraction (XLA fuses mul-adds; the TPU
    # VPU does the same) — a 2-ulp rounding-path difference, not drift
    tol = 3e-6 if mode == "exact" else 5e-5
    np.testing.assert_allclose(got, expected, atol=tol)


@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("mode", ["exact", "parallel"])
def test_limit_parity(rng, channels, mode):
    frames = 3000
    data = (
        rng.uniform(-1, 1, size=frames * channels).astype(np.float32) * 2.0
    )
    ref_src = ri.SamplesBuffer(channels, 44100, data)
    blk_src = SamplesBuffer(channels, 44100, data)
    expected = ref_collect(ri.Limit(ref_src, ri.LimitSettings()))
    blk = Limit(blk_src, LimitSettings(), mode=mode)
    got = interleave(render(blk, block_frames=512))
    assert len(got) == len(expected)
    tol = 1e-6 if mode == "exact" else 1e-4
    np.testing.assert_allclose(got, expected, atol=tol)


def test_limit_settles_to_threshold():
    """A -6 dB limited loud sine settles near 0.5 peak (tests/limit.rs)."""
    from rodio_tpu.sources import SineWave

    blk = Limit(
        Amplify(SineWave(440.0), 2.0),
        LimitSettings(threshold=-6.0, knee_width=0.5),
    )
    out = render(blk, max_frames=48000, block_frames=4096)
    settled = np.abs(out[0, 24000:])
    assert 0.45 < settled.max() < 0.56


@pytest.mark.parametrize("channels", [1, 2])
def test_agc_parity(rng, channels):
    frames = 3000
    data = (
        rng.uniform(-1, 1, size=frames * channels).astype(np.float32) * 0.3
    )
    ref_src = ri.SamplesBuffer(channels, 44100, data)
    blk_src = SamplesBuffer(channels, 44100, data)
    expected = ref_collect(
        ri.AutomaticGainControl(ref_src, ri.AgcSettings())
    )
    blk = AutomaticGainControl(blk_src, AgcSettings(), mode="exact")
    got = interleave(render(blk, block_frames=512))
    assert len(got) == len(expected)
    # FMA contraction inside the envelope scans gives few-ulp per-step
    # differences; the gain recurrence is contracting, so the deviation
    # stays bounded (~1e-5 relative)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_agc_parity_long_window(rng):
    """Cross the 8192-sample RMS ring boundary."""
    frames = 12000
    data = rng.uniform(-1, 1, size=frames).astype(np.float32) * 0.4
    ref_src = ri.SamplesBuffer(1, 44100, data)
    blk_src = SamplesBuffer(1, 44100, data)
    expected = ref_collect(
        ri.AutomaticGainControl(ref_src, ri.AgcSettings())
    )
    blk = AutomaticGainControl(blk_src, AgcSettings(), mode="exact")
    got = interleave(render(blk, block_frames=999))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_agc_parallel_close(rng):
    frames = 12000
    data = rng.uniform(-1, 1, size=frames).astype(np.float32) * 0.4
    blk_src = SamplesBuffer(1, 44100, data)
    exact = interleave(
        render(
            AutomaticGainControl(blk_src, AgcSettings(), mode="exact"),
            block_frames=1024,
        )
    )
    par = interleave(
        render(
            AutomaticGainControl(
                SamplesBuffer(1, 44100, data), AgcSettings(), mode="parallel"
            ),
            block_frames=1024,
        )
    )
    np.testing.assert_allclose(par, exact, atol=1e-4)


# ---------------- combinator chains ----------------

def test_pipeline_chain_parity(rng):
    """A multi-effect chain end to end."""
    frames = 5000
    data = rng.uniform(-1, 1, size=frames * 2).astype(np.float32)

    ref = ri.SamplesBuffer(2, 44100, data)
    ref = ri.BltFilter(ref, "high_pass", 300.0, 0.5)
    ref = ri.Amplify(ref, 1.2)
    ref = ri.fade_in(ref, 20_000_000)
    ref = ri.Delay(ref, 10_000_000)  # even interleaved count at 44.1k stereo
    expected = ref_collect(ref)

    blk = SamplesBuffer(2, 44100, data)
    blk = BltFilter(blk, "high_pass", 300.0, 0.5)
    blk = Amplify(blk, 1.2)
    blk = blk.fade_in(0.020)
    blk = Delay(blk, 0.010)
    got = interleave(render(blk, block_frames=512))
    assert len(got) == len(expected)
    # resonant IIR feedback amplifies the FMA-vs-two-step rounding
    # difference (see ops/scan.py docs); bounded, not drifting
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_reverb_runs(rng):
    _, blk_src, _ = rand_buffer(rng, 2, 2000)
    out = render(blk_src.reverb(0.01, 0.5), block_frames=256)
    assert out.shape[0] == 2
    assert out.shape[1] > 2000  # delayed echo extends the stream


def test_repeat(rng):
    _, blk_src, data = rand_buffer(rng, 2, 100)
    rep = blk_src.repeat_infinite()
    out = render(rep, max_frames=350, block_frames=64)
    expected = np.tile(data.reshape(100, 2).T, (1, 4))[:, :350]
    np.testing.assert_array_equal(out, expected)


def test_wav_roundtrip(tmp_path, rng):
    from rodio_tpu.io import read_wav, wav_to_file

    _, blk_src, data = rand_buffer(rng, 2, 1000)
    path = tmp_path / "out.wav"
    wav_to_file(blk_src, str(path))
    pcm, rate = read_wav(str(path))
    assert rate == 48000
    np.testing.assert_array_equal(interleave(pcm), data)


def test_blt_pallas_mode(rng):
    """The Pallas fused biquad matches the scan bit-for-bit (interpret mode
    on CPU; the same kernel compiles for TPU)."""
    ref_src, blk_src, _ = rand_buffer(rng, 2, 2000, rate=44100)
    exact = interleave(
        render(BltFilter(blk_src, "low_pass", 1200.0, 0.5, mode="exact"),
               block_frames=512)
    )
    blk2 = SamplesBuffer(2, 44100,
                         np.asarray(render(blk_src)).T.reshape(-1))
    pal = interleave(
        render(BltFilter(blk2, "low_pass", 1200.0, 0.5, mode="pallas"),
               block_frames=512)
    )
    np.testing.assert_array_equal(pal, exact)


def test_agc_wide_stream_groups(rng):
    """AGC with streams=S over the wide-channel layout equals S independent
    per-stream AGCs."""
    S, C, frames = 3, 2, 4000
    per = []
    wides = []
    for s in range(S):
        data = rng.uniform(-0.5, 0.5, (C, frames)).astype(np.float32)
        wides.append(data)
        node = AutomaticGainControl(
            SamplesBuffer(C, 44100, data), AgcSettings(), mode="exact"
        )
        per.append(np.asarray(render(node, block_frames=512)))
    wide = np.concatenate(wides, axis=0)  # [S*C, frames]
    node = AutomaticGainControl(
        SamplesBuffer(S * C, 44100, wide), AgcSettings(), mode="exact",
        streams=S,
    )
    got = np.asarray(render(node, block_frames=512))
    for s in range(S):
        np.testing.assert_allclose(
            got[s * C : (s + 1) * C], per[s], atol=1e-6
        )


def test_limit_wide_stream_groups(rng):
    """Limit with streams=S couples gains within each group only."""
    S, C, frames = 3, 2, 3000
    per = []
    wides = []
    for s in range(S):
        data = (rng.uniform(-1, 1, (C, frames)) * (0.5 + s)).astype(np.float32)
        wides.append(data)
        node = Limit(SamplesBuffer(C, 44100, data), LimitSettings(),
                     mode="exact")
        per.append(np.asarray(render(node, block_frames=512)))
    wide = np.concatenate(wides, axis=0)
    node = Limit(SamplesBuffer(S * C, 44100, wide), LimitSettings(),
                 mode="exact", streams=S)
    got = np.asarray(render(node, block_frames=512))
    for s in range(S):
        np.testing.assert_allclose(got[s * C : (s + 1) * C], per[s], atol=1e-6)


def test_limit_pallas_mode_blocked(rng):
    """The blocked parallel-in-time limiter (power-of-two block sizes,
    stereo master bus) matches the exact scan to reassociation ulps."""
    data = (rng.uniform(-1, 1, (2, 3000)) * 2.0).astype(np.float32)
    exact = np.asarray(render(
        Limit(SamplesBuffer(2, 44100, data), LimitSettings(), mode="exact"),
        block_frames=512))
    pal = np.asarray(render(
        Limit(SamplesBuffer(2, 44100, data), LimitSettings(), mode="pallas"),
        block_frames=512))
    np.testing.assert_allclose(pal, exact, atol=4e-6)


def test_limit_pallas_mode_sequential(rng):
    """Block sizes without a power-of-two factor fall back to the
    sequential envelope kernel, which is bit-identical to the scan."""
    data = (rng.uniform(-1, 1, (2, 3000)) * 2.0).astype(np.float32)
    exact = np.asarray(render(
        Limit(SamplesBuffer(2, 44100, data), LimitSettings(), mode="exact"),
        block_frames=251))
    pal = np.asarray(render(
        Limit(SamplesBuffer(2, 44100, data), LimitSettings(), mode="pallas"),
        block_frames=251))
    np.testing.assert_array_equal(pal, exact)


def test_agc_pallas_mode(rng):
    """Pallas-mode AGC stays close to exact (cumsum RMS reordering only)."""
    data = rng.uniform(-0.4, 0.4, (2, 6000)).astype(np.float32)
    exact = np.asarray(render(
        AutomaticGainControl(SamplesBuffer(2, 44100, data), AgcSettings(),
                             mode="exact"), block_frames=1024))
    pal = np.asarray(render(
        AutomaticGainControl(SamplesBuffer(2, 44100, data), AgcSettings(),
                             mode="pallas"), block_frames=1024))
    np.testing.assert_allclose(pal, exact, atol=1e-4)


def test_agc_group_mode(rng):
    """Node-path group-rate AGC (AgcGroup contract, effects/agc.py):
    the group smoother uses the group-MAX peak, so deviation from the
    per-sample smoother is one-sided (never MORE gain near transients).
    Tracking is tight (<= ~1e-3) in the design regimes — RMS-dominated
    content, or release time >> group duration — and loose-but-safe on
    peak-limited content with the instant-release default. Invalid
    configurations are rejected."""

    def pair(data, settings):
        exact = np.asarray(render(
            AutomaticGainControl(SamplesBuffer(2, 44100, data), settings,
                                 mode="exact"), block_frames=1024))
        grp = np.asarray(render(
            AutomaticGainControl(SamplesBuffer(2, 44100, data), settings,
                                 mode="pallas", group=8),
            block_frames=1024))
        rel = np.abs(grp - exact) / (np.abs(exact) + 1e-6)
        mask = rel > 1e-3
        onesided = (not mask.any()) or np.all(
            np.abs(grp[mask]) <= np.abs(exact[mask]) + 1e-6)
        return rel.max(), onesided

    data = rng.uniform(-0.4, 0.4, (2, 8192)).astype(np.float32)
    # design regime 1: RMS-dominated (peak limiter not binding)
    mx, ones = pair(data * 0.25, AgcSettings())
    assert mx < 2e-3 and ones
    # design regime 2: peak-limited but release >> group duration
    mx, ones = pair(data, AgcSettings(release_time=0.1))
    assert mx < 2e-3 and ones
    # out-of-regime (peak-limited + instant release): the exact gain is
    # per-sample spiky; the staircase deviates (measured ~0.11 here)
    # but ALWAYS toward less gain — a transient is never amplified
    # above the per-sample mode's output
    mx, ones = pair(data, AgcSettings())
    assert mx < 0.2 and ones

    with pytest.raises(ValueError, match="mode='pallas'"):
        AutomaticGainControl(SamplesBuffer(2, 44100, data), AgcSettings(),
                             mode="exact", group=8)
    with pytest.raises(ValueError, match=">= 2"):
        AutomaticGainControl(SamplesBuffer(2, 44100, data), AgcSettings(),
                             mode="pallas", group=1)
    # group must divide the block's interleaved-sample count
    bad = AutomaticGainControl(SamplesBuffer(2, 44100, data),
                               AgcSettings(), mode="pallas", group=24)
    with pytest.raises(ValueError, match="divide"):
        bad.emit(bad.init_state(), 1024)


@pytest.mark.parametrize("blocks", [(256, 1024), (251, 997)])
def test_block_size_invariance(rng, blocks):
    """Rendering must not depend on block size: the same chain rendered
    with different block sizes produces identical audio (state carries are
    exact across boundaries)."""
    b1, b2 = blocks
    data = rng.uniform(-1, 1, (2, 9000)).astype(np.float32)

    def chain():
        node = SamplesBuffer(2, 44100, data).resample(48000)
        node = BltFilter(node, "low_pass", 1500.0, 0.5)
        node = AutomaticGainControl(node, AgcSettings())
        node = Limit(node.amplify(1.5), LimitSettings())
        return node

    out1 = np.asarray(render(chain(), block_frames=b1))
    out2 = np.asarray(render(chain(), block_frames=b2))
    assert out1.shape == out2.shape
    np.testing.assert_array_equal(out1, out2)


def test_bf16_block_mode(rng):
    """The opt-in bf16 block-dtype contract (conversions/blockdtype.py):
    the unfused wide chain with bf16 stage boundaries tracks the f32
    render within the documented bound (~2^-9 relative per boundary;
    a resonant biquad can integrate it to ~1e-2), with compute and
    carries staying f32 (the mixer's 512-way sum accumulates f32)."""
    import jax

    from rodio_tpu.flagship import make_flagship

    outs = {}
    for bf16 in (False, True):
        node, state = make_flagship(
            16, seconds=0.6, seed=4, scan_mode="pallas",
            max_block=1024, block_bf16=bf16,
        )
        step = jax.jit(lambda s, node=node: node.emit(s, 512))
        acc = []
        for _ in range(4):
            state, out, v = step(state)
            assert int(v) == 512
            acc.append(np.asarray(out, np.float32))
        outs[bf16] = np.concatenate(acc, axis=1)
    ref = outs[False]
    err = np.abs(outs[True] - ref).max() / max(np.abs(ref).max(), 1e-9)
    # documented contract bound: ~1e-3-class quantization, biquad-
    # integrated worst case pinned at 1e-2 relative
    assert err < 1e-2, f"bf16 block mode deviates {err:.3g}"
    # and it must not be trivially identical (the boundary is real)
    assert err > 1e-6
