"""Fused mega-kernel (ops/fused.py + flagship.FusedWidePipeline) parity.

The fused resample+biquad+gain+mix kernel must match the unfused chain
(Resample -> BltFilter -> Amplify -> WideMixer) block for block. On CPU
these run under the Pallas interpreter; the same comparisons hold on TPU
hardware (checked at ~5e-9, see BENCHMARKS.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodio_tpu.conversions.resample import Resample
from rodio_tpu.effects.basic import Amplify
from rodio_tpu.effects.blt import BltFilter
from rodio_tpu.flagship import FusedWidePipeline, make_flagship
from rodio_tpu.parallel.batch import WideMixer
from rodio_tpu.sources.generators import SamplesBuffer


def _pipe(node):
    """The FusedWidePipeline: under a Limit wrapper (the default) or the
    node itself (inkernel_limit=True, the opt-in epilogue limiter)."""
    return node if isinstance(node, FusedWidePipeline) else node.input


@pytest.mark.slow
def test_fused_inkernel_limiter_parity(rng):
    """Opt-in in-kernel master limiter (the mega-kernel epilogue) vs the
    separate blocked Limit dispatch: same blocked parallel-in-time plan,
    so outputs agree to the blocked-limiter parity class (~4e-6) with
    carries preserved across blocks. (Measured SLOWER than the separate
    dispatch on v5e — kept opt-in; BENCHMARKS.md round-3 findings.)"""
    node_k, sk = make_flagship(8, seconds=0.7, seed=3, scan_mode="fused",
                               inkernel_limit=True)
    node_s, ss = make_flagship(8, seconds=0.7, seed=3, scan_mode="fused",
                               inkernel_limit=False)
    assert isinstance(node_k, FusedWidePipeline)
    assert not isinstance(node_s, FusedWidePipeline)
    ek = jax.jit(lambda s: node_k.emit(s, 640))
    es = jax.jit(lambda s: node_s.emit(s, 640))
    for blk in range(4):
        sk, ok, vk = ek(sk)
        ss, os_, vs = es(ss)
        assert int(vk) == int(vs)
        np.testing.assert_allclose(
            np.asarray(ok), np.asarray(os_), atol=8e-6,
            err_msg=f"block {blk}",
        )


def _pair(rng, S=8, frames=44100, freq=2000.0, q=0.5):
    C = 2
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S

    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        "low_pass", freq, q,
    )
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", freq, q, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    return fused, ch


def test_fused_matches_unfused_chain(rng):
    fused, ch = _pair(rng)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(5):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 640
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=2e-7)


def test_fused_block_size_invariance(rng):
    """Different (aligned) block sizes produce the same samples."""
    fused_a, _ = _pair(rng, frames=22050)
    fused_b, _ = _pair(np.random.default_rng(0), frames=22050)
    rng2 = np.random.default_rng(7)
    wide = (rng2.standard_normal((8, 22050)) * 0.1).astype(np.float32)
    gains = rng2.uniform(0.5, 1.5, 4).astype(np.float32)

    def render(T, nb):
        node = FusedWidePipeline(
            SamplesBuffer(8, 44100, wide), 48000, gains, 4
        )
        s = node.init_state()
        f = jax.jit(lambda s: node.emit(s, T))
        outs = []
        for _ in range(nb):
            s, o, v = f(s)
            outs.append(np.asarray(o))
        return np.concatenate(outs, axis=1)

    a = render(320, 6)
    b = render(640, 3)
    # split-residual level: under the Pallas interpreter XLA may fold the
    # exact bf16 mix pieces back into a full-precision dot in one program
    # shape but not the other (--xla_allow_excess_precision), so the two
    # renders differ by up to the 2^-18-relative split residual; on TPU
    # hardware the pieces are materialized and the comparison is
    # deterministic (measured 512-stream parity: 3.7e-8, BENCHMARKS.md)
    np.testing.assert_allclose(a, b[:, : a.shape[1]], atol=2e-6)


def test_fused_tail_drain_and_silence(rng):
    """Validity bookkeeping matches the unfused resampler at stream end;
    the one drain frame is a documented deviation (zero right-neighbor
    lerp instead of the raw last frame)."""
    S, C = 4, 2
    frames = 13230  # 0.3 s -> 14400 out frames; last block partial
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = np.full(S, 0.25, np.float32)
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S
    )
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)

    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for blk in range(25):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu)
        if int(vf) == 0:
            assert float(jnp.max(jnp.abs(of))) == 0.0
        elif int(vf) == 640:
            # gains here are O(1) (not 1/S-normalized), so the exact-mix
            # 2^-18-relative split residual reaches ~7e-7 absolute; the
            # 1e-6 contract is the binding bound
            np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                       atol=1e-6)


def test_fused_rejects_misaligned_block(rng):
    fused, _ = _pair(rng, frames=8000)
    with pytest.raises(AssertionError, match="multiple"):
        fused.emit(fused.init_state(), 4096)


def test_fused_flagship_factory(rng):
    node, state = make_flagship(8, seconds=0.5, scan_mode="fused", seed=1)
    state, out, valid = jax.jit(lambda s: node.emit(s, 640))(state)
    assert out.shape == (2, 640)
    assert int(valid) == 640
    assert float(jnp.max(jnp.abs(out))) > 0


@pytest.mark.slow
def test_fused_agc_matches_unfused_exact_chain(rng):
    """The in-kernel AGC stage (decomposed rsqrt form + HBM sq-ring)
    must match the unfused exact chain (Resample -> Blt -> AGC ->
    Amplify -> WideMixer -> Limit) through the 8192-sample RMS window
    wraparound (src/source/agc.rs:133-171,397-496)."""
    S = 8
    node_f, sf = make_flagship(S, seconds=2.0, seed=3, scan_mode="fused",
                               with_agc=True, max_block=1920)
    node_u, su = make_flagship(S, seconds=2.0, seed=3, scan_mode="exact",
                               with_agc=True, max_block=1920)
    ef = jax.jit(lambda s: node_f.emit(s, 640))
    eu = jax.jit(lambda s: node_u.emit(s, 640))
    # 9 blocks x 640 = 5760 frames > the 4096-frame window lag, so the
    # ring's old-value subtraction path is exercised
    for blk in range(9):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 640
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


def test_fused_op_matches_float64(rng):
    """Whole fused op vs a float64 reference of the same math."""
    from rodio_tpu.ops.fused import LANES, fused_resample_biquad_mix

    fr, to, m = 147, 160, 2
    K = 4
    frames = (K + 2) * fr
    data = rng.uniform(-1, 1, (LANES, frames)).astype(np.float32)
    data_t = jnp.asarray(data).T
    nc = frames // fr
    fr_p = -(-fr // 16) * 16
    chunks = jnp.pad(
        data_t[: nc * fr].reshape(nc, fr, LANES),
        ((0, 0), (0, fr_p - fr), (0, 0)),
    )
    xn_t = data_t[::fr][1 : K + 1]

    node = Resample(SamplesBuffer(LANES, 44100, data), 48000)
    G0 = np.asarray(node._G0)
    g1 = np.asarray(node._g1)
    mixmat = rng.uniform(0.1, 1.0, (8, LANES)).astype(np.float32)
    z = jnp.zeros((LANES,), jnp.float32)
    coeffs = (0.3, 0.2, 0.1, -0.4, 0.05)
    mix, _ = fused_resample_biquad_mix(
        chunks, 0, xn_t, G0, g1, jnp.asarray(mixmat), coeffs,
        (z, z, z, z), fr=fr, to=to, m=m,
        interpret=jax.default_backend() != "tpu",
    )

    X = data[:, : K * fr].reshape(LANES, K, fr).astype(np.float64)
    xnext = data[:, fr : (K + 1) * fr : fr].astype(np.float64)
    Y = np.einsum("ckf,ft->ckt", X, G0.astype(np.float64))
    Y = Y + xnext[:, :, None] * g1.astype(np.float64)
    y = Y.reshape(LANES, K * to)
    b0, b1, b2, a1, a2 = coeffs
    yy = np.zeros_like(y)
    x1 = x2 = y1 = y2 = np.zeros(LANES)
    for t in range(K * to):
        cur = y[:, t]
        out = b0 * cur + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        yy[:, t] = out
        x2, x1, y2, y1 = x1, cur, y1, out
    ref = mixmat.astype(np.float64) @ yy
    assert np.abs(np.asarray(mix, np.float64) - ref).max() < 1e-4 * np.abs(
        ref
    ).max()


def test_fused_blocked_iir_matches_lookahead(rng):
    """The blocked parallel-in-time biquad (subblk: interleaved zero-
    history chains + boundary corrections riding the mix) matches the
    unfused chain at the same tolerance as the look-ahead loop."""
    S, C, frames = 8, 2, 44100
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        "low_pass", 2000.0, 0.5, subblk=40,
    )
    assert fused.subblk == 40
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(4):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        # boundary-correction rounding adds ~1 ulp over the look-ahead
        # loop's deviation class
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


def test_fused_int2_pieces_match(rng):
    """The 2-piece PCM mode ("int2", 4 B/sample) stays well inside the
    1e-6 contract for gain-folded content."""
    S, C, frames = 8, 2, 44100
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        precision="int2",
    )
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(4):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


def test_fused_gain_post_int2_lossless_content(rng):
    """16-bit-quantized PCM: precision="auto" detects that every sample
    splits exactly into two bf16 pieces, keeps the chunks RAW (per-lane
    gains move to the in-kernel gain_post multiply), and selects the
    int2 layout — lossless there (the dropped third piece is identically
    zero), at 2/3 the chunk DMA traffic. Output matches the unfused
    exact chain at the int3 tolerance class."""
    S, C, frames = 8, 2, 44100
    k = rng.integers(-32768, 32768, size=(S * C, frames))
    # k/2^15 scaled by a power of two: exactly 16-bit-significand f32.
    # Scale 2^-10 (k/2^25) keeps the content OFF the int24 grid — the
    # i24 byte-piece probe (round-5) outranks int2 on any 24-bit-grid
    # content, so this test pins the pure two-piece path.
    wide = (k / 32768.0 / 1024.0).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
    )
    assert fused.precision == "int2" and fused.gain_post
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(4):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)

    # negative control: arbitrary f32 content is NOT 2-piece exact and
    # must keep the full-width int3 layout with the init-time gain fold
    noisy = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    f2 = FusedWidePipeline(SamplesBuffer(S * C, 44100, noisy), 48000,
                           gains, S)
    assert f2.precision == "int3" and not f2.gain_post

    # AGC layout never folds gains into the PCM, so exact content rides
    # int2 directly (no gain_post needed)
    f3 = FusedWidePipeline(SamplesBuffer(S * C, 44100, wide), 48000,
                           gains, S, with_agc=True)
    assert f3.precision == "int2" and not f3.gain_post

    # 16-bit-significand content that ALSO sits on the int24 grid
    # (k/2^18) is caught by the i24 byte-piece probe first — 3 B/sample
    # beats int2's 4 (round-5 auto-preference)
    g24 = (k / 32768.0 * 0.125).astype(np.float32)
    f4 = FusedWidePipeline(SamplesBuffer(S * C, 44100, g24), 48000,
                           gains, S)
    assert f4.precision == "i24" and f4.gain_post


def test_fused_i8_byte_pieces_lossless_content(rng):
    """Content exactly on the 16-bit PCM grid (x = k/2^15): the auto
    probe selects the "i8" BYTE-piece layout — int8 hi/lo pieces at HALF
    int2's chunk DMA traffic — whose single dot reconstructs sum(w*k)
    exactly (scale + bias folded into the operator tiles,
    ops/fused.py build_fused_operator). Must match the unfused exact
    chain at the int-piece tolerance class, and match the int2 layout
    on the same content essentially bitwise."""
    S, C, frames = 8, 2, 44100
    k = rng.integers(-32768, 32768, size=(S * C, frames))
    wide = (k / 32768.0).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / (8 * S)
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
    )
    assert fused.precision == "i8" and fused.gain_post
    f2 = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        precision="int2", gain_post=True,
    )
    assert f2.precision == "int2" and f2.gain_post
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, s2, su = fused.init_state(), f2.init_state(), ch.init_state()
    assert sf["chunks"].dtype == jnp.int8
    ef = jax.jit(lambda s: fused.emit(s, 640))
    e2 = jax.jit(lambda s: f2.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(4):
        sf, of, vf = ef(sf)
        s2, o2, v2 = e2(s2)
        su, ou, vu = eu(su)
        assert int(vf) == int(v2) == int(vu) == 640
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)
        # i8 vs int2 on grid content: the resample dots are both exact
        # integer sums scaled by constants differing by 2^-15 exactly —
        # any residual is downstream reassociation only
        np.testing.assert_allclose(np.asarray(of), np.asarray(o2),
                                   atol=1e-7)

    # negative controls: off-grid content keeps int3; explicit i8 on
    # off-grid content fails LOUDLY instead of silently rounding
    noisy = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    f3 = FusedWidePipeline(SamplesBuffer(S * C, 44100, noisy), 48000,
                           gains, S)
    assert f3.precision == "int3"
    with pytest.raises(AssertionError):
        FusedWidePipeline(SamplesBuffer(S * C, 44100, noisy), 48000,
                          gains, S, precision="i8")


@pytest.mark.slow
def test_fused_i8_with_agc(rng):
    """i8 under the in-kernel AGC (raw channel-major chunks): matches
    the int2 AGC pipeline on grid content at the AGC parity class."""
    S, C, frames = 8, 2, 44100
    k = rng.integers(-16384, 16384, size=(S * C, frames))
    wide = (k / 32768.0).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    fa = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S, with_agc=True,
    )
    assert fa.precision == "i8" and not fa.gain_post
    fb = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S, with_agc=True,
        precision="int2",
    )
    sa, sb = fa.init_state(), fb.init_state()
    ea = jax.jit(lambda s: fa.emit(s, 640))
    eb = jax.jit(lambda s: fb.emit(s, 640))
    for _ in range(4):
        sa, oa, va = ea(sa)
        sb, ob, vb = eb(sb)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=2e-6)


def test_fused_i8_wsplit_large_ratio(rng):
    """i8 at to=640 (44.1k -> 192k): the byte pieces compose with the
    wsplit operator split (w = 4*hi + lo), bias columns riding the lo
    rows. Matches the unfused exact chain."""
    S, C, frames = 4, 2, 22050
    k = rng.integers(-32768, 32768, size=(S * C, frames))
    wide = (k / 32768.0).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / (8 * S)
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 192000, gains, S,
    )
    assert fused.precision == "i8" and fused.to == 640 and fused.m == 1
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 192000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for _ in range(3):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


@pytest.mark.parametrize("lookahead,agc", [(4, False), (4, True),
                                           (-4, False)])
@pytest.mark.slow
def test_fused_ufir_matches_lookahead(rng, lookahead, agc):
    """ufir (vectorized FIR + u-form 2-term IIR loop) matches the
    full-biquad look-ahead plan to the usual reassociation class —
    rolled and statically-unrolled forms, and under the in-kernel AGC
    (rolled only: unrolled+AGC compiles are interpreter-prohibitive and
    exercise the same branch)."""
    S, C, frames = 8, 2, 44100
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    base = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        lookahead=lookahead, with_agc=agc,
    )
    uf = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        lookahead=lookahead, ufir=True, with_agc=agc,
    )
    sb, su = base.init_state(), uf.init_state()
    eb = jax.jit(lambda s, n=base: n.emit(s, 640))
    eu = jax.jit(lambda s, n=uf: n.emit(s, 640))
    for _ in range(3):
        sb, ob, vb = eb(sb)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(np.asarray(ou), np.asarray(ob),
                                   atol=2e-6)


@pytest.mark.slow
def test_fused_wsplit_large_ratio_matches_unfused(rng):
    """44.1k -> 192k (to = 640 > 256): the split-integer weight path
    (w = 4*hi + lo, both bf16-exact) matches the unfused HIGHEST chain
    at the same tolerance class as the <=256 int path."""
    S, C, frames = 4, 2, 44100
    wide = (rng.standard_normal((S * C, frames)) * 0.1).astype(np.float32)
    gains = rng.uniform(0.5, 1.5, S).astype(np.float32) / S
    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 192000, gains, S,
    )
    assert fused.precision == "int3" and fused.to == 640 and fused.m == 1
    ch = Resample(SamplesBuffer(S * C, 44100, wide), 192000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 1280))
    eu = jax.jit(lambda s: ch.emit(s, 1280))
    for _ in range(3):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 1280
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


@pytest.mark.slow
def test_fused_agc_rms_limited_quiet_content(rng):
    """Quiet program material keeps the AGC in the RMS-limited regime
    (desired = target*rsqrt(ms)), which exercises the sq-history ring's
    old-window subtraction across slot rotation — the regime a ring
    mis-indexing bug leaves untested (peak-limited content masks it)."""
    S = 8
    rng2 = np.random.default_rng(11)
    quiet_pcm = (rng2.standard_normal((2, 44100 * 3)) * 0.004).astype(
        np.float32
    )
    node_f, sf = make_flagship(S, seconds=2.5, seed=5, scan_mode="fused",
                               with_agc=True, max_block=1920,
                               source_pcm=quiet_pcm)
    node_u, su = make_flagship(S, seconds=2.5, seed=5, scan_mode="exact",
                               with_agc=True, max_block=1920,
                               source_pcm=quiet_pcm)
    ef = jax.jit(lambda s: node_f.emit(s, 640))
    eu = jax.jit(lambda s: node_u.emit(s, 640))
    # 14 blocks x 640 = 8960 frames: the 4096-frame lag ring rotates
    # through all its slots more than twice
    for blk in range(14):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 640
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7, err_msg=f"block {blk}")


@pytest.mark.slow
def test_fused_wsplit_with_agc(rng):
    """The split-integer weight path composes with the in-kernel AGC
    (192 kHz AGC farm): parity vs the unfused exact chain."""
    S = 4
    node_f, sf = make_flagship(S, seconds=1.0, seed=9, scan_mode="fused",
                               with_agc=True, out_rate=192000,
                               max_block=2560)
    node_u, su = make_flagship(S, seconds=1.0, seed=9, scan_mode="exact",
                               with_agc=True, out_rate=192000,
                               max_block=2560)
    assert _pipe(node_f).precision == "int3" and _pipe(node_f).to == 640
    ef = jax.jit(lambda s: node_f.emit(s, 1280))
    eu = jax.jit(lambda s: node_u.emit(s, 1280))
    for _ in range(4):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 1280
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)


@pytest.mark.slow
def test_fused_agc_power_of_two_ratio(rng):
    """lag % (m*to) == 0 (any power-of-two rate ratio, e.g. 24k->48k):
    the RMS-ring old window is exactly one full slot, so only the slot-B
    DMA runs (a zero-length slot-A slice would be out of bounds at trace
    time). Parity vs the unfused exact chain."""
    S = 4
    node_f, sf = make_flagship(S, seconds=0.2, seed=13, in_rate=24000,
                               scan_mode="fused", with_agc=True,
                               max_block=512)
    node_u, su = make_flagship(S, seconds=0.2, seed=13, in_rate=24000,
                               scan_mode="exact", with_agc=True,
                               max_block=512)
    assert _pipe(node_f).to == 2  # m*to = 4 divides lag = 4096
    ef = jax.jit(lambda s: node_f.emit(s, 128))
    eu = jax.jit(lambda s: node_u.emit(s, 128))
    for blk in range(3):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 128
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7, err_msg=f"block {blk}")


def _find_sub(state, key):
    """Depth-first find of the nested dict holding `key`."""
    if isinstance(state, dict):
        if key in state:
            return state
        for v in state.values():
            r = _find_sub(v, key)
            if r is not None:
                return r
    return None


def test_fused_live_retune_zero_retrace(rng):
    """VERDICT r3 item 5: biquad coefficients are DATA on the fused path
    — a mid-stream retune matches the node path's BltFilter.retune and
    compiles exactly ONE kernel (src/source/blt.rs:68-91 free-knob
    semantics)."""
    node_f, sf = make_flagship(4, seconds=0.5, seed=9, scan_mode="fused")
    node_u, su = make_flagship(4, seconds=0.5, seed=9, scan_mode="exact",
                               max_block=640)
    fused = _pipe(node_f)
    assert isinstance(fused, FusedWidePipeline)
    blt = None  # walk the exact chain for its BltFilter:
    n = node_u
    while not isinstance(n, BltFilter):
        n = n.input
    blt = n

    ef = jax.jit(lambda s: node_f.emit(s, 640))
    eu = jax.jit(lambda s: node_u.emit(s, 640))
    for blk in range(2):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7)

    # live retune both paths; fused must not re-trace
    from rodio_tpu.ops.fused import fused_resample_biquad_mix

    before = fused_resample_biquad_mix._cache_size()
    ps = _find_sub(sf, "coeffs")
    new_ps = fused.retune(ps, freq=800.0)
    ps.update(new_ps)
    bs = _find_sub(su, "coef")
    bs.update(blt.retune(bs, freq=800.0))

    for blk in range(2):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(ou), atol=5e-7,
            err_msg=f"post-retune block {blk}",
        )
    after = fused_resample_biquad_mix._cache_size()
    if before is not None and after is not None:
        assert after == before, "fused retune must not re-trace the kernel"


def test_fused_agc_live_params_zero_retrace(rng):
    """AGC knobs are SMEM data on the fused path: set_agc_params applies
    next block with no re-trace (src/source/agc.rs set_attack_time).
    The default (auto = serial) plan serves EVERY live knob; the opt-in
    rel0 plan rejects a live nonzero release loudly (the static kernel
    plan is baked into cached outer jits — see flagship.agc_plan)."""
    node_f, sf = make_flagship(4, seconds=0.5, seed=9, scan_mode="fused",
                               with_agc=True)
    fused = _pipe(node_f)
    assert not fused._agc_rel0  # auto keeps the full-knob serial plan
    ef = jax.jit(lambda s: node_f.emit(s, 640))
    sf, o1, v1 = ef(sf)
    before = ef._cache_size()

    ps = _find_sub(sf, "agc_par")
    ps.update(fused.set_agc_params(ps, attack=0.1, release=0.05))
    sf, o2, v2 = ef(sf)
    assert int(v2) == 640
    assert ef._cache_size() == before, "live AGC knobs must not re-trace"

    # opt-in rel0 plan: attack is free, nonzero release raises
    node_r, sr = make_flagship(4, seconds=0.5, seed=9, scan_mode="fused",
                               with_agc=True, agc_plan="rel0")
    fused_r = _pipe(node_r)
    er = jax.jit(lambda s: node_r.emit(s, 640))
    sr, _, vr = er(sr)
    b2 = er._cache_size()
    pr = _find_sub(sr, "agc_par")
    pr.update(fused_r.set_agc_params(pr, attack=0.1))
    sr, _, vr = er(sr)
    assert int(vr) == 640 and er._cache_size() == b2
    pr = _find_sub(sr, "agc_par")
    with pytest.raises(ValueError, match="rel0"):
        fused_r.set_agc_params(pr, release=0.05)
    # release=0 stays legal on the rel0 plan
    pr.update(fused_r.set_agc_params(pr, release=0.0))


@pytest.mark.slow
def test_fused_agc_rel0_matches_serial_plan(rng):
    """The rel0 structural plan (round-4: memoryless peak + clamped-min
    smoother at release coefficient exactly 0) vs the 3-chain serial
    plan on the SAME pipeline: identical semantics up to 1-ulp smoother
    ties (ops/fused.py rel0 note)."""
    S = 8
    node_a, sa = make_flagship(S, seconds=2.0, seed=3, scan_mode="fused",
                               with_agc=True, agc_plan="rel0",
                               max_block=1920)
    node_b, sb = make_flagship(S, seconds=2.0, seed=3, scan_mode="fused",
                               with_agc=True, agc_plan="serial",
                               max_block=1920)
    ea = jax.jit(lambda s: node_a.emit(s, 640))
    eb = jax.jit(lambda s: node_b.emit(s, 640))
    # through the 4096-frame RMS window wraparound
    for blk in range(9):
        sa, oa, va = ea(sa)
        sb, ob, vb = eb(sb)
        assert int(va) == int(vb) == 640
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=5e-7, err_msg=f"block {blk}")


@pytest.mark.slow
def test_fused_agc_serial_plan_nonzero_release(rng):
    """Nonzero release_time keeps the serial plan (auto) and matches the
    unfused exact chain — the regime the rel0 plan cannot serve."""
    from rodio_tpu.effects.agc import AgcSettings, AutomaticGainControl

    S = 8
    st_ = AgcSettings(release_time=0.02)

    rng2 = np.random.default_rng(17)
    wide = (rng2.standard_normal((S * 2, 44100)) * 0.1).astype(np.float32)
    gains = rng2.uniform(0.5, 1.5, S).astype(np.float32) / S
    fused = FusedWidePipeline(
        SamplesBuffer(S * 2, 44100, wide), 48000, gains, S,
        with_agc=True, agc_settings=st_,
    )
    assert not fused._agc_rel0  # auto resolves to the serial plan
    ch = Resample(SamplesBuffer(S * 2, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = AutomaticGainControl(ch, st_, mode="exact", streams=S)
    ch = Amplify(ch, np.repeat(gains, 2))
    ch = WideMixer(ch, S)
    sf, su = fused.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for blk in range(9):
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 640
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=5e-7, err_msg=f"block {blk}")


def test_fused_agc_plans_quick_parity(rng):
    """QUICK-GATE AGC numeric coverage (ADVICE r4 #2): every in-kernel
    AGC structural plan (serial / rel0 / rel0f / rel0b) on the same
    pipeline plus the unfused exact chain, short render. rel0/rel0f
    match the serial plan to 1-ulp smoother ties (rel0f adds the
    folded-rsqrt desired gain — same class); rel0b adds the blocked-
    composition reassociation (~1e-6); all sit inside the documented
    2e-5 fused-AGC budget vs the unfused chain."""
    from rodio_tpu.effects.agc import AgcSettings, AutomaticGainControl

    S = 4
    rng2 = np.random.default_rng(21)
    wide = (rng2.standard_normal((S * 2, 26460)) * 0.2).astype(np.float32)
    gains = rng2.uniform(0.5, 1.5, S).astype(np.float32) / S

    outs = {}
    for plan in ("serial", "rel0", "rel0f", "rel0b", "rel0c8"):
        fused = FusedWidePipeline(
            SamplesBuffer(S * 2, 44100, wide), 48000, gains, S,
            with_agc=True, agc_plan=plan,
        )
        s = fused.init_state()
        e = jax.jit(lambda st: fused.emit(st, 640))
        blocks = []
        for _ in range(3):
            s, o, v = e(s)
            assert int(v) == 640
            blocks.append(np.asarray(o))
        outs[plan] = np.concatenate(blocks, axis=1)
    np.testing.assert_allclose(outs["rel0"], outs["serial"], atol=1e-6)
    np.testing.assert_allclose(outs["rel0f"], outs["serial"], atol=1e-6)
    # rel0b measured 3.05e-6 on real TPU (FMA contraction shifts the
    # blocked-composition reassociation slightly vs this CPU gate)
    np.testing.assert_allclose(outs["rel0b"], outs["serial"], atol=5e-6)
    np.testing.assert_allclose(outs["rel0c8"], outs["serial"], atol=5e-6)

    # and vs the UNFUSED exact chain (the graph FusedWidePipeline
    # fuses: resample -> low-pass 2 kHz q=0.5 -> AGC -> gains -> mix)
    ch = Resample(SamplesBuffer(S * 2, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = AutomaticGainControl(ch, AgcSettings(), mode="exact", streams=S)
    ch = Amplify(ch, np.repeat(gains, 2))
    ch = WideMixer(ch, S)
    su = ch.init_state()
    eu = jax.jit(lambda st: ch.emit(st, 640))
    ub = []
    for _ in range(3):
        su, o, v = eu(su)
        ub.append(np.asarray(o))
    ref = np.concatenate(ub, axis=1)
    for plan in ("serial", "rel0", "rel0f", "rel0b", "rel0c8"):
        np.testing.assert_allclose(outs[plan], ref, atol=2e-5,
                                   err_msg=plan)


@pytest.mark.slow
def test_fused_agc_group_tracks_exact(rng):
    """Opt-in group-rate AGC (agc_group=8, see the AgcGroup contract in
    effects/agc.py): window sums are exact per group, the gain smoother
    advances once per group with speed^(2*AG). The master output must
    track the exact per-sample in-kernel smoother within the documented
    ~2e-3 relative budget, through RMS-ring wraparound."""
    S = 8
    node_g, sg = make_flagship(S, seconds=2.0, seed=3, scan_mode="fused",
                               with_agc=True, agc_group=8,
                               max_block=1920)
    node_e, se = make_flagship(S, seconds=2.0, seed=3, scan_mode="fused",
                               with_agc=True, max_block=1920)
    eg = jax.jit(lambda s: node_g.emit(s, 640))
    ee = jax.jit(lambda s: node_e.emit(s, 640))
    # 9 blocks x 640 = 5760 frames > the 4096-frame window lag
    for blk in range(9):
        sg, og, vg = eg(sg)
        se, oe, ve = ee(se)
        assert int(vg) == int(ve) == 640
        og_, oe_ = np.asarray(og), np.asarray(oe)
        rel = np.abs(og_ - oe_) / (np.abs(oe_) + 1e-6)
        assert rel.max() < 2e-3, f"block {blk}: max rel {rel.max()}"


def test_fused_agc_group_rejects_bad_group(rng):
    """agc_group must be >= 2 and divide both m*to and the RMS lag."""
    with pytest.raises(AssertionError, match="agc_group"):
        make_flagship(4, seconds=0.2, scan_mode="fused", with_agc=True,
                      agc_group=7)
    with pytest.raises(AssertionError, match="agc_group"):
        make_flagship(4, seconds=0.2, scan_mode="fused", with_agc=True,
                      agc_group=1)


def test_fused_agc_group_live_params(rng):
    """Group mode derives speed^(2*AG) in-kernel from the SMEM params,
    so set_agc_params stays a zero-re-trace state update there too."""
    node_f, sf = make_flagship(4, seconds=0.5, seed=9, scan_mode="fused",
                               with_agc=True, agc_group=8)
    fused = _pipe(node_f)
    ef = jax.jit(lambda s: node_f.emit(s, 640))
    sf, o1, v1 = ef(sf)

    from rodio_tpu.ops.fused import fused_resample_biquad_agc_mix

    before = fused_resample_biquad_agc_mix._cache_size()
    ps = _find_sub(sf, "agc_par")
    ps.update(fused.set_agc_params(ps, attack=0.1, release=0.05))
    sf, o2, v2 = ef(sf)
    after = fused_resample_biquad_agc_mix._cache_size()
    assert int(v2) == 640
    if before is not None and after is not None:
        assert after == before, "live AGC knobs must not re-trace"


@pytest.mark.parametrize("with_agc,agc_group",
                         [(False, 0), (True, 0), (True, 4)])
@pytest.mark.slow
def test_fused_unrolled_serial_matches_fori(rng, with_agc, agc_group):
    """lookahead < 0 selects the STATICALLY UNROLLED serial loops (the
    look-ahead biquad AND the AGC chains) — identical arithmetic with
    static VMEM row addresses instead of fori_loop dynamic offsets
    (measured 12-33% faster blocks on v5e, BENCHMARKS.md round-3).
    Same op order, so outputs agree to the compiler's FMA-contraction
    freedom (~1 ulp; under the CPU interpreter XLA may contract a*b+c
    differently between the rolled and unrolled forms — same class as
    test_fused_block_size_invariance).

    The no-AGC case runs the flagship 44.1k->48k ratio (mto=160 at m=1;
    40 unrolled look-ahead-4 groups). The AGC cases run 24k->48k
    (mto=4 at m=2) because the unrolled per-sample AGC smoother at
    mto=160 is a ~600 s XLA:CPU compile under the interpreter — the
    pow2 ratio also re-exercises the lag%mto==0 ring path unrolled."""
    in_rate = 24000 if with_agc else 44100
    outs = {}
    for la in (4, -4):
        node, s = make_flagship(4, seconds=0.25, seed=5, scan_mode="fused",
                                lookahead=la, with_agc=with_agc,
                                agc_group=agc_group, in_rate=in_rate,
                                m=(2 if with_agc else 1), max_block=480)
        em = jax.jit(lambda s: node.emit(s, 160))
        blocks = []
        for _ in range(3):
            s, o, v = em(s)
            assert int(v) == 160
            blocks.append(np.asarray(o))
        outs[la] = np.concatenate(blocks, axis=1)
    np.testing.assert_allclose(outs[4], outs[-4], atol=5e-7)


def test_fused_i24_byte_pieces_match_unfused(rng):
    """The i24 3-byte-piece layout (round-5, VERDICT r4 ask #5): content
    exactly on the int24 grid (but NOT the int16 grid) auto-selects
    precision='i24' and matches the unfused exact chain within the
    full-scale 1e-6 class; the explicit int3 render of the same content
    agrees to the same class (both reconstruct the identical samples)."""
    S, C = 4, 2
    r = np.random.default_rng(99)
    k = r.integers(-4194304, 4194304, size=(S * C, 26460)) * 2 + 1
    wide = (k / 8388608.0).astype(np.float32)
    gains = r.uniform(0.5, 1.5, S).astype(np.float32) / S

    fused = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        "low_pass", 2000.0, 0.5,
    )
    assert fused.precision == "i24", fused.precision

    f3 = FusedWidePipeline(
        SamplesBuffer(S * C, 44100, wide), 48000, gains, S,
        "low_pass", 2000.0, 0.5, precision="int3",
    )

    ch = Resample(SamplesBuffer(S * C, 44100, wide), 48000)
    ch = BltFilter(ch, "low_pass", 2000.0, 0.5, mode="exact")
    ch = Amplify(ch, np.repeat(gains, C))
    ch = WideMixer(ch, S)

    sf, s3, su = fused.init_state(), f3.init_state(), ch.init_state()
    ef = jax.jit(lambda s: fused.emit(s, 640))
    e3 = jax.jit(lambda s: f3.emit(s, 640))
    eu = jax.jit(lambda s: ch.emit(s, 640))
    for blk in range(4):
        sf, of, vf = ef(sf)
        s3, o3, v3 = e3(s3)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == 640
        # full-scale content: the 4x grid16/grid24 calibration applies
        np.testing.assert_allclose(np.asarray(of), np.asarray(ou),
                                   atol=4e-6, err_msg=f"blk {blk} vs unfused")
        np.testing.assert_allclose(np.asarray(of), np.asarray(o3),
                                   atol=4e-6, err_msg=f"blk {blk} vs int3")


def test_fused_i24_rejects_off_grid(rng):
    wide = (rng.standard_normal((8, 8000)) * 0.2).astype(np.float32)
    with pytest.raises(AssertionError, match="int24 grid"):
        FusedWidePipeline(
            SamplesBuffer(8, 44100, wide), 48000,
            np.full(4, 0.25, np.float32), 4, precision="i24",
        )


def test_samples_buffer_instance_pad_frames():
    """Per-instance ``pad_frames`` (round-5, VERDICT r4 ask #8): a buffer
    built with a custom pad serves contiguous reads up to that pad on
    the fast dynamic_slice path, without changing the class default
    other instances get."""
    r = np.random.default_rng(5)
    data = (r.standard_normal((2, 1000)) * 0.3).astype(np.float32)
    big = SamplesBuffer(2, 48000, data, pad_frames=12800)
    small = SamplesBuffer(2, 48000, data)
    assert big.PAD_FRAMES == 12800
    assert small.PAD_FRAMES == SamplesBuffer.PAD_FRAMES == 8192

    # one oversized pull through the padded window: 1000 valid frames,
    # the rest masked to exact zero
    st, blk, valid = big.emit(big.init_state(), 12000)
    assert int(valid) == 1000
    np.testing.assert_array_equal(np.asarray(blk[:, :1000]), data)
    assert float(jnp.abs(blk[:, 1000:]).max()) == 0.0


def test_fused_large_block_past_class_pad(rng):
    """T=12800 (the round-5 bench default) needs a contiguous fused read
    window of K*fr + fr = 11907 frames > the 8192 class pad;
    make_flagship derives the instance pad from max_block. Parity vs
    the exact unfused chain must hold at the full-chain class."""
    node_f, st_f = make_flagship(4, seconds=1.2, seed=11,
                                 scan_mode="fused", max_block=13440)
    node_e, st_e = make_flagship(4, seconds=1.2, seed=11,
                                 scan_mode="exact", max_block=13440)
    pipe = _pipe(node_f)
    assert pipe.input.PAD_FRAMES >= (12800 // pipe.to + 2) * pipe.from_
    T = 12800 if (12800 % (pipe.m * pipe.to) == 0) else \
        (12800 // (pipe.m * pipe.to)) * (pipe.m * pipe.to)
    st_f, of, vf = node_f.emit(st_f, T)
    st_e, oe, ve = node_e.emit(st_e, T)
    assert int(vf) == T == int(ve)
    np.testing.assert_allclose(np.asarray(of), np.asarray(oe), atol=2e-6)
