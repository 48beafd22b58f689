"""Statistical tests for the noise family and dither.

Noise paths can't be compared sample-wise with the reference (different
RNGs); these tests pin the DISTRIBUTIONS and SPECTRAL shapes the reference
constructions imply (src/source/noise.rs).
"""
import numpy as np
import pytest

from rodio_tpu.graph import render
from rodio_tpu.sources.generators import SamplesBuffer
from rodio_tpu.sources.noise import (
    Blue,
    Brownian,
    Pink,
    Red,
    Velvet,
    Violet,
    WhiteGaussian,
    WhiteTriangular,
    WhiteUniform,
)

N = 1 << 16


def spectrum_slope(x, rate=48000):
    """dB-per-octave slope of the power spectrum between 100 Hz and 10 kHz."""
    f = np.fft.rfftfreq(len(x), 1 / rate)
    p = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    sel = (f > 100) & (f < 10000) & (p > 0)
    logf = np.log2(f[sel])
    logp = 10 * np.log10(p[sel])
    return np.polyfit(logf, logp, 1)[0]


def _render(node, n=N):
    return np.asarray(render(node, max_frames=n, block_frames=8192))[0]


def test_white_uniform_stats():
    x = _render(WhiteUniform(48000))
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - np.sqrt(1 / 3)) < 0.02
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert abs(spectrum_slope(x)) < 1.0  # flat


def test_white_triangular_stats():
    x = _render(WhiteTriangular(48000))
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1 / np.sqrt(6)) < 0.02
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_white_gaussian_stats():
    x = _render(WhiteGaussian(48000))
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 0.6) < 0.02


def test_velvet_density_and_values():
    rate, density = 48000, 2000
    x = _render(Velvet(rate, density))
    nonzero = x[x != 0]
    # one +-1 impulse per ceil(rate/density) samples
    grid = int(np.ceil(rate / density))
    expected_impulses = len(x) // grid
    assert abs(len(nonzero) - expected_impulses) <= expected_impulses * 0.02
    assert set(np.unique(nonzero)).issubset({-1.0, 1.0})
    # roughly balanced signs
    assert abs(nonzero.mean()) < 0.1


def test_pink_slope():
    x = _render(Pink(48000))
    s = spectrum_slope(x)
    assert -4.5 < s < -1.5  # pink ~ -3 dB/octave


def test_pink_continuity_across_blocks():
    # the closed form must agree regardless of block size
    a = _render(Pink(48000, seed=7), n=8192)
    b = np.asarray(
        render(Pink(48000, seed=7), max_frames=8192, block_frames=1024)
    )[0]
    np.testing.assert_array_equal(a[:8192], b)


def test_blue_slope():
    x = _render(Blue(48000))
    s = spectrum_slope(x)
    # the reference's blue is a raw first difference: |1-z^-1|^2 ~ f^2,
    # i.e. +6 dB/octave power slope
    assert 4.0 < s < 8.0


def test_violet_slope():
    x = _render(Violet(48000))
    s = spectrum_slope(x)
    # twice-differenced white: ~ +12 dB/octave
    assert 9.0 < s < 15.0


@pytest.mark.parametrize("cls", [Brownian, Red])
def test_integrated_noise(cls):
    x = _render(cls(48000))
    s = spectrum_slope(x)
    assert -8.0 < s < -4.0  # brown/red ~ -6 dB/octave
    # variance-normalized to ~1
    assert 0.5 < x.std() < 2.0


def test_dither_subtracts_scaled_noise(rng):
    from rodio_tpu.effects.dither import Dither

    data = rng.uniform(-0.5, 0.5, size=2000).astype(np.float32)
    src = SamplesBuffer(2, 48000, data)
    out = render(Dither(src, 16, "tpdf"), block_frames=256)
    clean = data.reshape(1000, 2).T
    diff = out - clean
    lsb = 1.0 / (1 << 15)
    assert np.abs(diff).max() <= lsb  # TPDF amplitude within 1 lsb
    assert np.abs(diff).max() > 0  # noise was actually added
    assert abs(diff.mean()) < lsb * 0.1


@pytest.mark.parametrize("algo", ["tpdf", "rpdf", "gpdf", "highpass"])
def test_dither_algorithms_run(rng, algo):
    from rodio_tpu.effects.dither import Dither

    data = rng.uniform(-0.5, 0.5, size=512).astype(np.float32)
    src = SamplesBuffer(2, 48000, data)
    out = render(Dither(src, 8, algo), block_frames=128)
    assert out.shape == (2, 256)
    assert not np.array_equal(out, data.reshape(256, 2).T)


def test_highpass_dither_continuous_at_block_boundaries():
    """The differentiated (blue) dither noise carries the previous white
    sample across blocks: adjacent samples share a white draw, so boundary
    pairs must show the same ~-0.5 correlation as interior pairs (without
    the carry, boundary pairs are independent -> correlation ~0)."""
    from rodio_tpu.effects.dither import Dither
    from rodio_tpu.sources.generators import Zero

    bf = 128
    n = bf * 512
    src = Zero(1, 48000, num_frames=n)
    out = _render(Dither(src, 2, "highpass"), n=n)
    lsb = 1.0 / (1 << 1)
    noise = -out / lsb  # x=0 so out = -noise*lsb
    var = noise.var()
    # boundary pairs: last sample of block k, first of block k+1
    left = noise[bf - 1 :: bf][:-1]
    right = noise[bf::bf]
    boundary_corr = np.mean(left * right) / var
    interior_corr = np.mean(noise[:-1] * noise[1:]) / var
    assert interior_corr < -0.35
    assert boundary_corr < -0.25, boundary_corr
