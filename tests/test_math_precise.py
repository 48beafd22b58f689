"""Precise f32 exp2/log2 (core/math) and the rodio_compat generator.

XLA:TPU's native exp2/log2 are fast approximations (~84 ulp / ~1.5e-4 abs
measured on v5e); core.math.exp2_precise/log2_precise replace them on the
dB conversion paths so the limiter meets the 1e-6 parity contract on
hardware (see tools/parity_tpu.py + PARITY_TPU.md for the on-TPU runs).
These tests pin the implementations against numpy on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodio_tpu.core.math import exp2_precise, log2_precise


def test_exp2_precise_accuracy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-80.0, 80.0, 200000).astype(np.float32)
    got = np.asarray(jax.jit(exp2_precise)(x)).astype(np.float64)
    exact = np.exp2(x.astype(np.float64))
    rel = np.abs(got - exact) / exact
    assert rel.max() < 2.5 * 5.96e-8  # within ~2.5 ulp of correctly rounded


def test_exp2_precise_edges():
    x = np.array([0.0, 1.0, -1.0, 127.5, 200.0, -200.0], np.float32)
    got = np.asarray(jax.jit(exp2_precise)(x))
    assert got[0] == 1.0 and got[1] == 2.0 and got[2] == 0.5
    assert np.isinf(got[4]) and got[5] == 0.0
    nan = np.asarray(jax.jit(exp2_precise)(np.float32(np.nan)))
    assert np.isnan(nan)


def test_log2_precise_accuracy():
    rng = np.random.default_rng(1)
    y = np.concatenate([
        rng.uniform(np.finfo(np.float32).tiny, 1e-3, 100000),
        rng.uniform(1e-3, 1e6, 100000),
        rng.uniform(0.9, 1.1, 100000),  # cancellation region
    ]).astype(np.float32)
    got = np.asarray(jax.jit(log2_precise)(y)).astype(np.float64)
    exact = np.log2(y.astype(np.float64))
    err = np.abs(got - exact)
    # ~2.5 ulp relative to max(|log2|, 0.25) covers the near-1 region
    assert (err / np.maximum(np.abs(exact), 0.25)).max() < 4 * 5.96e-8


def test_log2_precise_edges():
    y = np.array([0.0, -1.0, 1.0, 2.0, 0.5, np.finfo(np.float32).tiny],
                 np.float32)
    got = np.asarray(jax.jit(log2_precise)(y))
    assert got[0] == -np.inf and got[1] == -np.inf
    assert got[2] == 0.0 and got[3] == 1.0 and got[4] == -1.0
    assert got[5] == -126.0


def test_db_roundtrip_precise():
    from rodio_tpu.core.math import db_to_linear, linear_to_db

    rng = np.random.default_rng(2)
    x = rng.uniform(1e-4, 4.0, 50000).astype(np.float32)
    db = jax.jit(linear_to_db)(jnp.asarray(x))
    back = np.asarray(jax.jit(db_to_linear)(db))
    np.testing.assert_allclose(back, x, rtol=1e-6)


@pytest.mark.parametrize("fn", ["sine", "square", "triangle", "sawtooth"])
def test_generator_rodio_compat_matches_oracle(fn):
    """rodio_compat=True reproduces the reference's f32 phase accumulator
    (src/source/signal_generator.rs:133) including its drift; the phase
    sequence is bit-exact vs the refimpl, the waveform within sin() ulp."""
    import rodio_tpu.refimpl as ri
    from rodio_tpu.graph import render
    from rodio_tpu.sources.generators import SignalGenerator

    ref = ri.SignalGenerator(48000, 445.7, fn)
    exp = np.asarray([ref.next() for _ in range(12000)], np.float32)
    node = SignalGenerator(48000, 445.7, fn, rodio_compat=True)
    got = np.asarray(render(node, max_frames=12000))[0]
    tol = 1e-6 if fn == "sine" else 0.0
    np.testing.assert_allclose(got, exp, atol=tol)


def test_generator_compat_blocking_invariant():
    """Compat phase accumulation is independent of block size."""
    from rodio_tpu.graph import render
    from rodio_tpu.sources.generators import SignalGenerator

    a = np.asarray(render(SignalGenerator(48000, 333.3, "sine",
                                          rodio_compat=True),
                          max_frames=4096, block_frames=256))
    b = np.asarray(render(SignalGenerator(48000, 333.3, "sine",
                                          rodio_compat=True),
                          max_frames=4096, block_frames=1024))
    np.testing.assert_array_equal(a, b)
