"""Transcriptions of the remaining reference integration tests.

tests/channel_volume.rs — 6-channel ChannelVolume keeps channels 2+ at
exactly zero through a decoder and through a Queue, ending frame-aligned.
tests/limit.rs — below-threshold passthrough, threshold sweep, stereo.
"""
import os

import jax
import numpy as np
import pytest

from rodio_tpu.effects.basic import Amplify, ChannelVolume, TakeDuration
from rodio_tpu.effects.limit import Limit, LimitSettings
from rodio_tpu.graph import render
from rodio_tpu.sources import SamplesBuffer, SignalGenerator

ASSETS = "/root/reference/assets"


def _music_mp3():
    path = os.path.join(ASSETS, "music.mp3")
    if not os.path.exists(path):
        pytest.skip("music.mp3 asset missing")
    from rodio_tpu.io.decoder import Decoder

    try:
        return Decoder(path)
    except Exception as e:  # no native decoder on this host
        pytest.skip(f"mp3 decode unavailable: {e}")


def _sine(freq, amp, seconds, rate=48000):
    src = SignalGenerator(rate, freq, "sine")
    src = Amplify(src, amp)
    return TakeDuration(src, seconds)


def test_channel_volume_6ch_zeros_without_queue():
    """tests/channel_volume.rs:20-23 — only the first two of six channels
    carry signal."""
    dec = _music_mp3()
    assert dec.spec.channels == 2
    cv = ChannelVolume(dec, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    assert cv.spec.channels == 6
    out = np.asarray(render(cv, block_frames=4096, max_frames=32768))
    assert out.shape[0] == 6
    assert np.abs(out[:2]).max() > 0
    np.testing.assert_array_equal(out[2:], 0.0)


def test_channel_volume_6ch_zeros_with_queue():
    """tests/channel_volume.rs:25-30 — same invariant through a Queue."""
    dec = _music_mp3()
    from rodio_tpu.control.queue import queue

    controls, out_q = queue(False, block_frames=2048)
    controls.append(ChannelVolume(dec, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]))
    outs = []
    for _ in range(8):
        block, alive = out_q.next_block()
        outs.append(np.asarray(block))
        if not alive:
            break
    out = np.concatenate(outs, axis=1)
    assert np.abs(out[:2]).max() > 0
    np.testing.assert_array_equal(out[2:], 0.0)


def test_limiter_passthrough_below_threshold():
    """tests/limit.rs:42-63 — a 0.2-amplitude sine through a -6 dB
    limiter passes through nearly unchanged."""
    settings = LimitSettings().with_threshold(-6.0)
    plain = np.asarray(render(_sine(1000.0, 0.2, 0.02), block_frames=256))
    limited = np.asarray(render(
        Limit(_sine(1000.0, 0.2, 0.02), settings), block_frames=256,
    ))
    n = min(plain.shape[1], limited.shape[1], 880)
    assert np.abs(plain[:, :n] - limited[:, :n]).max() < 0.01


@pytest.mark.parametrize("threshold_db,expected_peak", [
    (-1.0, 0.89), (-3.0, 0.71), (-6.0, 0.50),
])
def test_limiter_threshold_sweep(threshold_db, expected_peak):
    """tests/limit.rs:66-108 — settled peak tracks the threshold."""
    from rodio_tpu.core.types import duration_to_nanos  # noqa: F401

    settings = (
        LimitSettings()
        .with_threshold(threshold_db)
        .with_knee_width(1.0)
        .with_attack(0.002)
        .with_release(0.010)
    )
    node = Limit(_sine(440.0, 2.0, 0.05), settings)
    out = np.asarray(render(node, block_frames=500))
    settled = out[:, 1000:2000]
    peak = np.abs(settled).max()
    assert expected_peak - 0.1 <= peak <= expected_peak + 0.1, (
        threshold_db, peak
    )


def test_limiter_stereo_processing():
    """tests/limit.rs:110-140 — stereo limiting with a louder left
    channel: both channels reduced, output bounded."""
    i = np.arange(1000, dtype=np.float32)
    left = np.sin(i * 0.01) * 1.5
    right = np.sin(i * 0.01) * 0.8
    data = np.stack([left, right])
    buf = SamplesBuffer(2, 44100, data)
    node = Limit(buf, LimitSettings().with_threshold(-3.0))
    out = np.asarray(render(node, block_frames=250))
    # limited peaks below the raw input peaks; no channel blows up
    assert np.abs(out[0]).max() < np.abs(left).max()
    assert np.abs(out).max() < 1.5
    # the louder channel is still the louder channel
    assert np.abs(out[0]).max() >= np.abs(out[1]).max() - 1e-3
