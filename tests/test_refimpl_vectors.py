"""Pin the scalar reference engine to the reference's own unit-test vectors.

Every expected value below is transcribed from an in-tree test of
RustAudio/rodio (file:line cited per test). These tests establish the
refimpl as a faithful oracle; the block engine is then tested against the
refimpl at 1e-6.
"""
import numpy as np
import pytest

from rodio_tpu import refimpl as ri


class _ListIter:
    def __init__(self, values):
        self._it = iter([np.float32(v) for v in values])

    def next(self):
        return next(self._it, None)


def _collect(obj, limit=10_000):
    out = []
    for _ in range(limit):
        v = obj.next()
        if v is None:
            break
        out.append(float(v))
    return out


# ---- SampleRateConverter (src/conversions/sample_rate.rs:356-388) ----

def test_resampler_upsample():
    inp = [2.0, 16.0, 4.0, 18.0, 6.0, 20.0, 8.0, 22.0]
    conv = ri.SampleRateConverter(_ListIter(inp), 2000, 3000, 2)
    out = [float(np.trunc(v)) for v in _collect(conv)]
    assert out == [2.0, 16.0, 3.0, 17.0, 4.0, 18.0, 6.0, 20.0, 7.0, 21.0, 8.0, 22.0]


def test_resampler_upsample2():
    conv = ri.SampleRateConverter(_ListIter([1.0, 14.0]), 1000, 7000, 1)
    out = [float(np.trunc(v)) for v in _collect(conv)]
    assert out == [1.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 14.0]


def test_resampler_downsample():
    inp = list(range(17))
    conv = ri.SampleRateConverter(_ListIter(inp), 12000, 2400, 1)
    assert _collect(conv) == [0.0, 5.0, 10.0, 15.0]


def test_resampler_identity():
    inp = [0.5, -0.25, 1.0, 0.125]
    conv = ri.SampleRateConverter(_ListIter(inp), 44100, 44100, 2)
    assert _collect(conv) == inp


def test_resampler_empty():
    conv = ri.SampleRateConverter(_ListIter([]), 44100, 48000, 2)
    assert _collect(conv) == []


@pytest.mark.parametrize("k", [2, 3, 4])
def test_resampler_divide_law(k, rng):
    # divide_sample_rate law (src/conversions/sample_rate.rs:283-306)
    channels = 2
    to = 4000
    data = [float(x) for x in rng.integers(-100, 100, size=26)]
    data = data[: len(data) // channels * channels]
    conv = ri.SampleRateConverter(_ListIter(data), to * k, to, channels)
    expected = []
    frames = [data[i : i + channels] for i in range(0, len(data), channels)]
    for f in frames[::k]:
        expected.extend(f)
    assert _collect(conv) == expected


@pytest.mark.parametrize("k", [2, 3, 5])
def test_resampler_multiply_law(k, rng):
    # multiply_sample_rate law (src/conversions/sample_rate.rs:310-334)
    channels = 2
    frm = 3000
    data = [float(x) for x in rng.integers(-100, 100, size=26)]
    data = data[: len(data) // channels * channels]
    conv = ri.SampleRateConverter(_ListIter(data), frm, frm * k, channels)
    out = _collect(conv)
    frames = [out[i : i + channels] for i in range(0, len(out), channels)]
    got = []
    for f in frames[::k]:
        got.extend(f)
    assert got == data


# ---- ChannelCountConverter (src/conversions/channels.rs:107-178) ----

def test_channels_remove():
    conv = ri.ChannelCountConverter(_ListIter([1, 2, 3, 4, 5, 6]), 3, 2)
    assert _collect(conv) == [1.0, 2.0, 4.0, 5.0]
    conv = ri.ChannelCountConverter(_ListIter([1, 2, 3, 4, 5, 6, 7, 8]), 4, 1)
    assert _collect(conv) == [1.0, 5.0]


def test_channels_add():
    conv = ri.ChannelCountConverter(_ListIter([1, 2, 3, 4]), 1, 2)
    assert _collect(conv) == [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0]
    conv = ri.ChannelCountConverter(_ListIter([1, 2]), 1, 4)
    assert _collect(conv) == [1.0, 1.0, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0]
    conv = ri.ChannelCountConverter(_ListIter([1, 2, 3, 4]), 2, 4)
    assert _collect(conv) == [1.0, 2.0, 0.0, 0.0, 3.0, 4.0, 0.0, 0.0]


# ---- SignalGenerator (src/source/signal_generator.rs:181-238) ----

def test_generator_square():
    wf = ri.SignalGenerator(2000, 500.0, "square")
    assert _collect_n(wf, 8) == [1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0, -1.0]


def test_generator_triangle():
    wf = ri.SignalGenerator(8000, 1000.0, "triangle")
    expected = [-1.0, -0.5, 0.0, 0.5, 1.0, 0.5, 0.0, -0.5] * 2
    got = _collect_n(wf, 16)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_generator_sawtooth():
    wf = ri.SignalGenerator(200, 50.0, "sawtooth")
    got = _collect_n(wf, 7)
    np.testing.assert_allclose(
        got, [0.0, 0.5, -1.0, -0.5, 0.0, 0.5, -1.0], atol=1e-6
    )


def test_generator_sine():
    wf = ri.SignalGenerator(1000, 100.0, "sine")
    got = _collect_n(wf, 7)
    expected = [0.0, 0.58778525, 0.95105652, 0.95105652, 0.58778525, 0.0,
                -0.58778554]
    np.testing.assert_allclose(got, expected, atol=1e-4)


def _collect_n(src, n):
    return [float(src.next()) for _ in range(n)]


# ---- math (src/math.rs:238-339) ----

def test_db_linear_table():
    from rodio_tpu.core.math import db_to_linear, linear_to_db

    table = [
        (100.0, 100000.0), (60.0, 1000.0), (20.0, 10.0), (0.0, 1.0),
        (-20.0, 0.1), (-60.0, 0.001), (-100.0, 0.00001),
    ]
    for db, linear in table:
        ratio = float(db_to_linear(np.float32(db))) / linear
        assert 0.99 < ratio < 1.01
    for db in [-60.0, -20.0, -6.0, 0.0, 6.0, 20.0, 40.0]:
        rt = float(linear_to_db(db_to_linear(np.float32(db))))
        assert abs(rt - db) < 16 * np.finfo(np.float32).eps * max(1.0, abs(db))


# ---- mixer (src/mixer.rs:201-342) ----

def test_mixer_basic():
    tx, rx = ri.mixer(1, 48000)
    tx.add(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    tx.add(ri.SamplesBuffer(1, 48000, [5.0, 5.0, 5.0, 5.0]))
    assert _collect(rx) == [15.0, -5.0, 15.0, -5.0]


def test_mixer_channels_conv():
    tx, rx = ri.mixer(2, 48000)
    tx.add(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    tx.add(ri.SamplesBuffer(1, 48000, [5.0, 5.0, 5.0, 5.0]))
    assert _collect(rx) == [15.0, 15.0, -5.0, -5.0, 15.0, 15.0, -5.0, -5.0]


def test_mixer_rate_conv():
    tx, rx = ri.mixer(1, 96000)
    tx.add(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    tx.add(ri.SamplesBuffer(1, 48000, [5.0, 5.0, 5.0, 5.0]))
    assert _collect(rx) == [15.0, 5.0, -5.0, 5.0, 15.0, 5.0, -5.0]


def test_mixer_start_afterwards():
    tx, rx = ri.mixer(1, 48000)
    tx.add(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    assert float(rx.next()) == 10.0
    assert float(rx.next()) == -10.0
    tx.add(ri.SamplesBuffer(1, 48000, [5.0, 5.0, 6.0, 6.0, 7.0, 7.0, 7.0]))
    assert float(rx.next()) == 15.0
    assert float(rx.next()) == -5.0
    assert float(rx.next()) == 6.0
    assert float(rx.next()) == 6.0
    tx.add(ri.SamplesBuffer(1, 48000, [2.0]))
    assert float(rx.next()) == 9.0
    assert float(rx.next()) == 7.0
    assert float(rx.next()) == 7.0
    assert rx.next() is None


def test_mixer_added_taking_phase_into_account():
    tx, rx = ri.mixer(2, 48000)
    tx.add(ri.SamplesBuffer(2, 48000, [10.0, -10.0, 10.0, -10.0]))
    assert float(rx.next()) == 10.0
    tx.add(ri.SamplesBuffer(2, 48000, [5.0, -5.0, 6.0, -6.0]))
    assert float(rx.next()) == -10.0  # not yet mixed (out of phase)
    assert float(rx.next()) == 15.0  # mixing starts


# ---- queue (src/queue.rs:271-444) ----

def test_queue_basic():
    tx, rx = ri.queue(False)
    tx.append(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    tx.append(ri.SamplesBuffer(2, 96000, [5.0, 5.0, 5.0, 5.0]))
    assert rx.channels() == 1
    assert rx.sample_rate() == 48000
    for expected in [10.0, -10.0, 10.0, -10.0]:
        assert float(rx.next()) == expected
    assert rx.channels() == 2
    assert rx.sample_rate() == 96000
    for expected in [5.0, 5.0, 5.0, 5.0]:
        assert float(rx.next()) == expected
    assert rx.next() is None


def test_queue_immediate_end():
    _, rx = ri.queue(False)
    assert rx.next() is None


def test_queue_keep_alive():
    tx, rx = ri.queue(True)
    tx.append(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    for expected in [10.0, -10.0, 10.0, -10.0]:
        assert float(rx.next()) == expected
    for _ in range(1000):
        assert float(rx.next()) == 0.0


def test_queue_no_delay_when_added():
    tx, rx = ri.queue(True)
    for _ in range(500):
        assert float(rx.next()) == 0.0
    tx.append(ri.SamplesBuffer(1, 48000, [10.0, -10.0, 10.0, -10.0]))
    for expected in [10.0, -10.0, 10.0, -10.0]:
        assert float(rx.next()) == expected


def test_queue_metadata_peek():
    # append_updates_metadata (src/queue.rs:412-443)
    for keep_alive in (False, True):
        tx, rx = ri.queue(keep_alive)
        assert rx.channels() == 1
        assert rx.sample_rate() == 48000
        tx.append(ri.SamplesBuffer(2, 44100, [0.1, 0.2, 0.3, 0.4]))
        assert rx.channels() == 2
        assert rx.sample_rate() == 44100


def test_queue_channel_correct_on_first_append():
    # channel_correct_on_first_append (src/queue.rs:392-409)
    mixer_tx, mixer_rx = ri.mixer(2, 48000)
    tx, rx = ri.queue(True)
    assert rx.channels() == 1
    mixer_tx.add(rx)
    tx.append(ri.SamplesBuffer(2, 48000, [1.0, -1.0, 1.0, -1.0]))
    assert float(mixer_rx.next()) == 1.0
    assert float(mixer_rx.next()) == -1.0
    assert float(mixer_rx.next()) == 1.0
    assert float(mixer_rx.next()) == -1.0


# ---- linear ramp (src/source/linear_ramp.rs tests) ----

def test_linear_ramp():
    src = ri.SamplesBuffer(1, 1, [1.0] * 10)
    faded = ri.LinearGainRamp(src, 4_000_000_000, 0.0, 1.0, True)
    out = _collect(faded)
    np.testing.assert_allclose(
        out, [0.0, 0.25, 0.5, 0.75, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], atol=1e-7
    )


def test_linear_ramp_clamped():
    src = ri.SamplesBuffer(1, 1, [1.0] * 10)
    faded = ri.LinearGainRamp(src, 4_000_000_000, 0.0, 0.5, True)
    out = _collect(faded)
    np.testing.assert_allclose(
        out, [0.0, 0.125, 0.25, 0.375, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5], atol=1e-7
    )


def test_linear_ramp_seek():
    data = [[0.0, 0.4, 0.8][i % 3] for i in range(20)]
    src = ri.SamplesBuffer(1, 1, data)
    faded = ri.LinearGainRamp(src, 10_000_000_000, 0.0, 1.0, True)
    np.testing.assert_allclose(float(faded.next()), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.04, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.16, atol=1e-6)
    faded.try_seek(5_000_000_000)
    np.testing.assert_allclose(float(faded.next()), 0.40, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.28, atol=1e-6)
    faded.try_seek(0)
    np.testing.assert_allclose(float(faded.next()), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.04, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.16, atol=1e-6)
    faded.try_seek(10_000_000_000)
    np.testing.assert_allclose(float(faded.next()), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.8, atol=1e-6)
    np.testing.assert_allclose(float(faded.next()), 0.0, atol=1e-6)


# ---- crossfade (src/source/crossfade.rs tests) ----

def test_crossfade_with_self():
    s1 = ri.SamplesBuffer(1, 1, list(range(1, 11)))
    s2 = ri.SamplesBuffer(1, 1, list(range(1, 11)))
    mixed = ri.take_crossfade_with(s1, s2, 5_000_000_001)
    out = _collect(mixed)
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0, 4.0, 5.0], atol=1e-5)


def test_crossfade_with_zero():
    s1 = ri.SamplesBuffer(1, 1, list(range(1, 11)))
    s2 = ri.Zero(1, 1)
    mixed = ri.take_crossfade_with(s1, s2, 5_000_000_001)
    out = _collect(mixed)
    assert len(out) == 5
    np.testing.assert_allclose(
        out, [1.0, 2.0 * 0.8, 3.0 * 0.6, 4.0 * 0.4, 5.0 * 0.2], atol=1e-5
    )


# ---- channel volume (src/source/channel_volume.rs tests) ----

def test_channel_volume_mono_to_stereo():
    inp = ri.TestSource([1.0, 2.0, 3.0], 1, 44100)
    cv = ri.ChannelVolume(inp, [0.5, 0.8])
    out = _collect(cv)
    np.testing.assert_allclose(
        out, [0.5, 0.8, 1.0, 1.6, 1.5, 2.4], atol=1e-6
    )


def test_channel_volume_stereo_to_mono():
    inp = ri.TestSource([1.0, 2.0, 3.0, 4.0], 2, 44100)
    cv = ri.ChannelVolume(inp, [1.0])
    assert _collect(cv) == [1.5, 3.5]


def test_channel_volume_stereo_mix():
    inp = ri.TestSource([1.0, 3.0, 2.0, 4.0], 2, 44100)
    cv = ri.ChannelVolume(inp, [0.5, 2.0])
    assert _collect(cv) == [1.0, 4.0, 1.5, 6.0]


# ---- take_duration (src/source/take.rs tests) ----

def test_take_exact_duration_boundary():
    nanos_per_sample = int(1_000_000_000 / 48000)
    src = ri.SineWave(440.0)
    taken = ri.TakeDuration(src, nanos_per_sample * 10)
    assert len(_collect(taken)) == 10


def test_take_expires_mid_frame():
    src = ri.TestSource([1.0] * 10, 2, 44100)
    nanos_per_sample = 1_000_000_000 // (44100 * 2)
    taken = ri.TakeDuration(src, nanos_per_sample * 5)
    out = _collect(taken)
    assert out[5] == 0.0  # 6th sample is padding silence
    assert len(out) == 6


# ---- track position (src/source/position.rs tests) ----

def test_track_position():
    src = ri.SamplesBuffer(1, 1, [10.0, -10.0, 10.0, -10.0, 20.0, -20.0])
    pos = ri.TrackPosition(src)
    assert pos.get_pos_secs() == 0.0
    pos.next()
    assert pos.get_pos_secs() == 1.0
    pos.next()
    assert pos.get_pos_secs() == 2.0
    pos.try_seek(1_000_000_000)
    assert pos.get_pos_secs() == 1.0


def test_track_position_with_speed():
    src = ri.SamplesBuffer(1, 1, [10.0, -10.0, 10.0, -10.0, 20.0, -20.0])
    pos = ri.TrackPosition(ri.Speed(src, 2.0))
    assert pos.get_pos_secs() == 0.0
    pos.next()
    assert pos.get_pos_secs() == 0.5
    pos.next()
    assert pos.get_pos_secs() == 1.0


# ---- periodic access (src/source/periodic.rs tests) ----

def test_periodic_stereo_access():
    src = ri.SamplesBuffer(2, 1, [10.0, -10.0, 10.0, -10.0, 20.0, -20.0])
    cnt = [0]

    def bump(_):
        cnt[0] += 1

    p = ri.PeriodicAccess(src, 1_000_000_000, bump)
    assert cnt[0] == 0
    assert float(p.next()) == 10.0
    assert cnt[0] == 1
    assert float(p.next()) == -10.0
    assert cnt[0] == 1
    assert float(p.next()) == 10.0
    assert cnt[0] == 2
    assert float(p.next()) == -10.0
    assert cnt[0] == 2
    assert float(p.next()) == 20.0
    assert cnt[0] == 3
    assert float(p.next()) == -20.0
    assert cnt[0] == 3
