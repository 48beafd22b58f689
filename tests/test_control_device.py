"""Control plane (mixer/queue/player) and device layer tests at block level.

Mirrors the reference's player/queue semantics tests (src/player.rs:365-471,
src/queue.rs:271-444) at block granularity, plus the device sink/microphone
paths that replace the OS audio edge.
"""
import numpy as np
import pytest

from rodio_tpu.control import Player, mixer, queue
from rodio_tpu.control.spatial_player import SpatialPlayer
from rodio_tpu.graph import render
from rodio_tpu.sources import SamplesBuffer, SineWave, Zero


def test_mixer_sums_and_prunes(rng):
    tx, rx = mixer(1, 48000)
    a = rng.uniform(-1, 1, 1000).astype(np.float32)
    b = rng.uniform(-1, 1, 500).astype(np.float32)
    tx.add(SamplesBuffer(1, 48000, a))
    tx.add(SamplesBuffer(1, 48000, b))
    block, alive = rx.next_block(256)
    assert alive
    np.testing.assert_allclose(block[0], a[:256] + b[:256], atol=1e-7)
    # after source b ends, only a continues
    rx.next_block(256)  # 512
    block, alive = rx.next_block(256)  # 768: b ended at 500
    np.testing.assert_allclose(block[0], a[512:768] + np.concatenate([b[500:], np.zeros(268, np.float32)])[:256], atol=1e-6)
    block, alive = rx.next_block(256)  # 1024: both ended at 1000
    assert alive  # a still contributed this block
    block, alive = rx.next_block(256)
    assert not alive  # no source yielded (src/mixer.rs:131)


def test_mixer_admits_pending_at_block_boundary(rng):
    tx, rx = mixer(1, 48000)
    a = np.ones(1000, np.float32)
    tx.add(SamplesBuffer(1, 48000, a))
    block, _ = rx.next_block(256)
    np.testing.assert_array_equal(block[0], np.ones(256, np.float32))
    tx.add(SamplesBuffer(1, 48000, a * 2))
    block, _ = rx.next_block(256)
    np.testing.assert_array_equal(block[0], np.full(256, 3.0, np.float32))


def test_mixer_uniformizes_formats(rng):
    # mono 44.1k source into a stereo 48k mixer
    tx, rx = mixer(2, 48000)
    tx.add(SamplesBuffer(1, 44100, np.ones(441, np.float32)))
    block, alive = rx.next_block(128)
    assert alive
    np.testing.assert_allclose(block[0], block[1])  # mono upmixed
    assert np.abs(block).max() > 0.9


def test_queue_sequential_and_stitching(rng):
    q_tx, q_rx = queue(False, block_frames=256)
    a = rng.uniform(-1, 1, 300).astype(np.float32)
    b = rng.uniform(-1, 1, 300).astype(np.float32)
    q_tx.append(SamplesBuffer(1, 48000, a))
    q_tx.append(SamplesBuffer(1, 48000, b))
    block, alive = q_rx.next_block(256)
    np.testing.assert_array_equal(block[0], a[:256])
    # transition mid-block: 44 frames of a then 212 of b
    block, alive = q_rx.next_block(256)
    np.testing.assert_array_equal(block[0][:44], a[256:])
    np.testing.assert_array_equal(block[0][44:], b[:212])


def test_queue_keep_alive_emits_silence():
    q_tx, q_rx = queue(True, block_frames=128)
    block, alive = q_rx.next_block(128)
    assert alive
    np.testing.assert_array_equal(block, np.zeros((1, 128), np.float32))
    q_tx.append(SamplesBuffer(1, 48000, np.ones(64, np.float32)))
    block, alive = q_rx.next_block(128)
    np.testing.assert_array_equal(block[0][:64], np.ones(64, np.float32))


def test_queue_done_signal():
    q_tx, q_rx = queue(False, block_frames=128)
    sig = q_tx.append_with_signal(SamplesBuffer(1, 48000, np.ones(100, np.float32)))
    assert not sig[0]
    q_rx.next_block(128)
    q_rx.next_block(128)  # drains + advances past the source
    assert sig[0]


def test_player_volume_pause_stop():
    tx, rx = mixer(2, 48000)
    player = Player.connect_new(tx, block_frames=128)
    player.append(Zero(2, 48000, num_frames=100000))
    player.append(SineWave(440.0).take_duration(1.0))
    # zero source plays first
    block, alive = rx.next_block(128)
    assert alive

    player.set_volume(0.5)
    assert player.volume() == 0.5
    player.pause()
    assert player.is_paused()
    block, _ = rx.next_block(128)
    np.testing.assert_array_equal(block, np.zeros_like(block))
    player.play()
    assert not player.is_paused()
    assert player.len() >= 1


def test_player_skip_one_advances():
    tx, rx = mixer(1, 48000)
    player = Player.connect_new(tx, block_frames=128)
    player.append(SamplesBuffer(1, 48000, np.full(10000, 0.25, np.float32)))
    player.append(SamplesBuffer(1, 48000, np.full(10000, 0.5, np.float32)))
    block, _ = rx.next_block(128)
    np.testing.assert_allclose(block[0], 0.25, atol=1e-6)
    player.skip_one()
    rx.next_block(128)  # transition block
    block, _ = rx.next_block(128)
    np.testing.assert_allclose(block[0], 0.5, atol=1e-6)


def test_player_position_tracks():
    tx, rx = mixer(1, 48000)
    player = Player.connect_new(tx, block_frames=128)
    player.append(SamplesBuffer(1, 48000, np.ones(48000, np.float32)))
    for _ in range(10):
        rx.next_block(128)
    pos = player.get_pos()
    assert pos == pytest.approx(10 * 128 / 48000, abs=1e-6)


def test_spatial_player_pans():
    tx, rx = mixer(2, 48000)
    player = SpatialPlayer.connect_new(
        tx, emitter_position=(-1.0, 0.0, 0.0),
        left_ear=(-1.0, 0.0, 0.0), right_ear=(1.0, 0.0, 0.0),
        block_frames=128,
    )
    player.append(SamplesBuffer(1, 48000, np.ones(48000, np.float32) * 0.5))
    block, _ = rx.next_block(128)
    left, right = np.abs(block[0]).mean(), np.abs(block[1]).mean()
    assert left > right  # emitter at the left ear

    # move emitter to the right; applied next block
    player.set_emitter_position((1.0, 0.0, 0.0))
    rx.next_block(128)
    block, _ = rx.next_block(128)
    left, right = np.abs(block[0]).mean(), np.abs(block[1]).mean()
    assert right > left


def test_device_file_sink_renders_wav(tmp_path):
    from rodio_tpu.io.device import DeviceSinkBuilder
    from rodio_tpu.io.wav import read_wav

    path = str(tmp_path / "out.wav")
    sink = (
        DeviceSinkBuilder()
        .to_file(path)
        .prefer_sample_rate(48000)
        .prefer_buffer_frames(512)
        .open()
    )
    sink.mixer().add(SamplesBuffer(2, 48000, np.ones(2048 * 2, np.float32) * 0.5))
    sink.render_blocks(4)
    sink.close()
    pcm, rate = read_wav(path)
    assert rate == 48000
    assert pcm.shape == (2, 2048)
    np.testing.assert_allclose(pcm, 0.5, atol=1e-6)


def test_device_callback_and_play(tmp_path):
    from rodio_tpu.io.device import DeviceSinkBuilder, play

    got = []
    sink = (
        DeviceSinkBuilder()
        .with_callback(got.append)
        .prefer_buffer_frames(256)
        .open()
    )
    player = play(sink, SineWave(440.0).take_duration(0.05))
    sink.render_blocks(3)
    sink.close()
    assert len(got) == 3
    assert all(len(g) == 512 for g in got)  # stereo interleaved
    assert max(np.abs(g).max() for g in got) > 0.5


def test_device_dtype_conversion():
    from rodio_tpu.io.device import DeviceSinkBuilder

    got = []
    sink = (
        DeviceSinkBuilder()
        .with_callback(got.append)
        .with_dtype(np.int16)
        .prefer_buffer_frames(128)
        .open()
    )
    sink.mixer().add(SamplesBuffer(2, 48000, np.ones(1024, np.float32)))
    sink.render_blocks(1)
    sink.close()
    assert got[0].dtype == np.int16
    assert got[0].max() == 32767


def test_microphone_feed_and_pull():
    from rodio_tpu.io.microphone import MicrophoneBuilder

    mic = (
        MicrophoneBuilder()
        .default_device()
        .prefer_channels(2)
        .prefer_sample_rate(48000)
        .open_stream()
    )
    data = np.arange(512, dtype=np.float32) / 512.0
    assert mic.feed(data) == 512
    block, alive = mic.next_block(256)
    assert alive
    np.testing.assert_allclose(
        block.T.reshape(-1), data, atol=1e-7
    )
    mic.close()
    block, alive = mic.next_block(16, timeout=0.05)
    assert not alive


def test_microphone_drop_on_full():
    from rodio_tpu.io.microphone import Microphone, MicrophoneConfig

    mic = Microphone(MicrophoneConfig(channels=1, sample_rate=1000,
                                      buffer_duration=1.0))
    big = np.ones(10000, np.float32)
    accepted = mic.feed(big)
    assert accepted <= mic._ring.capacity


def test_sample_convert_roundtrip(rng):
    from rodio_tpu.io.sample_convert import from_f32, to_f32

    x = rng.uniform(-1, 1, 1000).astype(np.float32)
    for dt in (np.int16, np.int32, np.uint8, np.uint16, np.int8):
        y = to_f32(from_f32(x, dt))
        tol = {np.int16: 1e-4, np.int32: 1e-8, np.uint8: 1.2e-2,
               np.uint16: 1e-4, np.int8: 1.2e-2}[dt]
        np.testing.assert_allclose(y, x, atol=tol, rtol=0)
    # clipping at the boundary (src/common.rs:43-48)
    loud = np.array([2.0, -2.0], np.float32)
    assert from_f32(loud, np.int16).tolist() == [32767, -32767]


def test_player_live_speed_change():
    """set_speed re-plans the current sound at the new resample ratio,
    preserving position (the span re-bootstrap analog)."""
    from rodio_tpu.control import Player, mixer
    from rodio_tpu.sources import SamplesBuffer

    rate = 48000
    ramp = np.arange(rate * 4, dtype=np.float32) / (rate * 4)
    tx, rx = mixer(1, rate)
    player = Player.connect_new(tx, block_frames=480)
    player.append(SamplesBuffer(1, rate, ramp))

    for _ in range(10):  # 4800 frames at speed 1.0
        rx.next_block(480)
    pos_before = player.get_pos()

    player.set_speed(2.0)
    block, _ = rx.next_block(480)
    # at 2x the source advances 2 frames per output frame: slope doubles
    slope = np.diff(block[0][10:470]).mean()
    assert slope == pytest.approx(2.0 / (rate * 4), rel=0.05)
    # playback continued from (approximately) the same source position
    expected_start = ramp[4800]
    assert abs(block[0][0] - expected_start) < 0.01


def test_player_on_done_and_periodic_access():
    from rodio_tpu.control import Player, mixer
    from rodio_tpu.sources import SamplesBuffer

    tx, rx = mixer(1, 48000)
    player = Player.connect_new(tx, block_frames=480)
    fired = []
    ticks = []
    player.periodic_access(0.02, lambda: ticks.append(1))  # every 960 frames
    player.append(
        SamplesBuffer(1, 48000, np.ones(1000, np.float32)),
        on_done=lambda: fired.append(1),
    )
    for _ in range(6):
        rx.next_block(480)
    assert fired == [1]
    assert len(ticks) >= 2


def test_buffered_lazy_shared_cache():
    from rodio_tpu.sources import SamplesBuffer
    from rodio_tpu.sources.buffered import Buffered

    rng2 = np.random.default_rng(9)
    data = rng2.uniform(-1, 1, (2, 1000)).astype(np.float32)
    buf = Buffered(SamplesBuffer(2, 48000, data), block_frames=256)
    clone = buf.clone()

    b1, alive = buf.next_block(300)
    np.testing.assert_allclose(b1, data[:, :300], atol=1e-7)
    assert len(buf._cache.chunks) >= 2  # only what was needed rendered

    # the clone replays from the shared cache from the start
    c1, alive = clone.next_block(300)
    np.testing.assert_array_equal(c1, b1)

    # drain past the end: zero-padded then dead
    buf.next_block(800)
    block, alive = buf.next_block(64)
    assert not alive

    # full materialization round-trips
    sb = clone.to_buffer()
    from rodio_tpu.graph import render

    np.testing.assert_allclose(np.asarray(render(sb)), data, atol=1e-7)


def test_streaming_wav_matches_full_decode():
    from rodio_tpu.io.streaming import DeviceFeeder, StreamingWav
    from rodio_tpu.io.wav import read_wav

    path = "/root/reference/assets/music.wav"
    full, rate = read_wav(path)
    sw = StreamingWav(path, chunk_frames=4000, buffer_seconds=0.2)
    assert sw.spec.sample_rate == rate
    blocks = []
    while True:
        block, alive = sw.next_block(4096)
        if not alive:
            break
        blocks.append(block)
    got = np.concatenate(blocks, axis=1)[:, : full.shape[1]]
    np.testing.assert_array_equal(got, full)

    # double-buffered device feed path
    sw2 = StreamingWav(path, chunk_frames=4000)
    feeder = DeviceFeeder(sw2, 4096)
    b1, alive = feeder.next_device_block()
    b2, alive = feeder.next_device_block()
    np.testing.assert_array_equal(np.asarray(b1), full[:, :4096])
    np.testing.assert_array_equal(np.asarray(b2), got[:, 4096:8192])


def test_queue_rate_mismatch_stitches_resampled():
    """A mid-block transition to a source at a different sample rate must
    resample the stitched tail to the block's rate (not play it raw at the
    wrong pitch). The reference re-bootstraps a downstream Uniform at the
    span boundary (src/queue.rs:166-192); the block queue converts inside."""
    q_tx, q_rx = queue(False, block_frames=256)
    a = np.full(300, 0.25, np.float32)
    b = np.ones(300, np.float32)  # 300 frames @ 24k -> ~600 frames @ 48k
    q_tx.append(SamplesBuffer(1, 48000, a))
    q_tx.append(SamplesBuffer(1, 24000, b))
    blocks = []
    for _ in range(5):
        blk, alive = q_rx.next_block(256)
        blocks.append(blk[0])
        if not alive:
            break
    out = np.concatenate(blocks)
    # source a: 300 frames of 0.25
    np.testing.assert_allclose(out[:300], 0.25)
    # source b resampled 24k->48k: ~600 frames of ~1.0 starting at 300
    assert np.all(np.abs(out[310:880] - 1.0) < 1e-5), out[300:320]
    # and it ends near frame 900 (300 + ~600), not 600 (which would mean
    # the tail played unresampled at the wrong rate)
    assert np.abs(out[920:]).max() == 0.0
    assert np.abs(out[300:880]).min() > 0.9
