"""PulseAudio/PipeWire backend (io/pulse.py) — control-flow tests via
an injected fake libpulse-simple (no daemon on TPU hosts; the real
library binds at runtime where present). Mirrors the ALSA backend's
fake-lib test strategy.
"""
import ctypes

import numpy as np

from rodio_tpu.io.device import (
    DeviceConfig, DeviceSinkBuilder, MixerDeviceSink, NullDevice,
)
from rodio_tpu.io.pulse import PulseCapture, PulseDevice, available


class FakePulse:
    """Records calls; injects one write failure mid-stream (daemon
    hiccup) to exercise the reconnect path."""

    def __init__(self, fail_at_write: int = 0, capture_blocks: int = 4):
        self.news = []
        self.writes = []
        self.reads = 0
        self.freed = 0
        self.drained = 0
        self._fail_at = fail_at_write
        self._capture_blocks = capture_blocks
        self._next = 1

    def pa_simple_new(self, server, app, direction, dev, name, spec,
                      chmap, attr, err):
        self.news.append((direction, bytes(app),
                          (spec.contents.format, spec.contents.rate,
                           spec.contents.channels)))
        h = self._next
        self._next += 1
        return h

    def pa_simple_write(self, s, data, nbytes, err):
        if len(self.writes) + 1 == self._fail_at and self._fail_at > 0:
            self._fail_at = -1
            err.contents.value = 11  # PA_ERR_TIMEOUT-ish
            return -1
        self.writes.append(int(nbytes))
        return 0

    def pa_simple_read(self, s, data, nbytes, err):
        self.reads += 1
        if self.reads > self._capture_blocks:
            import time

            time.sleep(0.005)
            err.contents.value = 6  # daemon gone
            return -1
        n = int(nbytes) // 4
        arr = (ctypes.c_float * n).from_address(
            ctypes.cast(data, ctypes.c_void_p).value
        )
        for i in range(n):
            arr[i] = 0.5
        return 0

    def pa_simple_drain(self, s, err):
        self.drained += 1
        return 0

    def pa_simple_free(self, s):
        self.freed += 1


def test_pulse_device_write_and_reconnect():
    fake = FakePulse(fail_at_write=2)
    dev = PulseDevice(lib=fake)
    cfg = DeviceConfig(channels=2, sample_rate=48000)
    blk = np.zeros(1024 * 2, np.float32)
    dev.write(blk, cfg)
    dev.write(blk, cfg)   # injected failure -> reconnect -> retry
    dev.write(blk, cfg)
    dev.close()
    # two opens (initial + reconnect), all playback, f32le 2ch 48k
    assert [n[0] for n in fake.news] == [1, 1]
    assert fake.news[0][2] == (5, 48000, 2)
    assert dev.errors == 1
    assert sum(fake.writes) == 3 * 1024 * 2 * 4
    assert fake.drained == 1 and fake.freed == 2


def test_pulse_device_through_sink():
    from rodio_tpu.control.player import Player
    from rodio_tpu.sources.generators import SineWave

    fake = FakePulse()
    sink = MixerDeviceSink(PulseDevice(lib=fake),
                           DeviceConfig(buffer_frames=256))
    player = Player.connect_new(sink.mixer())
    player.append(SineWave(440.0))
    sink.render_blocks(4)
    sink.close()
    assert sum(fake.writes) == 4 * 256 * 2 * 4
    assert fake.freed == 1


def test_pulse_capture_feeds_microphone():
    from rodio_tpu.io.microphone import Microphone, MicrophoneConfig

    fake = FakePulse(capture_blocks=6)
    mic = Microphone(MicrophoneConfig(channels=1, sample_rate=48000))
    cap = PulseCapture(mic, period_frames=256, lib=fake)
    cap.start()
    assert fake.news[0][0] == 2  # record stream
    block, ok = mic.next_block(512, timeout=2.0)
    cap.close()
    assert ok and block.shape == (1, 512)
    np.testing.assert_allclose(block, 0.5)


def test_default_sink_probe_order():
    """cpal's Linux order: the Pulse daemon outranks raw ALSA; with
    neither, the null sink (this host has neither)."""
    sink = DeviceSinkBuilder.open_default_sink()
    try:
        if available():
            from rodio_tpu.io.pulse import PulseDevice as _P

            assert isinstance(sink._backend, _P)
        elif not isinstance(sink._backend, NullDevice):
            from rodio_tpu.io.alsa import AlsaDevice as _A

            assert isinstance(sink._backend, _A)
    finally:
        sink.close()
