"""Edge cases and failure behavior: truncated/corrupt inputs, degenerate
graph parameters, extreme ratios. Errors must be typed, never crashes."""
import numpy as np
import pytest

from rodio_tpu.graph import render
from rodio_tpu.io.decoder import Decoder, DecoderError
from rodio_tpu.sources import SamplesBuffer, SineWave


@pytest.mark.parametrize(
    "name", ["music.flac", "music.mp3", "music.ogg", "music.wav"]
)
def test_truncated_files_fail_cleanly_or_decode_prefix(name):
    data = open(f"/root/reference/assets/{name}", "rb").read()
    for cut in (10, 100, len(data) // 2):
        try:
            d = Decoder(data[:cut])
            out = render(d, max_frames=1000)  # partial decode is acceptable
            assert np.all(np.isfinite(out))
        except (DecoderError, ValueError):
            pass  # clean typed failure is acceptable


def test_corrupt_middle_bytes_flac():
    data = bytearray(open("/root/reference/assets/music.flac", "rb").read())
    data[len(data) // 2 : len(data) // 2 + 64] = b"\xff" * 64
    try:
        d = Decoder(bytes(data))
        out = render(d)
        assert np.all(np.isfinite(out))  # decode-error skipping, no NaNs
    except (DecoderError, ValueError):
        pass


def test_empty_buffer_source():
    buf = SamplesBuffer(2, 48000, np.zeros((2, 0), np.float32))
    out = render(buf)
    assert out.shape == (2, 0)


def test_empty_buffer_through_chain():
    buf = SamplesBuffer(2, 48000, np.zeros((2, 0), np.float32))
    node = buf.low_pass(1000.0).amplify(0.5).limit()
    out = render(node)
    assert out.shape == (2, 0)


def test_extreme_resample_ratios(rng):
    data = rng.uniform(-1, 1, (1, 500)).astype(np.float32)
    # giant upsample and downsample both stay finite and length-correct
    up = SamplesBuffer(1, 1000, data).resample(192000)
    out = render(up, block_frames=4096)
    assert np.all(np.isfinite(out))
    down = SamplesBuffer(1, 192000, data).resample(1000)
    out = render(down, block_frames=64)
    assert np.all(np.isfinite(out))
    assert out.shape[1] <= 4


def test_take_zero_duration():
    node = SineWave(440.0).take_duration(0.0)
    out = render(node)
    assert out.shape[1] == 0


def test_single_frame_buffer_resample(rng):
    buf = SamplesBuffer(2, 44100, rng.uniform(-1, 1, (2, 1)).astype(np.float32))
    out = render(buf.resample(48000), block_frames=16)
    # one input frame -> exactly the drain frame
    assert out.shape[1] == 1


def test_denormal_and_large_inputs():
    tiny = np.full((2, 256), 1e-38, np.float32)
    huge = np.full((2, 256), 1e20, np.float32)
    for data in (tiny, huge):
        node = SamplesBuffer(2, 48000, data).limit()
        out = render(node)
        assert np.all(np.isfinite(out))


def test_garbage_wav_rejected(tmp_path):
    p = tmp_path / "fake.wav"
    p.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunkjunk")
    with pytest.raises((DecoderError, ValueError, Exception)):
        Decoder(str(p))
