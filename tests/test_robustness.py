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


def test_flac_frame_header_fuzz():
    """Adversarial FLAC frames (bit-flipped frame/subframe headers) must
    never write out of bounds: malformed partition orders / LPC orders are
    rejected by the decoder's RFC 9639 validation (native/flac.cpp)."""
    base = bytearray(open("/root/reference/assets/music.flac", "rb").read())
    rng = np.random.default_rng(7)
    for trial in range(8):
        data = bytearray(base)
        # corrupt bytes shortly after frame sync markers to hit the
        # frame/subframe/residual header fields
        pos = 0
        hits = 0
        while pos + 1 < len(data) and hits < 40:
            if data[pos] == 0xFF and (data[pos + 1] & 0xFC) == 0xF8:
                off = int(rng.integers(2, 24))
                if pos + off < len(data):
                    data[pos + off] = int(rng.integers(0, 256))
                hits += 1
                pos += 64
            pos += 1
        try:
            d = Decoder(bytes(data))
            out = render(d, max_frames=48000)
            assert np.all(np.isfinite(out))
        except (DecoderError, ValueError):
            pass


def test_flac_malicious_partition_order():
    """A hand-built FLAC frame with partition_order making part_len < order
    used to underflow the residual count to ~2^32 (heap overflow)."""
    import struct

    def bits_to_bytes(bits):
        pad = (-len(bits)) % 8
        bits = bits + "0" * pad
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    # minimal STREAMINFO: 48k, 1ch, 16bps, unknown total
    si = (
        format(4096, "016b") * 2 + "0" * 24 + "0" * 24
        + format(48000, "020b") + format(0, "03b") + format(15, "05b")
        + format(0, "036b") + "0" * 128
    )
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + bits_to_bytes(si)
    # frame: blocksize code 2 (=576), LPC order 32 subframe,
    # partition_order 6 -> part_len = 9 < order = 32
    fr = "11111111111110" + "0" + "0" + "0010" + "1010" + "0000" + "100" + "0"
    fr += "00000000"  # utf8 frame number 0
    fr += "00000000"  # crc8 (unchecked)
    fr += "0" + format(63, "06b") + "0"  # subframe: LPC order 32
    fr += "0" * 16 * 32  # warmup samples
    fr += "0011" + "00000"  # precision 4, shift 0
    fr += "0000" * 32  # coefficients
    fr += "00" + "0110"  # residual method 0, partition_order 6
    fr += ("0000" + "1" * 80) * 64  # rice params + unary junk
    data = header + bits_to_bytes(fr)
    try:
        d = Decoder(data)
        out = render(d, max_frames=4096)
        assert np.all(np.isfinite(out))
    except (DecoderError, ValueError):
        pass


def test_seek_error_taxonomy_live_source_intact():
    """SeekError.source_intact (src/source/mod.rs:797-809): seeking a
    live input fails with NotSupported and the stream keeps playing."""
    import jax.numpy as jnp
    import pytest

    from rodio_tpu import SeekError, SeekNotSupported
    from rodio_tpu.graph.seek import seek_state
    from rodio_tpu.io.streaming import PushPort

    port = PushPort(2, 48000, capacity=64, push_frames=16)
    with pytest.raises(SeekNotSupported) as exc:
        seek_state(port, 5.0)
    assert exc.value.source_intact is True
    assert isinstance(exc.value, SeekError)
    # the port still works after the failed seek
    st = port.init_state()
    st = port.push(st, jnp.ones((2, 16)), 16)
    st, out, valid = port.emit(st, 8)
    assert int(valid) == 8


def test_play_error_on_undecodable_path(tmp_path):
    """src/play.rs PlayError::DecoderError surfaces as a typed error."""
    import pytest

    from rodio_tpu import PlayError
    from rodio_tpu.io.device import DeviceSinkBuilder, play

    bad = tmp_path / "not_audio.xyz"
    bad.write_bytes(b"this is not audio at all")
    sink = DeviceSinkBuilder().open()
    try:
        with pytest.raises(PlayError):
            play(sink, str(bad))
    finally:
        sink.close()
