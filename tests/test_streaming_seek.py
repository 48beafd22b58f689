"""Sample-accurate seek on the CONSTANT-MEMORY streaming path.

The whole-file Decoder has exact O(1) seek for free (the PCM is resident);
the reference additionally seeks its STREAMING decoders accurately via
coarse demuxer seek + decoder reset + sample-skip refinement
(/root/reference/src/decoder/symphonia.rs:225-330, exercised by
/root/reference/tests/seek.rs). These tests pin the same capability on
FfStream.seek_accurate / StreamingDecoder(start_at=) / StreamFarm.try_seek.
"""
import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets"


def _asset(name):
    path = os.path.join(ASSETS, name)
    if not os.path.exists(path):
        pytest.skip(f"asset {name} missing")
    return path


def _skip_without_native():
    try:
        from rodio_tpu.io.native import lib

        lib()
    except Exception as e:
        pytest.skip(f"native lib unavailable: {e}")


def _read_all(s, chunk=65536):
    parts = []
    while True:
        blk = s.read(chunk)
        if blk.shape[1] == 0:
            return (np.concatenate(parts, axis=1) if parts
                    else np.zeros((s.channels, 0), np.float32))
        parts.append(blk)


@pytest.mark.parametrize("name,tol", [
    ("music.flac", 0.0),   # intra-frame-independent codec: bit-exact
    ("music.mp3", 0.0),    # bit reservoir converges inside the pre-roll
    ("music.ogg", 0.0),
])
def test_ffstream_seek_accurate_matches_full_decode_tail(name, tol):
    """seek_accurate(t) + read-to-end == the full decode's tail from
    round(t*rate) — the refine loop is sample-exact on every format
    (same decoder both sides, so losslessness of the codec is moot)."""
    _skip_without_native()
    from rodio_tpu.io.native import FfStream

    path = _asset(name)
    s = FfStream(path)
    full = _read_all(s)
    s.close()

    for t in (2.345678, 0.013, 9.9):
        s = FfStream(path)
        k = int(round(t * s.sample_rate))
        got = s.seek_accurate(t)
        assert got == k, (name, t)
        tail = _read_all(s)
        s.close()
        want = full[:, k:]
        assert tail.shape == want.shape, (name, t)
        if tol == 0.0:
            np.testing.assert_array_equal(tail, want, err_msg=f"{name}@{t}")
        else:
            np.testing.assert_allclose(tail, want, atol=tol,
                                       err_msg=f"{name}@{t}")


def test_ffstream_seek_accurate_by_frames():
    _skip_without_native()
    from rodio_tpu.io.native import FfStream

    path = _asset("music.flac")
    s = FfStream(path)
    full = _read_all(s)
    s.close()
    s = FfStream(path)
    got = s.seek_accurate(frames=100_001)
    assert got == 100_001
    blk = s.read(4096)
    s.close()
    np.testing.assert_array_equal(blk, full[:, 100_001:100_001 + 4096])


def test_ffstream_seek_accurate_past_end():
    """Seeking at/after end of stream leaves an exhausted stream (the
    reference's seek clamps to total_duration, tests/seek.rs:97-118)."""
    _skip_without_native()
    from rodio_tpu.io.native import FfStream

    s = FfStream(_asset("music.flac"))
    s.seek_accurate(10_000.0)
    assert s.read(1024).shape[1] == 0
    s.close()


def test_ffstream_seek_remaining_duration():
    """Post-seek remaining playtime within the reference's +-250 ms
    window (/root/reference/tests/seek.rs:138-162)."""
    _skip_without_native()
    from rodio_tpu.io.native import FfStream

    for name in ("music.flac", "music.mp3"):
        path = _asset(name)
        s = FfStream(path)
        total = _read_all(s).shape[1]
        s.close()
        s = FfStream(path)
        t = 4.0
        s.seek_accurate(t)
        rest = _read_all(s).shape[1]
        s.close()
        want = total - round(t * s.sample_rate)
        assert abs(rest - want) <= 0.25 * s.sample_rate, (name, rest, want)


@pytest.mark.parametrize("name", ["music.wav", "music.flac"])
def test_streaming_decoder_start_at_matches_whole_decoder_seek(name):
    """StreamingDecoder(start_at=t) == the whole-file Decoder's exact
    seek render, sample for sample (both decode paths are lossless for
    wav/flac). VERDICT r4 ask #4's done-criterion at 1e-6."""
    _skip_without_native()
    import jax

    from rodio_tpu.graph.render import render
    from rodio_tpu.io.decoder import Decoder
    from rodio_tpu.io.streaming import StreamingDecoder

    path = _asset(name)
    t = 3.21
    d = Decoder(path)
    st = d.seek_state(d.init_state(), t)  # O(1) exact whole-file seek
    k = int(np.asarray(st["pos"]))
    assert k == int(round(t * d.spec.sample_rate))
    _, want, v = jax.jit(lambda s: d.emit(s, 8192))(st)
    want = np.asarray(want)[:, : int(v)]

    sd = StreamingDecoder(path, start_at=t, chunk_frames=4096)
    got = np.zeros((sd.spec.channels, 0), np.float32)
    while got.shape[1] < want.shape[1]:
        blk, alive = sd.next_block(4096)
        got = np.concatenate([got, blk], axis=1)
        if not alive:
            break
    np.testing.assert_allclose(
        got[:, : want.shape[1]], want, atol=1e-6, err_msg=name
    )


def test_streaming_decoder_start_at_mp3_self_consistent():
    """mp3 start_at: the streamed tail equals the same FfStream path's
    full decode from the target (cross-decoder mp3 parity vs libmpg123
    is a different contract — the seek contract is positional
    exactness within ONE decoder)."""
    _skip_without_native()
    from rodio_tpu.io.native import FfStream
    from rodio_tpu.io.streaming import StreamingDecoder

    path = _asset("music.mp3")
    s = FfStream(path)
    full = _read_all(s)
    rate = s.sample_rate
    s.close()
    t = 5.4321
    k = int(round(t * rate))
    sd = StreamingDecoder(path, start_at=t, chunk_frames=4096)
    got = np.zeros((sd.spec.channels, 0), np.float32)
    while got.shape[1] < 30000:
        blk, alive = sd.next_block(4096)
        got = np.concatenate([got, blk], axis=1)
        if not alive:
            break
    n = min(got.shape[1], full.shape[1] - k, 30000)
    np.testing.assert_array_equal(got[:, :n], full[:, k : k + n])


def test_streaming_wav_start_at_byte_exact():
    from rodio_tpu.io.decoder import Decoder
    from rodio_tpu.io.streaming import StreamingDecoder

    path = _asset("music.wav")
    d = Decoder(path)
    pcm = np.asarray(d.init_state()["data"])[:, : d._frames]
    t = 1.007
    k = int(round(t * d.spec.sample_rate))
    sd = StreamingDecoder(path, start_at=t, chunk_frames=4096)
    blk, alive = sd.next_block(4096)
    assert alive
    np.testing.assert_array_equal(blk, pcm[:, k : k + 4096])


def test_farm_try_seek_equals_start_offsets():
    """try_seek BEFORE the first block == constructing with
    start_offsets (the device window is empty, so the seek is fully
    observable): the farm renders identical output."""
    _skip_without_native()
    from rodio_tpu.parallel.farm import StreamFarm

    paths = [_asset("music.flac"), _asset("music.flac")]
    t = 2.5

    def run(farm, blocks=3):
        outs = []
        farm.run(blocks, on_block=lambda k, o, v: outs.append(
            np.asarray(o)))
        farm.close()
        return np.concatenate(outs, axis=1)

    fa = StreamFarm(paths, block_frames=1024, start_offsets=[0.0, t],
                    loop=False)
    a = run(fa)
    fb = StreamFarm(paths, block_frames=1024, loop=False)
    got = fb.try_seek(1, t)
    assert got == int(round(t * fb.spec_in.sample_rate))
    b = run(fb)
    np.testing.assert_array_equal(a, b)


def test_farm_try_seek_live_keeps_producing():
    """A mid-run try_seek keeps the farm alive: the stream's post-seek
    content enters the mix after the buffered window drains, and the
    farm keeps producing full-valid blocks (no dropout, no deadlock)."""
    _skip_without_native()
    from rodio_tpu.parallel.farm import StreamFarm

    farm = StreamFarm([_asset("music.flac")], block_frames=1024,
                      loop=True)
    seen = []

    def on_block(k, out, v):
        seen.append((int(v), float(np.abs(np.asarray(out)).max())))
        if k == 1:
            farm.try_seek(0, 6.0)

    farm.run(6, on_block=on_block)
    farm.close()
    assert len(seen) == 6
    assert all(v == 1024 for v, _ in seen)
    assert all(m > 0.0 for _, m in seen[2:])  # audio keeps flowing
