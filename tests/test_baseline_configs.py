"""The five BASELINE.json eval configs as integration tests (CPU-scaled).

1. music.wav -> 44.1->48k resample -> stereo WAV via wav_to_file
2. single-stream effects chain: low_pass + AGC + limiter on music.flac
3. 64-source mix (generators + decoded assets) to stereo @48k
4. spatial scene: panning + reverb + fade with a moving emitter
5. batched multi-stream pipeline (flagship graph, small scale on CPU)
"""
import os

import numpy as np
import pytest

import rodio_tpu.refimpl as ri
from rodio_tpu.graph import render
from rodio_tpu.io.decoder import Decoder
from rodio_tpu.io.wav import read_wav, wav_to_file

ASSETS = "/root/reference/assets"


def _asset(name):
    p = os.path.join(ASSETS, name)
    if not os.path.exists(p):
        pytest.skip(f"missing asset {name}")
    return p


def interleave(b):
    return np.asarray(b).T.reshape(-1)


def test_config1_wav_resample_render(tmp_path):
    """music.wav -> 44.1->48 kHz -> WAV, parity vs the scalar oracle."""
    pcm, rate = read_wav(_asset("music.wav"))
    assert rate == 44100
    seconds = 1.0
    cut = pcm[:, : int(seconds * rate)]

    # oracle: the reference's converter chain per-sample
    ref_src = ri.SamplesBuffer(2, 44100, interleave(cut))
    ref_uni = ri.UniformSourceIterator(ref_src, 2, 48000)
    expected = []
    while True:
        v = ref_uni.next()
        if v is None:
            break
        expected.append(v)
    expected = np.asarray(expected, np.float32)

    from rodio_tpu.conversions.uniform import Uniform
    from rodio_tpu.sources.generators import SamplesBuffer

    # rodio_compat reproduces the oracle's 32768-sample span re-bootstrap
    node = Uniform(SamplesBuffer(2, 44100, cut), 2, 48000, rodio_compat=True)
    out_path = str(tmp_path / "config1.wav")
    wav_to_file(node, out_path)
    got, orate = read_wav(out_path)
    assert orate == 48000
    gi = interleave(got)
    assert len(gi) == len(expected)
    np.testing.assert_allclose(gi, expected, atol=2e-7)


def test_config2_flac_effects_chain():
    """low_pass + AGC + limiter on music.flac, parity vs the oracle."""
    d = Decoder(_asset("music.flac"))
    frames = 24000  # ~0.54 s at 44.1k — oracle is per-sample Python
    pcm = render(d, max_frames=frames)

    ref = ri.SamplesBuffer(2, 44100, interleave(pcm))
    ref = ri.BltFilter(ref, "low_pass", 2000.0, 0.5)
    ref = ri.AutomaticGainControl(ref, ri.AgcSettings())
    ref = ri.Limit(ref, ri.LimitSettings())
    expected = []
    while True:
        v = ref.next()
        if v is None:
            break
        expected.append(v)
    expected = np.asarray(expected, np.float32)

    from rodio_tpu.effects import (
        AgcSettings,
        AutomaticGainControl,
        Limit,
        LimitSettings,
    )
    from rodio_tpu.sources.generators import SamplesBuffer

    node = SamplesBuffer(2, 44100, pcm).low_pass(2000.0)
    node = AutomaticGainControl(node, AgcSettings())
    node = Limit(node, LimitSettings())
    got = interleave(render(node, block_frames=4096))
    assert len(got) == len(expected)
    # On TPU hardware this chain is BIT-EXACT vs the oracle (measured 0.0,
    # tools/parity_tpu.py / PARITY_TPU.md). This suite runs on XLA:CPU,
    # whose LLVM backend contracts mul+add into FMA depending on the
    # compilation context; through the AGC gain smoother's near-unity
    # attack coefficient the 1-ulp-per-step differences integrate to up
    # to ~7e-5 — a test-host artifact, hence the loose CPU bound.
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_config3_64_source_mix():
    """64 sources (generators + decoded assets) summed to stereo @48k."""
    from rodio_tpu.control import mixer
    from rodio_tpu.sources import SineWave, SquareWave, TriangleWave

    tx, rx = mixer(2, 48000)
    for i in range(60):
        freq = 110.0 * (1 + i % 16)
        cls = (SineWave, SquareWave, TriangleWave)[i % 3]
        tx.add(cls(freq).amplify(1 / 64).take_duration(0.25))
    tx.add(Decoder(_asset("music.wav")).amplify(1 / 64).take_duration(0.25))
    tx.add(Decoder(_asset("music.flac")).amplify(1 / 64).take_duration(0.25))
    tx.add(Decoder(_asset("beep.wav")).amplify(1 / 64).take_duration(0.25))
    tx.add(Decoder(_asset("beep2.wav")).amplify(1 / 64).take_duration(0.25))

    blocks = []
    for _ in range(4):
        block, alive = rx.next_block(2048)
        blocks.append(block)
        assert alive
    out = np.concatenate(blocks, axis=1)
    assert out.shape == (2, 8192)
    assert 0.001 < np.abs(out).max() < 4.0


def test_config4_spatial_scene():
    """Panning + reverb + fade on a moving emitter."""
    from rodio_tpu.control import mixer
    from rodio_tpu.control.spatial_player import SpatialPlayer
    from rodio_tpu.sources import SineWave

    tx, rx = mixer(2, 48000)
    player = SpatialPlayer.connect_new(
        tx, emitter_position=(-2.0, 0.0, 0.0),
        left_ear=(-1.0, 0.0, 0.0), right_ear=(1.0, 0.0, 0.0),
        block_frames=256,
    )
    src = SineWave(330.0).take_duration(1.0).fade_in(0.1).reverb(0.03, 0.4)
    player.append(src)

    lefts, rights = [], []
    n_blocks = 30
    for b in range(n_blocks):
        # sweep the emitter left -> right across the scene
        x = -2.0 + 4.0 * b / n_blocks
        player.set_emitter_position((x, 0.0, 0.0))
        block, _ = rx.next_block(256)
        lefts.append(np.abs(block[0]).mean())
        rights.append(np.abs(block[1]).mean())
    # early blocks favor the left ear, late blocks the right
    assert np.mean(lefts[2:8]) > np.mean(rights[2:8])
    assert np.mean(rights[-6:]) > np.mean(lefts[-6:])


def test_config5_batched_pipeline_small():
    """Flagship graph at CPU scale: correctness of the batched path."""
    from rodio_tpu.flagship import make_flagship

    node, state = make_flagship(16, seconds=0.5, max_block=1024)
    import jax

    step = jax.jit(lambda s: node.emit(s, 512))
    total = 0
    for _ in range(10):
        state, out, valid = step(state)
        assert out.shape == (2, 512)
        total += int(valid)
    assert total > 0
    # streams are attenuated 1/16-ish each and limited on the master bus
    assert np.abs(np.asarray(out)).max() < 1.5


def test_checkpoint_resume_exact(tmp_path):
    """Save/resume mid-stream reproduces the identical continuation."""
    import jax

    from rodio_tpu.effects import Limit, LimitSettings
    from rodio_tpu.graph.checkpoint import load_state, save_state
    from rodio_tpu.sources import SineWave

    node = Limit(
        SineWave(440.0).amplify(1.5).low_pass(3000.0), LimitSettings()
    )
    step = jax.jit(lambda s: node.emit(s, 256))
    state = node.init_state()
    for _ in range(5):
        state, out, _ = step(state)

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, metadata={"pos_blocks": 5})
    state2 = load_state(path, node.init_state())

    from rodio_tpu.graph.checkpoint import checkpoint_metadata

    assert checkpoint_metadata(path)["pos_blocks"] == 5

    s_a, out_a, _ = step(state)
    s_b, out_b, _ = step(state2)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_from_iter_and_factory():
    from rodio_tpu.sources import SamplesBuffer
    from rodio_tpu.sources.concat import from_factory, from_iter

    a = SamplesBuffer(1, 48000, np.full(300, 0.1, np.float32))
    b = SamplesBuffer(1, 48000, np.full(300, 0.2, np.float32))
    q = from_iter([a, b], block_frames=256)
    block, alive = q.next_block(256)
    np.testing.assert_allclose(block[0], 0.1, atol=1e-7)
    block, alive = q.next_block(256)
    np.testing.assert_allclose(block[0][:44], 0.1, atol=1e-7)
    np.testing.assert_allclose(block[0][44:], 0.2, atol=1e-7)

    made = []

    def factory():
        if len(made) >= 2:
            return None
        made.append(1)
        return SamplesBuffer(1, 48000, np.full(100, 0.5, np.float32))

    q = from_factory(factory, block_frames=128)
    block, alive = q.next_block(128)
    assert alive
    np.testing.assert_allclose(block[0][:100], 0.5, atol=1e-7)
    block, alive = q.next_block(128)  # second factory source + drain
    block, alive = q.next_block(128)
    assert not alive


def test_empty_callback_fires():
    from rodio_tpu.sources.concat import EmptyCallback

    fired = []
    cb = EmptyCallback(lambda: fired.append(1))
    block, alive = cb.next_block(64)
    assert fired == [1]
    assert not alive


def test_flagship_equals_per_stream_computation():
    """The wide-channel flagship pipeline must equal the same graph
    computed stream by stream (resample -> low_pass -> gain, summed, then
    the master limiter)."""
    import jax

    from rodio_tpu.effects import Limit, LimitSettings
    from rodio_tpu.effects.blt import BltFilter
    from rodio_tpu.flagship import make_flagship
    from rodio_tpu.sources import SamplesBuffer

    n_streams, seconds = 4, 0.4
    node, state = make_flagship(n_streams, seconds=seconds, max_block=1024,
                                seed=11)
    T = 512
    step = jax.jit(lambda s: node.emit(s, T))
    got_blocks = []
    for _ in range(8):
        state, out, valid = step(state)
        got_blocks.append(np.asarray(out[:, : int(valid)]))
    got = np.concatenate(got_blocks, axis=1)

    # reconstruct per-stream inputs exactly as make_flagship builds them
    rng2 = np.random.default_rng(11)
    frames = int(seconds * 44100)
    base = rng2.standard_normal((2, frames)).astype(np.float32) * 0.1
    shifts = rng2.integers(0, frames, size=n_streams)
    gains = rng2.uniform(0.5, 1.5, size=n_streams).astype(np.float32) / n_streams

    total = None
    for s in range(n_streams):
        data = np.roll(base, int(shifts[s]), axis=1)
        chain = SamplesBuffer(2, 44100, data).resample(48000)
        chain = BltFilter(chain, "low_pass", 2000.0, 0.5)
        chain = chain.amplify(float(gains[s]))
        out = np.asarray(render(chain, block_frames=512))
        total = out if total is None else total + out
    master = Limit(SamplesBuffer(2, 48000, total), LimitSettings())
    expected = np.asarray(render(master, block_frames=512))

    n = min(got.shape[1], expected.shape[1])
    np.testing.assert_allclose(got[:, :n], expected[:, :n], atol=3e-6)
