"""Streaming ingest — the decode/feed pipeline for unbounded audio.

The decoder facade loads whole files to HBM (ideal up to minutes of audio);
for very long or live material this module streams instead, with the same
shape as the reference's realtime path: a host decode thread fills the
native SPSC ring (the 100 ms cpal-buffer analog), and the consumer
assembles device blocks, optionally double-buffered so the host->device
transfer of block k+1 overlaps the DSP of block k (SURVEY.md §7.6).

- StreamingWav — incremental WAV file reader (no full load)
- StreamingFeed — any (callable -> PCM chunks) producer through the ring
- DeviceFeeder — double-buffered device_put of host blocks
"""
from __future__ import annotations

import struct
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from ..core.types import StreamSpec
from .native import SpscRing
from .wav import WAVE_FORMAT_EXTENSIBLE, WAVE_FORMAT_IEEE_FLOAT, WAVE_FORMAT_PCM, WavError


def _wav_stream_chunks(path: str, chunk_frames: int,
                       start_frames: int = 0) -> Iterator[np.ndarray]:
    """Yield [channels, chunk] f32 chunks from a WAV file incrementally.
    ``start_frames`` seeks SAMPLE-EXACTLY into the data chunk (a byte
    offset — WAV is constant-rate PCM, so accurate seek is free)."""
    with open(path, "rb") as f:
        riff, _, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise WavError("not a RIFF/WAVE file")
        fmt = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return
            cid, csz = struct.unpack("<4sI", hdr)
            if cid == b"fmt ":
                fmt = f.read(csz)
                if csz % 2:
                    f.read(1)
            elif cid == b"data":
                break
            else:
                f.seek(csz + (csz % 2), 1)
        if fmt is None:
            raise WavError("missing fmt chunk")
        tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
        if tag == WAVE_FORMAT_EXTENSIBLE:
            tag = struct.unpack("<H", fmt[24:26])[0]
        bytes_per_sample = bits // 8
        frame_bytes = bytes_per_sample * channels
        remaining = csz
        if start_frames > 0:
            skip = min(start_frames * frame_bytes, remaining)
            f.seek(skip, 1)
            remaining -= skip

        def convert(buf: bytes) -> np.ndarray:
            if tag == WAVE_FORMAT_IEEE_FLOAT and bits == 32:
                x = np.frombuffer(buf, dtype="<f4").astype(np.float32)
            elif tag == WAVE_FORMAT_PCM and bits == 16:
                x = np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32768.0
            elif tag == WAVE_FORMAT_PCM and bits == 32:
                x = np.frombuffer(buf, dtype="<i4").astype(np.float32) / 2147483648.0
            elif tag == WAVE_FORMAT_PCM and bits == 24:
                raw = np.frombuffer(buf, dtype=np.uint8)
                n3 = len(raw) // 3
                raw = raw[: n3 * 3].reshape(n3, 3)
                v = (raw[:, 0].astype(np.int32)
                     | (raw[:, 1].astype(np.int32) << 8)
                     | (raw[:, 2].astype(np.int32) << 16))
                v = (v ^ 0x800000) - 0x800000
                x = v.astype(np.float32) / 8388608.0
            else:
                raise WavError(f"unsupported streaming format {tag}/{bits}")
            frames = len(x) // channels
            return x[: frames * channels].reshape(frames, channels).T

        _wav_stream_chunks.spec = StreamSpec(channels, rate)  # metadata out
        while remaining >= frame_bytes:
            want = min(chunk_frames * frame_bytes, remaining)
            want -= want % frame_bytes
            buf = f.read(want)
            if len(buf) < frame_bytes:
                return
            remaining -= len(buf)
            yield convert(buf)


def wav_stream_spec(path: str) -> StreamSpec:
    """Read just the header -> StreamSpec."""
    gen = _wav_stream_chunks(path, 1)
    try:
        next(gen)
    except StopIteration:
        pass
    return _wav_stream_chunks.spec


class StreamingFeed:
    """Producer thread -> SPSC ring -> block consumer.

    ``producer`` yields [channels, n] f32 chunks; the thread pushes them
    interleaved into the ring (blocking while full), ending the stream when
    the iterator ends. The consumer side is the same host-driven block API
    as the microphone (the reference's capture shape, src/microphone.rs).
    """

    def __init__(self, producer: Iterator[np.ndarray], spec: StreamSpec,
                 *, buffer_seconds: float = 0.5):
        self.spec = spec
        capacity = int(buffer_seconds * spec.sample_rate * spec.channels)
        self._ring = SpscRing(max(capacity, 4096))
        self._done = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(producer,), daemon=True
        )
        self._thread.start()

    def _run(self, producer):
        import time

        try:
            for chunk in producer:
                interleaved = np.ascontiguousarray(
                    np.asarray(chunk, np.float32).T.reshape(-1)
                )
                off = 0
                while off < len(interleaved):
                    pushed = self._ring.push(interleaved[off:])
                    off += pushed
                    if pushed == 0:
                        time.sleep(0.002)  # ring full: wait for the consumer
        finally:
            self._done.set()

    def next_block(self, n: int):
        import time

        c = self.spec.channels
        want = n * c
        out = np.zeros(want, dtype=np.float32)
        got = 0
        while got < want:
            chunk = self._ring.pop(want - got)
            if len(chunk):
                out[got : got + len(chunk)] = chunk
                got += len(chunk)
                continue
            if self._done.is_set() and len(self._ring) == 0:
                break
            time.sleep(0.002)
        if got == 0:
            return out.reshape(n, c).T, False
        return np.ascontiguousarray(out.reshape(n, c).T), True


class StreamingWav(StreamingFeed):
    """Incremental WAV playback source: O(ring) memory for any file length."""

    def __init__(self, path: str, *, chunk_frames: int = 8192,
                 buffer_seconds: float = 0.5):
        spec = wav_stream_spec(path)
        super().__init__(
            _wav_stream_chunks(path, chunk_frames), spec,
            buffer_seconds=buffer_seconds,
        )


class PushPort:
    """Device-resident sliding input window — the jit-side endpoint of a
    host feed, presenting the RANDOM_ACCESS surface (``access_window`` /
    ``slice_frames``) so the resampler's MXU matmul path engages (TPU
    gathers/scatters on wide blocks are pathologically slow).

    The buffer holds frames [base, base + level) of the global stream;
    the host appends fixed-shape [C, push_frames] blocks (dynamic valid
    ``count``) and retires consumed frames (``retire``, computed from the
    consumer's closed-form demand) in the same :meth:`push` call. All
    bookkeeping is device-side scalars — a jitted step(state, block,
    count, retire) never syncs with the host. The analog of the
    reference's cpal transfer buffer (src/stream.rs:221).

    Overflowing pushes set the ``overflow`` flag (data would corrupt the
    window; the host sizes pushes so it never happens — tests assert it).
    """

    RANDOM_ACCESS = True
    #: live input: no seekable past (core/errors.py SeekNotSupported)
    LIVE = True

    def __init__(self, channels: int, sample_rate: int, capacity: int,
                 push_frames: int):
        self.spec = StreamSpec(channels, sample_rate)
        self.capacity = int(capacity)
        self.push_frames = int(push_frames)
        #: downstream window-eligibility bound (resample.py checks it);
        #: the host feed contract keeps requested windows inside the
        #: buffer, which is what the zero-padding guarantees elsewhere
        self.PAD_FRAMES = int(capacity)
        assert capacity >= 2 * push_frames

    def total_frames(self):
        return None

    def init_state(self):
        import jax.numpy as jnp

        from ..core.types import float_dtype

        return {
            "buf": jnp.zeros((self.spec.channels, self.capacity),
                             dtype=float_dtype()),
            "base": jnp.zeros((), jnp.int32),
            "level": jnp.zeros((), jnp.int32),
            "overflow": jnp.asarray(False),
            "underflow": jnp.asarray(False),
            "ended": jnp.asarray(False),
        }

    def push(self, state, block, count, retire=0):
        """Drop ``retire`` frames from the front (consumed for good),
        then append ``count`` valid frames of ``block`` [C, push_frames]."""
        import jax
        import jax.numpy as jnp

        retire = jnp.asarray(retire, jnp.int32)
        # shift-left by a TRACED amount via pad + dynamic_slice: a dense
        # copy, never a gather (jnp.roll with a traced shift lowers to a
        # TPU gather — catastrophically slow on wide buffers)
        C = self.spec.channels
        ext = jnp.concatenate(
            [state["buf"],
             jnp.zeros((C, self.push_frames), state["buf"].dtype)], axis=1
        )
        buf = jax.lax.dynamic_slice(
            ext, (jnp.int32(0), retire), (C, self.capacity)
        )
        base = state["base"] + retire
        level = state["level"] - retire
        buf = jax.lax.dynamic_update_slice(
            buf, block, (jnp.int32(0), level)
        )
        overflow = state["overflow"] | (
            level + self.push_frames > self.capacity
        ) | (retire > state["level"]) | (retire > self.push_frames)
        return {
            **state,
            "buf": buf,
            "base": base,
            "level": level + jnp.asarray(count, jnp.int32),
            "overflow": overflow,
        }

    def end(self, state):
        import jax.numpy as jnp

        return {**state, "ended": jnp.asarray(True)}

    # ---- RANDOM_ACCESS surface (resample.py matmul path) ----

    def access_window(self, state):
        """(origin, frames available from origin). While live, the
        stream is unbounded (2^31-ish) so downstream drain logic never
        fires; once ended, the true total is reported."""
        import jax.numpy as jnp

        total = state["base"] + state["level"]
        live = jnp.int32(2**30)
        return jnp.int32(0), jnp.where(state["ended"], total, live)

    def slice_frames(self, state, start, length: int):
        import jax.lax as lax
        import jax.numpy as jnp

        local = jnp.clip(start - state["base"], 0,
                         self.capacity - length)
        return lax.dynamic_slice(
            state["buf"], (jnp.int32(0), local.astype(jnp.int32)),
            (self.spec.channels, length),
        )

    def gather_frames(self, state, idx):
        import jax.numpy as jnp

        return jnp.take(state["buf"], idx - state["base"], axis=1,
                        mode="fill", fill_value=0)

    # ---- sequential pull surface (identity-rate consumers) ----

    def emit(self, state, n: int):
        import jax.numpy as jnp

        from ..core.node import clip_valid, mask_block

        out = state["buf"][:, :n]
        valid = jnp.where(
            state["ended"], clip_valid(state["level"], n), jnp.int32(n)
        )
        i = jnp.arange(n, dtype=jnp.int32)
        out = jnp.where(i[None, :] < state["level"], out, 0.0)
        out = mask_block(out, valid)
        buf = jnp.roll(state["buf"], -n, axis=1)
        level = jnp.maximum(state["level"] - n, 0)
        # a live pull past the buffered level substitutes zeros — flag
        # it (symmetric with ``overflow``) so hosts/tests can observe
        # underruns instead of hearing silent dropouts
        underflow = state["underflow"] | (
            ~state["ended"] & (state["level"] < n)
        )
        return {**state, "buf": buf, "base": state["base"] + n,
                "level": level, "underflow": underflow}, out, valid


class StreamingDecoder(StreamingFeed):
    """Incremental decode of ANY supported format at O(packet) memory —
    the streaming counterpart of :class:`rodio_tpu.io.decoder.Decoder`
    (whole-file ingest). WAV streams through the native RIFF reader;
    every compressed format (flac/mp3/ogg/opus/m4a/...) streams through
    the re-entrant ffmpeg shim (native/ffdec.cpp rtpu_ffs_*), the
    incremental analog of the reference's packet loop
    (src/decoder/symphonia.rs:336-417).

    ``start_at``/``loop``: SAMPLE-ACCURATE seek before the first chunk
    (demuxer-coarse + decode-skip refinement, the reference's
    src/decoder/symphonia.rs:225-330 — byte-exact for WAV) and restart
    at end-of-stream, for long-running farm sources.
    """

    def __init__(self, path: str, *, chunk_frames: int = 8192,
                 buffer_seconds: float = 0.5, start_at: float = 0.0,
                 loop: bool = False):
        import os

        ext = os.path.splitext(str(path))[1].lower()
        if ext in (".wav", ".wave"):
            spec = wav_stream_spec(path)
            start_frames = int(round(start_at * spec.sample_rate))
            if not (start_at or loop):
                producer = _wav_stream_chunks(path, chunk_frames)
            else:
                def producer_gen():
                    first = start_frames
                    while True:
                        yielded = False
                        for blk in _wav_stream_chunks(
                                path, chunk_frames, start_frames=first):
                            yielded = True
                            yield blk
                        if not loop or (not yielded and first == 0):
                            return
                        first = 0

                producer = producer_gen()
        else:
            from .native import FfStream
            from .uniform_host import SpanUniformStream

            # chained containers (multi-link ogg) re-bootstrap to the
            # first link's spec at every span boundary, the reference's
            # UniformSourceIterator-over-spans behavior
            # (src/source/span.rs:66-101)
            stream = SpanUniformStream(FfStream(path))
            spec = StreamSpec(stream.channels, stream.sample_rate)
            if start_at:
                stream.seek_accurate(start_at)

            def producer_gen():
                s = stream
                while True:
                    blk = s.read(chunk_frames)
                    if blk.shape[1] == 0:
                        if not loop:
                            s.close()
                            return
                        s.seek(0.0)
                        continue
                    yield blk

            producer = producer_gen()
        super().__init__(producer, spec, buffer_seconds=buffer_seconds)


class DeviceFeeder:
    """Double-buffered host->device block feed.

    Wraps a host-driven source; ``next_device_block`` returns the jnp block
    for step k while the transfer for k+1 is already in flight (jax
    device_put is async) — the analog of the reference's ~100 ms transfer
    buffer overlapping the audio callback.
    """

    def __init__(self, host_source, block_frames: int):
        self.source = host_source
        self.block_frames = block_frames
        self._pending = None
        self._alive = True
        self._prefetch()

    def _prefetch(self):
        import jax

        if not self._alive:
            self._pending = None
            return
        block, alive = self.source.next_block(self.block_frames)
        self._alive = alive
        self._pending = jax.device_put(block) if alive else None

    def next_device_block(self):
        """-> (jnp block [C, T], alive). The next transfer starts before
        this one is consumed."""
        current = self._pending
        if current is None:
            import jax.numpy as jnp

            c = self.source.spec.channels
            return jnp.zeros((c, self.block_frames)), False
        self._prefetch()
        return current, True
