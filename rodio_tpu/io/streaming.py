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


def _wav_stream_chunks(path: str, chunk_frames: int) -> Iterator[np.ndarray]:
    """Yield [channels, chunk] f32 chunks from a WAV file incrementally."""
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
