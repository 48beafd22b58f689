"""Streaming stream-farm: N distinct compressed files -> incremental host
decode -> device-resident FIFO -> wide-channel DSP, at CONSTANT memory.

The whole-file ingest path (io/decoder.Decoder) holds the decoded PCM in
HBM — ideal up to minutes, impossible for a 512-stream farm of hour-long
files (~1.3 GB/hour/stream). This module is the unbounded counterpart:

  [host]  N x FfStream (re-entrant ffmpeg packet loop, O(packet) memory)
            -> worker pool refills per-stream FIFOs
            -> assembler packs [N*C, push_frames] wide blocks
  [device] PushPort (fixed-capacity FIFO, jit-side)
            -> Resample(ring) -> BltFilter -> Amplify -> WideMixer -> Limit

Host decode of block k+1 overlaps device DSP of block k: the jitted step
dispatches asynchronously, so the Python thread returns to assembling
while the TPU works (the analog of the reference's audio callback pulling
while the app thread queues sources, src/stream.rs:536-548).

Memory: device = port capacity + DSP state (tens of MB, constant); host =
per-stream FIFO of ~2 chunks (constant). Nothing scales with duration.
"""
from __future__ import annotations

import collections
import threading
from typing import List, Optional, Sequence

import numpy as np

from ..core.types import StreamSpec
from ..io.uniform_host import _UniformStream, _rechannel_np  # noqa: F401


def _find_state_with(state, keys):
    """Walk the nested node states (via 'in' links) to the innermost
    dict holding all of ``keys``; returns the key path."""
    path = []
    cur = state
    while isinstance(cur, dict):
        if all(k in cur for k in keys):
            return path
        if "in" not in cur:
            break
        path.append("in")
        cur = cur["in"]
    raise KeyError(f"state with keys {keys} not found in the chain state")


def _find_port_state(state):
    """Path to the PushPort's dict (the FIFO keys)."""
    return _find_state_with(state, ("buf", "level", "overflow"))


def _get_path(state, path):
    for k in path:
        state = state[k]
    return state


def _set_path(state, path, value):
    if not path:
        return value
    return {**state, path[0]: _set_path(state[path[0]], path[1:], value)}


def _wire_encode(block: np.ndarray, wire: str) -> np.ndarray:
    """Host-side wire encode (see the wire-format notes on StreamFarm)."""
    if wire == "i16":
        return np.clip(block * 32768.0, -32768, 32767).astype(np.int16)
    if wire == "i24":
        q = np.clip(np.rint(block * 8388608.0), -8388608,
                    8388607).astype("<i4")
        return np.ascontiguousarray(
            q.view(np.uint8).reshape(*q.shape, 4)[..., :3]
        )
    return block


def _wire_decode(block, wire):
    """Device-side wire decode (inside the push jits): uint8-packed wire
    formats back to f32. i24 is little-endian 3-byte two's-complement."""
    import jax.numpy as jnp

    if wire == "i16":
        return block.astype(jnp.float32) * (1.0 / 32768.0)
    if wire == "i24":
        v = (block[..., 0].astype(jnp.int32)
             | (block[..., 1].astype(jnp.int32) << 8)
             | (block[..., 2].astype(jnp.int32) << 16))
        v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
        return v.astype(jnp.float32) * (1.0 / 8388608.0)
    return block


class HostDecodePool:
    """N compressed files -> per-stream host FIFOs refilled by a worker
    pool, with accurate per-stream seek — the HOST half of the farm,
    factored out so :class:`StreamFarm` (single device) and the sharded
    farm (:mod:`rodio_tpu.parallel.sharded_farm`) share one decode/feed
    engine. All files must share (channels, sample_rate); heterogeneous
    corpora uniformize per stream at ingest (the reference runs every
    queued source through a UniformSourceIterator,
    src/source/uniform.rs:33)."""

    def __init__(self, paths: Sequence[str], *, out_rate: int,
                 chunk_frames: int = 8192, decode_workers: int = 8,
                 start_offsets: Optional[Sequence[float]] = None,
                 loop: bool = True):
        from ..io.native import FfStream
        from ..io.uniform_host import SpanUniformStream

        self.paths = list(paths)
        S = len(self.paths)
        self._streams: List[FfStream] = []
        for i, p in enumerate(self.paths):
            # SpanUniformStream pins chained containers to their first
            # link's spec (span re-bootstrap at every boundary)
            s = SpanUniformStream(FfStream(p))
            if start_offsets is not None and start_offsets[i]:
                s.seek_accurate(start_offsets[i])
            self._streams.append(s)
        specs = {(s.channels, s.sample_rate) for s in self._streams}
        if len(specs) != 1:
            # each stream is host-lerp-resampled ONCE straight to the
            # farm's output rate and positionally rechanneled, so the
            # device chain runs identity-rate and the per-stream math
            # matches a per-stream engine Uniform chain
            C = max(c for c, _ in specs)
            self._streams = [
                _UniformStream(s, C, out_rate)
                if (s.channels, s.sample_rate) != (C, out_rate) else s
                for s in self._streams
            ]
            in_rate = out_rate
        else:
            C, in_rate = (self._streams[0].channels,
                          self._streams[0].sample_rate)
        self.spec_in = StreamSpec(C, in_rate)
        self.n_streams = S
        self.loop = loop
        self.chunk_frames = chunk_frames

        self._fifos = [collections.deque() for _ in range(S)]
        self._fifo_frames = [0] * S
        self._fifo_lock = threading.Condition()
        self._alive = [True] * S
        self._inflight = set()
        import concurrent.futures as cf

        self._pool = cf.ThreadPoolExecutor(max_workers=decode_workers)

    def _refill_one(self, i: int):
        # any decode/seek error marks the stream dead (the reference
        # skips decode errors, src/decoder/symphonia.rs:366-372; a farm
        # stream that cannot produce more frames simply ends) — and the
        # finally ALWAYS clears the in-flight mark, or _pop_frames would
        # wait forever on a stream whose refill died
        blk = None
        try:
            s = self._streams[i]
            blk = s.read(self.chunk_frames)
            if blk.shape[1] < self.chunk_frames and self.loop:
                parts = [blk]
                got = blk.shape[1]
                while got < self.chunk_frames:
                    s.seek(0.0)
                    more = s.read(self.chunk_frames - got)
                    if more.shape[1] == 0:
                        break
                    parts.append(more)
                    got += more.shape[1]
                blk = np.concatenate(parts, axis=1)
        except Exception:
            import logging

            logging.getLogger("rodio_tpu.farm").warning(
                "stream %d refill failed; marking it ended", i,
                exc_info=True,
            )
        finally:
            with self._fifo_lock:
                if blk is not None and blk.shape[1]:
                    self._fifos[i].append(blk)
                    self._fifo_frames[i] += blk.shape[1]
                else:
                    self._alive[i] = False
                self._inflight.discard(i)
                self._fifo_lock.notify_all()

    def schedule_refills(self, threshold: int):
        with self._fifo_lock:
            todo = [
                i for i in range(self.n_streams)
                if self._alive[i] and i not in self._inflight
                and self._fifo_frames[i] < threshold
            ]
            self._inflight.update(todo)
        for i in todo:
            self._pool.submit(self._refill_one, i)

    def _pop_frames(self, i: int, n: int) -> np.ndarray:
        """Pop exactly n frames from stream i's FIFO, BLOCKING while a
        live stream's refill is in flight (host backpressure — the feed
        never silently substitutes silence for late decode). Exhausted
        streams pad with zeros (the stream has truly ended)."""
        parts = []
        got = 0
        with self._fifo_lock:
            while got < n:
                while (self._fifo_frames[i] == 0 and self._alive[i]):
                    if i not in self._inflight:
                        self._inflight.add(i)
                        self._pool.submit(self._refill_one, i)
                    self._fifo_lock.wait(timeout=10.0)
                if self._fifo_frames[i] == 0:
                    break  # stream ended
                blk = self._fifos[i][0]
                take = min(n - got, blk.shape[1])
                parts.append(blk[:, :take])
                if take == blk.shape[1]:
                    self._fifos[i].popleft()
                else:
                    self._fifos[i][0] = blk[:, take:]
                self._fifo_frames[i] -= take
                got += take
        if got < n:
            parts.append(
                np.zeros((self.spec_in.channels, n - got), np.float32)
            )
        return np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def prime(self):
        """Synchronously fill the host FIFOs before the first step."""
        import concurrent.futures as cf

        with self._fifo_lock:
            todo = [i for i in range(self.n_streams)
                    if i not in self._inflight]
            self._inflight.update(todo)
        cf.wait([self._pool.submit(self._refill_one, i) for i in todo])

    def assemble_frames(self, n: int) -> np.ndarray:
        """[S*C, n] wide block from the per-stream FIFOs (stream-major
        rows, so a shard's streams are a contiguous row range)."""
        out = np.empty((self.n_streams * self.spec_in.channels, n),
                       np.float32)
        C = self.spec_in.channels
        for i in range(self.n_streams):
            out[i * C : (i + 1) * C] = self._pop_frames(i, n)
        return out

    def try_seek(self, stream: int, seconds: float) -> int:
        """SAMPLE-ACCURATE live seek of one farm stream — the farm-scale
        analog of the reference's try_seek on a playing source
        (src/source/mod.rs try_seek; refine semantics
        src/decoder/symphonia.rs:225-330). Drops the stream's host FIFO
        and repositions its decoder exactly; frames already pushed to
        the device window (~1-2 blocks) play out first, exactly like the
        reference's cpal transfer buffer draining after a seek. Returns
        the frame index reached. A failed seek marks the stream ended
        (SeekError semantics: the rest of the farm is intact)."""
        with self._fifo_lock:
            while stream in self._inflight:
                self._fifo_lock.wait(timeout=10.0)
            self._inflight.add(stream)  # block refills during the seek
            self._fifos[stream].clear()
            self._fifo_frames[stream] = 0
        got = -1
        ok = False
        try:
            s = self._streams[stream]
            if hasattr(s, "seek_accurate"):
                got = s.seek_accurate(seconds)
            else:
                s.seek(seconds)
                got = int(round(seconds * self.spec_in.sample_rate))
            ok = True
        except Exception:
            import logging

            logging.getLogger("rodio_tpu.farm").warning(
                "stream %d seek(%s) failed; marking it ended",
                stream, seconds, exc_info=True,
            )
        finally:
            with self._fifo_lock:
                self._inflight.discard(stream)
                self._alive[stream] = ok
                self._fifo_lock.notify_all()
        return got

    def close(self):
        self._pool.shutdown(wait=False)
        for s in self._streams:
            s.close()


class StreamFarm:
    """N file paths -> one mixed stereo output via streaming decode.

    All files must share (channels, sample_rate). ``start_offsets``
    staggers each stream's start (sample-accurate seek); ``loop``
    restarts streams at EOF so the farm runs indefinitely.
    """

    def __init__(self, paths: Sequence[str], *, out_rate: int = 48000,
                 block_frames: int = 4096, gains=None,
                 low_pass: Optional[float] = 2000.0,
                 start_offsets: Optional[Sequence[float]] = None,
                 loop: bool = True, chunk_frames: int = 8192,
                 decode_workers: int = 8, wire: str = "f32",
                 fused: bool = False):
        self._host = HostDecodePool(
            paths, out_rate=out_rate, chunk_frames=chunk_frames,
            decode_workers=decode_workers, start_offsets=start_offsets,
            loop=loop,
        )
        self.paths = self._host.paths
        self._streams = self._host._streams
        self.spec_in = self._host.spec_in
        C, in_rate = self.spec_in.channels, self.spec_in.sample_rate
        S = self._host.n_streams
        self.n_streams = S
        self.loop = loop
        self.chunk_frames = chunk_frames
        self.block_frames = block_frames

        # device chain: port -> resample -> low_pass -> gain -> mix -> limit
        from ..conversions.resample import Resample
        from ..effects.basic import Amplify
        from ..effects.blt import BltFilter
        from ..effects.limit import Limit, LimitSettings
        from ..io.streaming import PushPort
        from ..parallel.batch import WideMixer

        # per-block input demand; the port window must cover the matmul
        # resampler's chunk window (resample.py:_emit_matmul: K = n//to+2
        # chunks of `fr` frames + 1 boundary frame per emitted block)
        fr_gcd = np.gcd(in_rate, out_rate)
        fr, to = in_rate // fr_gcd, out_rate // fr_gcd
        self._fr, self._to = int(fr), int(to)
        if fr != to:
            self._push = (block_frames // to + 2) * fr + 1
            capacity = self._push + (block_frames // to + 4) * fr
        else:
            self._push = block_frames
            capacity = 4 * block_frames
        #: host->device wire format: "f32" (bit-exact), "i16" (half the
        #: transfer — EXACT for 16-bit-sourced content like CD flac, ~-90dB
        #: quantization otherwise), or "i24" (3 bytes/sample — EXACT for
        #: 16- AND 24-bit-sourced content, ~-138dB quantization otherwise;
        #: the fidelity/bandwidth middle ground for thin host links)
        assert wire in ("f32", "i16", "i24")
        self.wire = wire
        if gains is None:
            gains = np.full(S, 1.0 / S, np.float32)
        gains = np.asarray(gains, np.float32)
        per_lane = np.repeat(gains, C) if gains.shape == (S,) else gains
        self.fused = bool(fused)
        if fused:
            # fused device path (VERDICT r2 #3): host blocks push whole
            # CHUNKS into a rolling device ring and the constant-memory
            # farm runs the flagship mega-kernel instead of the unfused
            # chain. Per-stream gains fold into the PCM at push (linear
            # stages commute with a per-lane scalar).
            from ..flagship import ChunkRingFeed, FusedFarmPipeline
            from ..ops.fused import LANES

            m = 2
            assert fr != to and to >= 2, (
                "fused farm needs a non-identity rational rate ratio"
            )
            assert block_frames % (m * to) == 0, (
                f"fused farm block must be a multiple of {m * to}"
            )
            assert S * C <= LANES
            self._Kp = block_frames // to
            # i16 wire: the device-decoded samples are k/2^15, whose
            # two-bf16-piece split is EXACT — the ring keeps them raw
            # (gains ride the kernel's scale pass) and drops to the
            # lossless-there int2 layout: 2/3 the ring HBM traffic and a
            # cheaper push jit. Other wires keep the 24-bit int3 pieces.
            lossless_int2 = wire == "i16"
            self.feed = ChunkRingFeed(
                S * C, in_rate, fr, self._Kp, 4 * self._Kp,
                "int2" if lossless_int2 else "int3",
                per_lane, gain_post=lossless_int2,
            )
            self._push = self._Kp * fr
            self.port = None
            pipe = FusedFarmPipeline(
                self.feed, out_rate, S,
                "low_pass" if low_pass is not None else None,
                low_pass if low_pass is not None else 2000.0, 0.5, m=m,
            )
            self.master = Limit(pipe, LimitSettings(), mode="auto")
        else:
            self.port = PushPort(S * C, in_rate, capacity, self._push)
            chain = self.port
            chain = Resample(chain, out_rate, max_block=block_frames)
            if low_pass is not None:
                chain = BltFilter(chain, "low_pass", low_pass, 0.5)
            chain = Amplify(chain, per_lane)
            chain = WideMixer(chain, S)
            self.master = Limit(chain, LimitSettings(), mode="auto")

        self._port_path = None

    # ---- host decode side (delegated to HostDecodePool) ----

    def _schedule_refills(self, threshold: int):
        self._host.schedule_refills(threshold)

    def _pop_frames(self, i: int, n: int) -> np.ndarray:
        return self._host._pop_frames(i, n)

    def try_seek(self, stream: int, seconds: float) -> int:
        """See :meth:`HostDecodePool.try_seek` (sample-accurate live
        seek of one farm stream)."""
        return self._host.try_seek(stream, seconds)

    def assemble_push_block(self) -> np.ndarray:
        """[S*C, push_frames] wide block from the per-stream FIFOs."""
        return self._host.assemble_frames(self._push)

    def prime(self, blocks: int = 2):
        """Synchronously fill the host FIFOs before the first step."""
        self._host.prime()

    # ---- device side ----

    def init_state(self):
        state = self.master.init_state()
        if self.fused:
            self._port_path = _find_state_with(
                state, ("chunks", "carry", "w")
            )
        else:
            self._port_path = _find_port_state(state)
        return state

    def make_step(self):
        import jax

        port, master, path = self.port, self.master, self._port_path
        n = self.block_frames

        import jax.numpy as jnp

        wire = self.wire

        @jax.jit
        def step(state, block, count, retire):
            block = _wire_decode(block, wire)
            ps = _get_path(state, path)
            ps = port.push(ps, block, count, retire)
            state = _set_path(state, path, ps)
            return master.emit(state, n)

        return step

    def make_push(self):
        import jax
        import jax.numpy as jnp

        port, path = self.port, self._port_path
        wire = self.wire

        @jax.jit
        def push_only(state, block, count, retire):
            block = _wire_decode(block, wire)
            ps = _get_path(state, path)
            ps = port.push(ps, block, count, retire)
            return _set_path(state, path, ps)

        return push_only

    def _encode(self, block: np.ndarray) -> np.ndarray:
        return _wire_encode(block, self.wire)

    def _in_left(self, o: int) -> int:
        """Input frame index feeding output frame o (the resampler's
        closed form, conversions/resample.py:_left_num)."""
        fr, to = self._fr, self._to
        if fr == to:
            return o
        return (o // to) * fr + (fr * (o % to)) // to

    # ---- fused device path ----

    def _make_fused_jits(self):
        import jax

        feed, master, path = self.feed, self.master, self._port_path
        n = self.block_frames

        wire = self.wire

        @jax.jit
        def prime_push(state, block):
            fs = _get_path(state, path)
            fs = feed.push(fs, _wire_decode(block, wire), prime=True)
            return _set_path(state, path, fs)

        @jax.jit
        def step(state, block):
            fs = _get_path(state, path)
            fs = feed.push(fs, _wire_decode(block, wire))
            state = _set_path(state, path, fs)
            return master.emit(state, n)

        return prime_push, step

    def _assemble_frames(self, n: int) -> np.ndarray:
        return self._host.assemble_frames(n)

    def _run_fused(self, n_blocks: int, on_block):
        """Fused device path: every host block pushes exactly Kp chunks
        into the rolling device ring; the mega-kernel consumes them with
        modulo indexing — no retire bookkeeping (old chunks are simply
        overwritten Kp-aligned)."""
        import jax
        import jax.numpy as jnp

        self.prime()
        state = self.init_state()
        prime_push, step = self._make_fused_jits()
        fr = self._fr
        # prime: (Kp+1)*fr frames complete chunks 0..Kp-1 and seed the
        # carried boundary tail
        state = prime_push(
            state, jax.device_put(self._encode(self._assemble_frames(
                (self._Kp + 1) * fr
            )))
        )
        dev_block = jax.device_put(
            self._encode(self._assemble_frames(self._push))
        )
        energy_acc = jnp.zeros(())
        valid_acc = jnp.zeros((), jnp.int32)
        for k in range(n_blocks):
            self._schedule_refills(threshold=2 * self._push)
            state, out, valid = step(state, dev_block)
            if k + 1 < n_blocks:
                dev_block = jax.device_put(
                    self._encode(self._assemble_frames(self._push))
                )
            if on_block is not None:
                on_block(k, out, valid)
            valid_acc = valid_acc + valid
            energy_acc = energy_acc + jnp.sum(out * out)
            if (k + 1) % 32 == 0:
                int(valid_acc)
        total_valid = int(valid_acc)
        energy = float(energy_acc)
        overflow = bool(_get_path(state, self._port_path)["overflow"])
        self._final_state = state
        return total_valid, energy, overflow

    def run(self, n_blocks: int, *, on_block=None):
        """Drive n_blocks; returns (total_valid_frames, energy, overflow).

        Host assembly of block k+1 overlaps the (async) device step k.
        The push count per block follows the resampler's closed-form
        consumption so the device FIFO level stays bounded for ANY run
        length (pulls lag pushes by at most one pull chunk + margin).
        """
        import jax.numpy as jnp

        if self.fused:
            return self._run_fused(n_blocks, on_block)

        self.prime()
        state = self.init_state()
        step = self.make_step()
        push_only = self.make_push()
        pushed_total = 0
        base = 0  # host mirror of the port's window base (deterministic)
        # prime the device window up to block 0's demand horizon:
        # a single per-block push (<= _push frames) can then keep pace
        import jax

        while pushed_total < self._want_total(0):
            block, count = self._next_push(0, pushed_total)
            pushed_total += count
            state = push_only(state, self._encode(block), count, 0)
        block, count = self._next_push(1, pushed_total)
        pushed_total += count
        dev_block = jax.device_put(self._encode(block))  # async transfer
        retire = 0
        energy_acc = jnp.zeros(())
        valid_acc = jnp.zeros((), jnp.int32)
        for k in range(n_blocks):
            self._schedule_refills(threshold=2 * self._push)
            state, out, valid = step(state, dev_block, count, retire)
            # assemble + start transferring the NEXT host block while the
            # device works (nothing below syncs unless on_block is set)
            if k + 1 < n_blocks:
                block, count = self._next_push(k + 2, pushed_total)
                pushed_total += count
                dev_block = jax.device_put(self._encode(block))
                # frames below block k+1's window start are consumed
                # (identity rate: port.emit retires by itself)
                if self._fr != self._to:
                    retire = max(self._low_water(k + 1) - base, 0)
                    base += retire
            if on_block is not None:
                on_block(k, out, valid)
            valid_acc = valid_acc + valid
            energy_acc = energy_acc + jnp.sum(out * out)
            if (k + 1) % 32 == 0:
                # bound the async dispatch queue (the tunnel transport
                # otherwise accepts unbounded in-flight work): one scalar
                # readback forces the pipeline to drain to this point
                int(valid_acc)
        total_valid = int(valid_acc)  # single end-of-run sync
        energy = float(energy_acc)
        overflow = bool(_get_path(state, self._port_path)["overflow"])
        self._final_state = state
        return total_valid, energy, overflow

    def _want_total(self, k: int) -> int:
        """Cumulative feed target before emitting block k: the matmul
        resampler's input window end for that block (K chunks + the
        boundary frame, resample.py:_emit_matmul)."""
        n = self.block_frames
        fr, to = self._fr, self._to
        if fr == to:
            return (k + 1) * n
        return (k * n // to + n // to + 2) * fr + 1

    def _low_water(self, k: int) -> int:
        """First input frame block k's window can still touch."""
        if self._fr == self._to:
            return k * self.block_frames
        return (k * self.block_frames // self._to) * self._fr

    def _next_push(self, k: int, pushed_total: int):
        """Assemble the push accompanying block k's step: enough frames
        that the cumulative feed covers the NEXT block's pull horizon."""
        count = min(max(self._want_total(k) - pushed_total, 0), self._push)
        out = np.zeros(
            (self.n_streams * self.spec_in.channels, self._push),
            np.float32,
        )
        C = self.spec_in.channels
        if count:
            for i in range(self.n_streams):
                out[i * C : (i + 1) * C, :count] = self._pop_frames(i, count)
        return out, count

    def close(self):
        self._host.close()
