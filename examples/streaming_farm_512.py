#!/usr/bin/env python
"""512-stream CONSTANT-MEMORY farm: incremental host decode of compressed
files overlapping device DSP (the unbounded-duration counterpart of
examples/stream_farm.py, which pre-decodes to HBM).

Each stream is its own re-entrant ffmpeg decode handle (O(packet) memory,
the analog of rodio's per-source symphonia packet loop) over the
compressed asset corpus, staggered to distinct start offsets and looped,
so the farm can run for HOURS at the same footprint:

  512 x FfStream -> worker pool -> host FIFOs -> PushPort (device FIFO)
     -> 44.1->48k resample (ring) -> low-pass biquad -> per-stream gain
     -> 512-way mix -> master limiter

Usage:  python examples/streaming_farm_512.py [seconds] [n_streams]

Prints aggregate realtime multiple, host RSS and device HBM in use.
The farm's own memory is constant (bounded FIFOs both sides). NOTE: on
the axon-tunnel machine this was built on, host RSS still grows ~1 MB
per MB pushed — that is a transport defect (a bare device_put loop of
one reused 1 MB array leaks 1 MB/iteration there), not the farm.
"""
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = "/root/reference/assets"
CORPUS = ["music.flac", "music.mp3", "music.m4a"]  # 44.1 kHz stereo


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    block = 4096

    from rodio_tpu.parallel.farm import StreamFarm

    rng = np.random.default_rng(0)
    paths = [os.path.join(ASSETS, CORPUS[i % len(CORPUS)])
             for i in range(n_streams)]
    offsets = rng.uniform(0.0, 9.0, n_streams)
    gains = rng.uniform(0.5, 1.5, n_streams).astype(np.float32) / n_streams

    wire = os.environ.get("FARM_WIRE", "i16")  # thin axon tunnel: 48 MB/s
    farm = StreamFarm(paths, block_frames=block, gains=gains,
                      start_offsets=offsets, loop=True, wire=wire,
                      decode_workers=min(16, os.cpu_count() or 8))

    n_blocks = int(seconds * 48000 / block)
    t0 = time.perf_counter()
    stats = {"last": t0, "energy": 0.0}

    def on_block(k, out, valid):
        if (k + 1) % 100 == 0:
            now = time.perf_counter()
            rate = 100 * block * n_streams / 48000 / (now - stats["last"])
            stats["last"] = now
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            print(f"  block {k+1}/{n_blocks}: {rate:,.0f}x realtime "
                  f"(rolling), host RSS {rss:.2f} GB")

    valid, energy, overflow = farm.run(n_blocks, on_block=on_block)
    wall = time.perf_counter() - t0
    farm.close()

    audio_seconds = valid * n_streams / 48000
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    import jax

    mem = None
    try:
        ms = jax.local_devices()[0].memory_stats()
        mem = ms.get("bytes_in_use") or ms.get("peak_bytes_in_use")
    except Exception:
        pass
    print(f"rendered {valid} frames x {n_streams} streams "
          f"({audio_seconds:,.0f} stream-seconds) in {wall:.1f}s "
          f"= {audio_seconds / wall:,.0f}x aggregate realtime")
    print(f"overflow={overflow} energy={energy:.3g} "
          f"host RSS {rss:.2f} GB"
          + (f", device HBM in use {mem/1e9:.2f} GB" if mem else ""))
    assert not overflow and valid == n_blocks * block


if __name__ == "__main__":
    main()
