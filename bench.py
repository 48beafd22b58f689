#!/usr/bin/env python
"""Headline benchmark: aggregate realtime multiple for the 512-stream
batched pipeline (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 1000 (the BASELINE target is >= 1000x realtime for
512 concurrent 48 kHz stereo streams through resample+mix+effects+limit on
one chip).
"""
import json
import os
import sys
import time

import jax
import numpy as np


def main():
    n_streams = int(os.environ.get("BENCH_STREAMS", "512"))
    block = int(os.environ.get("BENCH_BLOCK", "4096"))
    seconds = float(os.environ.get("BENCH_SECONDS", "4.0"))
    scan_mode = os.environ.get("BENCH_SCAN_MODE", "exact")

    from rodio_tpu.flagship import make_flagship
    from rodio_tpu.io.wav import read_wav

    pcm = None
    wav_path = "/root/reference/assets/music.wav"
    if os.path.exists(wav_path):
        try:
            pcm, _rate = read_wav(wav_path)
        except Exception:
            pcm = None

    node, state = make_flagship(
        n_streams, seconds=seconds, scan_mode=scan_mode, source_pcm=pcm,
        max_block=block,
    )

    @jax.jit
    def step(s):
        return node.emit(s, block)

    # warmup + compile
    state2, out, valid = step(state)
    out.block_until_ready()

    # timed steady-state loop
    n_blocks = max(4, int(seconds * 48000 / block) - 1)
    t0 = time.perf_counter()
    s = state2
    for _ in range(n_blocks):
        s, out, valid = step(s)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_seconds = n_streams * n_blocks * block / 48000.0
    realtime_multiple = audio_seconds / dt

    print(json.dumps({
        "metric": (
            "Audio-seconds/sec/chip (realtime multiple), "
            f"{n_streams}-stream mix+effects @48kHz stereo"
        ),
        "value": round(realtime_multiple, 1),
        "unit": "x realtime (aggregate)",
        "vs_baseline": round(realtime_multiple / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
