#!/usr/bin/env python
"""Micro-benchmarks mirroring the reference's divan suite
(/root/reference/benches/: effects.rs, resampler.rs, conversions.rs,
pipeline.rs). Input: first 10 s of assets/music.wav, pre-decoded.

Each case renders single-stream through the block engine and reports the
realtime multiple, using differential device-side timing (the scan-over-
blocks methodology of bench.py). Prints one JSON line per case plus a
summary; pass --json for machine output only.

Usage: python benches/micro.py [--json] [--cases effects,resampler,...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rodio_tpu.utils.platform import select_platform

select_platform(os.environ.get("RODIO_TPU_PLATFORM", "axon"))


def load_music(seconds=30.0):
    from rodio_tpu.io.wav import read_wav

    pcm, rate = read_wav("/root/reference/assets/music.wav")
    frames = int(seconds * rate)
    if pcm.shape[1] < frames:
        pcm = np.tile(pcm, (1, -(-frames // pcm.shape[1])))
    return pcm[:, :frames], rate


def time_node(node, T=4096, n1=20, n2=220, repeats=3):
    """Differential scan timing -> seconds per block (min over repeats to
    reject host/transport jitter)."""

    def mk(N):
        def body(s, _):
            s, out, v = node.emit(s, T)
            return s, jnp.sum(out * out)

        run = jax.jit(
            lambda s: jnp.sum(jax.lax.scan(body, s, None, length=N)[1])
        )
        state = node.init_state()
        float(run(state))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(state))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (mk(n2) - mk(n1)) / (n2 - n1)
    # the host<->device transport has ~ms-scale jitter; marginals below a
    # few microseconds per block are not resolvable — floor them so cheap
    # ops report an honest lower bound instead of noise
    return max(per, 2e-6)


def bench_cases(which):
    from rodio_tpu.effects import (
        AgcSettings,
        AutomaticGainControl,
        Limit,
        LimitSettings,
    )
    from rodio_tpu.effects.blt import BltFilter
    from rodio_tpu.sources.generators import SamplesBuffer

    pcm, rate = load_music()
    results = {}

    def src():
        return SamplesBuffer(2, rate, pcm)

    T = 4096

    if "effects" in which:
        # (benches/effects.rs:14-68)
        cases = {
            "amplify": lambda: src().amplify(0.8),
            "high_pass": lambda: BltFilter(
                src(), "high_pass", 200.0, 0.5, mode="pallas"
            ),
            "fade_out": lambda: src().fade_out(10.0),
            "reverb": lambda: src().reverb(0.05, 0.3),
            "agc_enabled": lambda: AutomaticGainControl(
                src(), AgcSettings(), mode="pallas"
            ),
            "agc_enabled_group8": lambda: AutomaticGainControl(
                src(), AgcSettings(), mode="pallas", group=8
            ),
            "limiter": lambda: Limit(
                src().amplify(2.0), LimitSettings(), mode="pallas"
            ),
        }
        for name, mk in cases.items():
            per = time_node(mk(), T)
            results[f"effects/{name}"] = (T / rate) / per

    if "resampler" in which:
        # (benches/resampler.rs:14-44)
        for to in (8000, 11025, 16000, 22050, 44100, 48000, 88200, 96000,
                   176400, 192000, 352800, 384000):
            per = time_node(src().resample(to), T)
            results[f"resampler/to_{to}"] = (T / to) / per

    if "conversions" in which:
        # (benches/conversions.rs:11-23) — host-side dtype casts
        from rodio_tpu.io.sample_convert import from_f32, to_f32

        x = pcm.reshape(-1)
        for dt, name in ((np.int16, "i16"), (np.uint16, "u16"),
                         (np.float32, "f32")):
            enc = from_f32(x, dt)
            t0 = time.perf_counter()
            for _ in range(10):
                y = to_f32(enc)
            per = (time.perf_counter() - t0) / 10
            results[f"conversions/{name}_to_f32"] = (len(x) / rate / 2) / per

    if "pipeline" in which:
        # (benches/pipeline.rs:15-48)
        short = src().amplify(0.8).low_pass(300.0)
        results["pipeline/short"] = (T / rate) / time_node(short, T)

        long_chain = (
            src()
            .high_pass(300.0)
            .amplify(1.2)
            .speed(1.1)
            .delay(0.01)
            .fade_in(2.0)
            .take_duration(9.0, fadeout=True)
            .reverb(0.05, 0.3)
            .uniform(2, 40000)
        )
        results["pipeline/long"] = (T / 40000) / time_node(long_chain, T)

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--cases", default="effects,resampler,conversions,pipeline"
    )
    args = ap.parse_args()
    which = set(args.cases.split(","))

    results = bench_cases(which)
    for name, mult in sorted(results.items()):
        line = {"bench": name, "value": round(mult, 1),
                "unit": "x realtime (single stream)"}
        if mult >= (4096 / 48000) / 2.5e-6:
            line["note"] = "lower bound (below timing resolution)"
        print(json.dumps(line))
    if not args.json:
        worst = min(results.values()) if results else 0
        print(f"# {len(results)} cases, worst {worst:.0f}x realtime",
              file=sys.stderr)


if __name__ == "__main__":
    main()
