"""Command-line surface: ``python -m rodio_tpu <cmd>``.

The reference crate ships binaries only as examples; this CLI wraps the
same golden paths (decode -> chain -> sink / wav) for quick field use:

  python -m rodio_tpu play FILE [--seconds S] [--volume V] [--speed R]
  python -m rodio_tpu render FILE OUT.wav [--rate HZ] [--low-pass HZ]
      [--agc] [--limit] [--seconds S]
  python -m rodio_tpu probe FILE            # format/duration report
  python -m rodio_tpu devices               # L0 backend availability

Runs on the local backend by default; RODIO_TPU_PLATFORM=axon targets
the chip.
"""
from __future__ import annotations

import argparse
import os
import sys


def _select_platform():
    from rodio_tpu.utils.platform import select_platform

    select_platform(os.environ.get("RODIO_TPU_PLATFORM", "cpu"))


def _build_chain(args):
    from rodio_tpu.io.decoder import Decoder

    node = Decoder(args.file)
    if getattr(args, "seconds", None):
        node = node.take_duration(args.seconds)
    return node


def cmd_play(args) -> int:
    _select_platform()
    from rodio_tpu.io.device import DeviceSinkBuilder, play

    sink = DeviceSinkBuilder().prefer_buffer_duration(0.05).open()
    player = play(sink, _build_chain(args))
    if args.volume != 1.0:
        player.set_volume(args.volume)
    if args.speed != 1.0:
        player.set_speed(args.speed)
    try:
        sink.start()
        while not player.empty():
            import time

            time.sleep(0.1)
    except KeyboardInterrupt:
        pass
    finally:
        sink.close()
    return 0


def cmd_render(args) -> int:
    _select_platform()
    from rodio_tpu.conversions.resample import Resample
    from rodio_tpu.effects.agc import AgcSettings, AutomaticGainControl
    from rodio_tpu.effects.blt import BltFilter
    from rodio_tpu.effects.limit import Limit, LimitSettings
    from rodio_tpu.io.wav import wav_to_file

    node = _build_chain(args)
    if args.rate and args.rate != node.spec.sample_rate:
        node = Resample(node, args.rate)
    if args.low_pass:
        node = BltFilter(node, "low_pass", args.low_pass, 0.5, mode="auto")
    if args.agc:
        node = AutomaticGainControl(node, AgcSettings(), mode="exact")
    if args.limit:
        node = Limit(node, LimitSettings(), mode="auto")
    wav_to_file(node, args.out)
    print(f"wrote {args.out}")
    return 0


def cmd_probe(args) -> int:
    _select_platform()
    from rodio_tpu.io.decoder import Decoder

    node = Decoder(args.file)
    spec = node.spec
    frames = node.total_frames()
    dur = frames / spec.sample_rate if frames is not None else None
    print(f"file:      {args.file}")
    print(f"channels:  {spec.channels}")
    print(f"rate:      {spec.sample_rate} Hz")
    print(f"frames:    {frames if frames is not None else 'unknown'}")
    if dur is not None:
        print(f"duration:  {dur:.6f} s")
    return 0


def cmd_devices(_args) -> int:
    _select_platform()
    rows = []
    for name, probe in (
        ("alsa", "rodio_tpu.io.alsa"),
        ("pulse", "rodio_tpu.io.pulse"),
    ):
        try:
            mod = __import__(probe, fromlist=["available"])
            ok = bool(mod.available())
        except Exception:
            ok = False
        rows.append((name, ok))
    rows.append(("null/file/callback", True))
    for name, ok in rows:
        print(f"{name:20s} {'available' if ok else 'unavailable'}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rodio_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("play", help="decode FILE and play to the OS sink")
    p.add_argument("file")
    p.add_argument("--seconds", type=float, default=None)
    p.add_argument("--volume", type=float, default=1.0)
    p.add_argument("--speed", type=float, default=1.0)
    p.set_defaults(fn=cmd_play)

    p = sub.add_parser("render", help="decode FILE through an effects "
                                      "chain to OUT.wav (offline)")
    p.add_argument("file")
    p.add_argument("out")
    p.add_argument("--rate", type=int, default=None)
    p.add_argument("--low-pass", type=float, default=None, dest="low_pass")
    p.add_argument("--agc", action="store_true")
    p.add_argument("--limit", action="store_true")
    p.add_argument("--seconds", type=float, default=None)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("probe", help="print FILE's decoded format")
    p.add_argument("file")
    p.set_defaults(fn=cmd_probe)

    p = sub.add_parser("devices", help="report L0 output backends")
    p.set_defaults(fn=cmd_devices)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
