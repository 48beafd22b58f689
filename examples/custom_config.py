"""Custom device configuration (examples/custom_config.rs equivalent):
the prefer_* negotiation ladder of the sink builder (reference
src/speakers/builder.rs:305-527) with the fallback chain visible."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

from rodio_tpu.io import DeviceSinkBuilder
from rodio_tpu.sources import SineWave


def main():
    sink = (
        DeviceSinkBuilder()
        .prefer_channels(2)
        .prefer_sample_rate(44100)       # negotiation: 44.1k preferred
        .prefer_buffer_duration(0.025)   # 25 ms buffer -> pow2 frames
        .open()
    )
    cfg = sink.config
    print(f"negotiated: {cfg.channels} ch @ {cfg.sample_rate} Hz, "
          f"buffer {cfg.buffer_frames} frames "
          f"({1000.0 * cfg.buffer_frames / cfg.sample_rate:.1f} ms)")

    from rodio_tpu.io import play

    play(sink, SineWave(440.0).amplify(0.2).take_duration(0.2))
    sink.render_blocks(6)
    sink.close()
    print("played a beep through the custom-config sink")


if __name__ == "__main__":
    main()
