"""Basic playback (examples/basic.rs equivalent): beep + decoded assets
through a device sink with pauses and volume changes."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

import time

from rodio_tpu.io import Decoder, DeviceSinkBuilder, play
from rodio_tpu.sources import SineWave


def main():
    sink = (
        DeviceSinkBuilder()
        .prefer_buffer_duration(0.050)
        .open()
    )
    player = play(sink, SineWave(440.0).amplify(0.2).take_duration(0.5))
    sink.render_blocks(8)  # drive synchronously (or .start() for a thread)

    player2 = play(sink, Decoder("/root/reference/assets/beep.wav")
                   .take_duration(0.5))
    player2.set_volume(0.5)
    sink.render_blocks(8)
    sink.close()
    print("played beep sequence")


if __name__ == "__main__":
    main()
