"""Callback when a sound finishes (examples/callback_on_end.rs
equivalent): Player.append(on_done=...) is the Done-wrapper analog
(reference src/source/done.rs)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

from rodio_tpu.control.player import Player
from rodio_tpu.io import DeviceSinkBuilder
from rodio_tpu.sources import SineWave


def main():
    sink = DeviceSinkBuilder().open()
    player = Player.connect_new(sink.mixer())

    fired = []
    player.append(
        SineWave(440.0).amplify(0.2).take_duration(0.15),
        on_done=lambda: fired.append("first beep done"),
    )
    player.append(
        SineWave(880.0).amplify(0.2).take_duration(0.15),
        on_done=lambda: fired.append("second beep done"),
    )

    player.sleep_until_end(max_blocks=400)
    sink.close()
    print("callbacks fired:", fired)
    assert fired == ["first beep done", "second beep done"]


if __name__ == "__main__":
    main()
