"""Spatial audio: an emitter orbiting the listener (examples/spatial.rs)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

import numpy as np

from rodio_tpu.control import mixer
from rodio_tpu.control.spatial_player import SpatialPlayer
from rodio_tpu.io import write_wav
from rodio_tpu.sources import SineWave


def main():
    tx, rx = mixer(2, 48000)
    player = SpatialPlayer.connect_new(
        tx, emitter_position=(2.0, 0.0, 0.0),
        left_ear=(-0.1, 0.0, 0.0), right_ear=(0.1, 0.0, 0.0),
        block_frames=480,  # reposition every 10 ms, like the reference
    )
    player.append(SineWave(220.0).amplify(0.4).take_duration(3.0))

    blocks = []
    n = 300
    for i in range(n):
        angle = 2 * np.pi * i / n * 2  # two full orbits
        player.set_emitter_position(
            (2.0 * np.cos(angle), 2.0 * np.sin(angle), 0.0)
        )
        block, alive = rx.next_block(480)
        blocks.append(block)
        if not alive:
            break
    out = np.concatenate(blocks, axis=1)
    os.makedirs("out", exist_ok=True)
    write_wav("out/orbit.wav", out, 48000)
    print(f"wrote out/orbit.wav ({out.shape[1]/48000:.2f}s)")


if __name__ == "__main__":
    main()
