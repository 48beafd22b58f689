"""Mix generators and decoded audio (examples/mix_multiple_sources.rs)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

import numpy as np

from rodio_tpu.control import mixer
from rodio_tpu.io import Decoder, write_wav
from rodio_tpu.sources import SawtoothWave, SineWave, SquareWave


def main():
    tx, rx = mixer(2, 48000)
    tx.add(SineWave(261.63).amplify(0.1).take_duration(2.0))   # C4
    tx.add(SineWave(329.63).amplify(0.1).take_duration(2.0))   # E4
    tx.add(SineWave(392.00).amplify(0.1).take_duration(2.0))   # G4
    tx.add(SquareWave(130.81).amplify(0.03).take_duration(2.0))
    tx.add(Decoder("/root/reference/assets/beep.wav")
           .amplify(0.2).take_duration(2.0))

    blocks = []
    while True:
        block, alive = rx.next_block(4096)
        if not alive:
            break
        blocks.append(block)
    out = np.concatenate(blocks, axis=1)
    os.makedirs("out", exist_ok=True)
    write_wav("out/mix.wav", out, 48000)
    print(f"wrote out/mix.wav ({out.shape[1]/48000:.2f}s)")


if __name__ == "__main__":
    main()
