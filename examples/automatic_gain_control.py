"""AGC with live control handles (examples/automatic_gain_control.rs
equivalent): quiet music is brought toward the target level; the
attack/release knobs and the enable switch are pure state updates
(reference src/source/agc.rs:302-361)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import jax
import numpy as np

from rodio_tpu.effects import AgcSettings, AutomaticGainControl
from rodio_tpu.io import Decoder


def main():
    quiet = Decoder("/root/reference/assets/music.wav").amplify(0.05)
    node = AutomaticGainControl(
        quiet,
        AgcSettings(target_level=1.0, attack_time=4.0, release_time=0.0,
                    absolute_max_gain=5.0),
    )
    state = node.init_state()
    step = jax.jit(lambda s: node.emit(s, 4096))

    peaks = []
    for blk in range(40):
        if blk == 20:
            # halve the attack time mid-stream: zero re-trace
            state = node.set_attack_time(state, 2.0)
        state, out, valid = step(state)
        peaks.append(float(np.abs(np.asarray(out)).max()))
    print(f"input peak ~{0.05:.2f} -> AGC peaks: first block "
          f"{peaks[0]:.3f}, last block {peaks[-1]:.3f} (rising toward 1.0)")
    assert peaks[-1] > peaks[0]


if __name__ == "__main__":
    main()
