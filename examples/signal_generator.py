"""Signal generators incl. a CUSTOM waveform function
(examples/signal_generator.rs equivalent): the built-in sine / triangle /
square / sawtooth, a chirp sweep, and a user phase->sample callable (the
GeneratorFunction extension point, reference
src/source/signal_generator.rs:36-69)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import jax.numpy as jnp
import numpy as np

from rodio_tpu.sources import Chirp, SignalGenerator
from rodio_tpu.sources.generators import (
    SawtoothWave, SineWave, SquareWave, TriangleWave,
)


def main():
    dur = 0.1
    for name, node in [
        ("sine", SineWave(440.0)),
        ("triangle", TriangleWave(440.0)),
        ("square", SquareWave(440.0)),
        ("sawtooth", SawtoothWave(440.0)),
        ("chirp 200->800 Hz", Chirp(48000, 200.0, 800.0, dur)),
    ]:
        out = node.take_duration(dur).render(block_frames=2048)
        print(f"{name:>18}: {out.shape[1]} frames, peak "
              f"{np.abs(out).max():.3f}")

    # custom generator: first+third harmonic organ tone (phase in [0, 1))
    def organ(phase):
        return (jnp.sin(2 * jnp.pi * phase)
                + 0.4 * jnp.sin(6 * jnp.pi * phase)) / 1.4

    custom = SignalGenerator(48000, 220.0, organ)
    out = custom.take_duration(dur).render(block_frames=2048)
    print(f"{'custom organ':>18}: {out.shape[1]} frames, peak "
          f"{np.abs(out).max():.3f}")


if __name__ == "__main__":
    main()
