"""The full noise family (examples/noise_generator.rs equivalent)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

import numpy as np

from rodio_tpu.graph import render
from rodio_tpu.io import write_wav
from rodio_tpu.sources import (
    Blue, Brownian, Pink, Red, Velvet, Violet,
    WhiteGaussian, WhiteTriangular, WhiteUniform,
)


def main():
    os.makedirs("out", exist_ok=True)
    rate = 48000
    segs = []
    for cls in (WhiteUniform, WhiteTriangular, WhiteGaussian, Velvet, Pink,
                Blue, Violet, Brownian, Red):
        node = cls(rate).amplify(0.2).take_duration(0.5)
        segs.append(render(node))
        print(f"{cls.__name__:16s} rms={np.sqrt((segs[-1]**2).mean()):.4f}")
    out = np.concatenate(segs, axis=1)
    write_wav("out/noise_tour.wav", out, rate)
    print("wrote out/noise_tour.wav")


if __name__ == "__main__":
    main()
