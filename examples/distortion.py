"""Distortion effect (examples/distortion.rs / distortion_wav.rs
equivalent): hard clip (x*gain).clamp(-t, t) — reference
src/source/distortion.rs:66-72 — on a sine and on decoded music."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import numpy as np

from rodio_tpu.io import Decoder, wav_to_file
from rodio_tpu.sources import SineWave


def main():
    os.makedirs("out", exist_ok=True)
    clean = SineWave(220.0).amplify(0.8).take_duration(0.3)
    dirty = clean.distortion(gain=4.0, threshold=0.6)
    out = dirty.render(block_frames=2048)
    print(f"sine through distortion(4.0, 0.6): peak {np.abs(out).max():.3f}"
          f" (clipped at 0.6)")

    src = (
        Decoder("/root/reference/assets/music.wav")
        .take_duration(2.0)
        .distortion(gain=3.0, threshold=0.5)
        .amplify(0.8)
    )
    wav_to_file(src, "out/music_distorted.wav")
    print("wrote out/music_distorted.wav")


if __name__ == "__main__":
    main()
