"""Stereo placement (examples/stereo.rs equivalent): a mono beep panned
across the stereo field with ChannelVolume (reference
src/source/channel_volume.rs:71-88)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import numpy as np

from rodio_tpu.sources import SineWave


def main():
    os.makedirs("out", exist_ok=True)
    segs = []
    for left, right in [(1.0, 0.0), (0.7, 0.3), (0.5, 0.5), (0.3, 0.7),
                        (0.0, 1.0)]:
        seg = (SineWave(440.0).amplify(0.4)
               .channel_volume([left, right]).take_duration(0.2))
        segs.append(seg.render(block_frames=2048))
    out = np.concatenate(segs, axis=1)
    from rodio_tpu.io import wav_to_file
    from rodio_tpu.sources import SamplesBuffer

    wav_to_file(SamplesBuffer(2, 48000, out), "out/stereo_pan.wav")
    l_energy = float((out[0] ** 2).sum())
    r_energy = float((out[1] ** 2).sum())
    print(f"wrote out/stereo_pan.wav — L energy {l_energy:.1f}, "
          f"R energy {r_energy:.1f}")


if __name__ == "__main__":
    main()
