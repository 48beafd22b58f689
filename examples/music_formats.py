"""Decode every container in the asset corpus (examples/music_wav.rs,
music_flac.rs, music_mp3.rs, music_ogg.rs, music_m4a.rs equivalents):
one Decoder facade, probe order matching the reference's builder
(src/decoder/builder.rs:299-341)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import numpy as np

from rodio_tpu.io import Decoder


def main():
    for name in ["music.wav", "music.flac", "music.mp3", "music.ogg",
                 "music.m4a"]:
        path = f"/root/reference/assets/{name}"
        try:
            d = Decoder(path)
        except Exception as e:
            print(f"{name:>12}: decode unavailable ({e})")
            continue
        dur = d.total_duration()
        out = d.take_duration(0.5).render(block_frames=4096)
        print(f"{name:>12}: {d.spec.channels} ch @ {d.spec.sample_rate} Hz,"
              f" {dur:.3f} s total, first 0.5 s peak "
              f"{np.abs(out).max():.3f}")


if __name__ == "__main__":
    main()
