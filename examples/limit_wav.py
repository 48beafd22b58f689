"""Limited hot playback (examples/limit_wav.rs equivalent): music.wav
amplified 3x into the default soft-knee limiter (reference
src/source/limit.rs:854-930), rendered to WAV with before/after peaks."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import numpy as np

from rodio_tpu.effects import LimitSettings
from rodio_tpu.io import Decoder, wav_to_file


def main():
    os.makedirs("out", exist_ok=True)
    hot = Decoder("/root/reference/assets/music.wav").take_duration(3.0).amplify(3.0)
    peak_in = float(np.abs(hot.render(block_frames=4096)).max())
    limited = hot.limit(LimitSettings.default())
    out = limited.render(block_frames=4096)
    wav_to_file(limited, "out/music_limited.wav")
    print(f"amplified peak {peak_in:.3f} -> limited peak "
          f"{float(np.abs(out).max()):.3f}; wrote out/music_limited.wav")


if __name__ == "__main__":
    main()
