"""Render a processed file to WAV (examples/into_file.rs equivalent)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")  # examples run locally; RODIO_TPU_PLATFORM=axon targets the chip

from rodio_tpu.effects import LimitSettings
from rodio_tpu.io import Decoder, wav_to_file


def main():
    os.makedirs("out", exist_ok=True)
    src = (
        Decoder("/root/reference/assets/music.flac")
        .resample(48000)
        .high_pass(120.0)
        .amplify(0.9)
        .fade_in(0.5)
        .limit(LimitSettings.mastering())
    )
    wav_to_file(src, "out/music_mastered.wav")
    print("wrote out/music_mastered.wav")


if __name__ == "__main__":
    main()
