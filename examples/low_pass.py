"""Low-pass filtered playback (examples/low_pass.rs equivalent): music
through a 300 Hz biquad low-pass (Audio-EQ-Cookbook coefficients,
reference src/source/blt.rs:502-545), rendered to WAV."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

from rodio_tpu.io import Decoder, wav_to_file


def main():
    os.makedirs("out", exist_ok=True)
    src = (
        Decoder("/root/reference/assets/music.wav")
        .take_duration(3.0)
        .low_pass(300.0)
    )
    wav_to_file(src, "out/music_low_pass.wav")
    print("wrote out/music_low_pass.wav (300 Hz low-pass)")


if __name__ == "__main__":
    main()
