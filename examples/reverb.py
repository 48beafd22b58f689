"""Reverb / echo combinator (examples/reverb.rs equivalent):
self.mix(self.amplify(a).delay(d)) — reference src/source/mod.rs:628-634.
Block nodes are declarative and re-emittable, so no .buffered() is
needed before reverb (unlike the reference)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

from rodio_tpu.io import Decoder, wav_to_file


def main():
    os.makedirs("out", exist_ok=True)
    src = (
        Decoder("/root/reference/assets/music.ogg")
        .take_duration(2.5)
        .reverb(0.04, 0.7)
    )
    wav_to_file(src, "out/music_reverb.wav")
    print("wrote out/music_reverb.wav (40 ms echo at 0.7 amplitude)")


if __name__ == "__main__":
    main()
