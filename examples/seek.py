"""Seeking during playback (examples/seek_mp3.rs equivalent):
Player.try_seek with position feedback via get_pos — the block analog of
the reference's SeekOrder rendezvous (src/player.rs:246-265)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

from rodio_tpu.control.player import Player
from rodio_tpu.io import Decoder, DeviceSinkBuilder


def main():
    sink = DeviceSinkBuilder().open()
    player = Player.connect_new(sink.mixer())
    player.append(Decoder("/root/reference/assets/music.mp3"))

    sink.render_blocks(20)
    before = player.get_pos()

    player.try_seek(7.5)
    sink.render_blocks(20)
    after = player.get_pos()
    sink.close()

    print(f"position before seek: {before:.2f} s; after try_seek(7.5) "
          f"+ 20 blocks: {after:.2f} s")
    assert 7.4 < after < 8.5


if __name__ == "__main__":
    main()
