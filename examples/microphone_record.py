"""Record from a microphone to WAV (examples/microphone.rs equivalent).

On a host with capture hardware, MicrophoneBuilder().open_os_stream()
attaches an ALSA/Pulse capture thread to the same ring; headless, a
feeder thread stands in for the OS input callback (the rtrb SPSC ring
pattern of reference src/microphone.rs:261-324)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import threading
import time

import numpy as np

from rodio_tpu.io import wav_to_file
from rodio_tpu.io.microphone import MicrophoneBuilder
from rodio_tpu.sources import SamplesBuffer


def main():
    os.makedirs("out", exist_ok=True)
    mic = (
        MicrophoneBuilder()
        .default_device()
        .prefer_channels(1)
        .prefer_sample_rate(48000)
        .prefer_buffer_duration(0.1)
        .open_stream()
    )

    # stand-in capture thread: 440 Hz tone pushed in 10 ms chunks
    def feeder():
        t = np.arange(0, 48000 // 2) / 48000.0
        tone = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        for k in range(0, len(tone), 480):
            mic.feed(tone[k : k + 480])
            time.sleep(0.002)
        mic.close()

    threading.Thread(target=feeder, daemon=True).start()

    pcm = mic.record(0.4)  # [channels, frames]
    wav_to_file(SamplesBuffer(1, 48000, pcm), "out/mic_recording.wav")
    print(f"recorded {pcm.shape[1]} frames -> out/mic_recording.wav "
          f"(peak {np.abs(pcm).max():.2f})")


if __name__ == "__main__":
    main()
