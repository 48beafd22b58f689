from .wav import read_wav, wav_to_file, write_wav
from .decoder import Decoder, DecoderBuilder, DecoderError, LoopedDecoder, Settings
from .native import SpscRing, flac_decode
from .device import (
    CallbackDevice,
    DeviceConfig,
    DeviceSinkBuilder,
    FileDevice,
    MixerDeviceSink,
    NullDevice,
    play,
)
from .microphone import Microphone, MicrophoneBuilder, MicrophoneConfig
from .sample_convert import from_f32, to_f32
from .streaming import DeviceFeeder, StreamingFeed, StreamingWav
