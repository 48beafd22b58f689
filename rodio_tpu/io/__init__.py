from .wav import read_wav, wav_to_file, write_wav
from .decoder import Decoder, DecoderBuilder, DecoderError, LoopedDecoder, Settings
from .native import SpscRing, flac_decode
