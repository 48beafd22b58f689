from .wav import read_wav, wav_to_file, write_wav
