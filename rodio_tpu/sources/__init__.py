from .generators import (
    Chirp,
    Empty,
    SamplesBuffer,
    SawtoothWave,
    SignalGenerator,
    SineWave,
    SquareWave,
    TriangleWave,
    Zero,
)
