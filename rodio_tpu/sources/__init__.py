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
from .concat import EmptyCallback, from_factory, from_iter
from .noise import (
    Blue,
    Brownian,
    Pink,
    Red,
    Velvet,
    Violet,
    WhiteGaussian,
    WhiteTriangular,
    WhiteUniform,
)
from .buffered import Buffered
