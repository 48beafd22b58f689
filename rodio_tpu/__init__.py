"""rodio_tpu — a TPU-native audio DSP framework.

A from-scratch rebuild of the capabilities of the RustAudio/rodio streaming
audio library, designed TPU-first: audio flows as batched frame-major blocks
``[streams, channels, time]`` through statically-compiled JAX graphs, the
per-sample iterator hot loops of the reference become fused XLA/Pallas
kernels driven by (associative) scans over stateful carries, and thousands of
concurrent streams batch onto one chip.

Layers (mirroring SURVEY.md's layer map):

- :mod:`rodio_tpu.core`        — sample model, math, block format
- :mod:`rodio_tpu.sources`     — generators, buffers, noise
- :mod:`rodio_tpu.effects`     — the effect/combinator algebra
- :mod:`rodio_tpu.conversions` — resampler / channel converter / uniform
- :mod:`rodio_tpu.ops`         — recurrence scans + Pallas kernels
- :mod:`rodio_tpu.graph`       — chain compiler and offline renderer
- :mod:`rodio_tpu.control`     — mixer / queue / player control plane
- :mod:`rodio_tpu.io`          — decoders, WAV output, device sinks
- :mod:`rodio_tpu.parallel`    — stream-axis sharding over device meshes
- :mod:`rodio_tpu.refimpl`     — scalar semantic oracle (tests only)
"""

from .core.errors import (
    PlayError,
    RodioTpuError,
    SeekError,
    SeekNotSupported,
    StreamError,
)
from .core.types import DEFAULT_SAMPLE_RATE, StreamSpec, set_float64

__version__ = "0.1.0"
