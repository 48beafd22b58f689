from .types import (
    DEFAULT_SAMPLE_RATE,
    MAX_SPAN_LEN,
    NANOS_PER_SEC,
    SpanInfo,
    StreamSpec,
    check_bit_depth,
    check_channels,
    check_sample_rate,
    float_dtype,
    float64_enabled,
    sample_dtype,
    set_float64,
)
from . import math
