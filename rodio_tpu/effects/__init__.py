from .agc import AgcSettings, AutomaticGainControl
from .basic import (
    Amplify,
    ChannelVolume,
    Delay,
    Distortion,
    LinearGainRamp,
    Pausable,
    Repeat,
    Skippable,
    SkipDuration,
    Spatial,
    Speed,
    Stoppable,
    TakeDuration,
    TrackPosition,
)
from .blt import BltFilter
from .limit import Limit, LimitSettings
from .mix import Mix
