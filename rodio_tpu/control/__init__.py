from .mixer import Mixer, MixerSource, mixer
from .player import Player, PlayerControl
from .queue import SourcesQueueInput, SourcesQueueOutput, queue
from .spatial_player import SpatialPlayer
