"""Limiter presets (examples/limit_settings.rs equivalent): the six
preset profiles of reference src/source/limit.rs:236-438, applied to a
hot signal, each rendered and peak-measured."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rodio_tpu.utils.platform import select_platform
select_platform("cpu")

import numpy as np

from rodio_tpu.effects import LimitSettings
from rodio_tpu.sources import SineWave


def main():
    presets = {
        "default": LimitSettings.default(),
        "dynamic_content": LimitSettings.dynamic_content(),
        "broadcast": LimitSettings.broadcast(),
        "mastering": LimitSettings.mastering(),
        "live_performance": LimitSettings.live_performance(),
        "gaming": LimitSettings.gaming(),
    }
    hot = SineWave(440.0).amplify(2.0).take_duration(0.5)
    for name, settings in presets.items():
        out = hot.limit(settings).render(block_frames=4096)
        print(f"{name:>16}: threshold {settings.threshold:+.0f} dB -> "
              f"peak {np.abs(out).max():.3f}")


if __name__ == "__main__":
    main()
