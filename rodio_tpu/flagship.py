"""Flagship workload: the 512-stream batched DSP pipeline.

BASELINE.json config 5: decode -> resample -> channel-convert -> effects ->
mix -> limit for 512 concurrent 48 kHz stereo streams on one chip. This
module builds that graph for benches, the graft entry, and the multichip
dry run.

Layout: the WIDE-CHANNEL batch — the stream axis folds into the channel
axis (512 stereo streams = one 1024-channel chain), so the whole pipeline
is plain dense ops with no vmap:

  SamplesBuffer[1024ch PCM @44.1k]
    -> Resample 48k        (MXU matmul against the constant lerp operator)
    -> BltFilter low-pass  (1024 biquad lanes, sequential or assoc scan)
    -> Amplify             (per-stream gains as a per-channel vector)
    -> WideMixer           (sum over the stream axis -> [2, T])
    -> Limit               (master-bus soft-knee limiter)
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .effects.basic import Amplify
from .effects.blt import BltFilter
from .effects.limit import Limit, LimitSettings
from .conversions.resample import Resample
from .parallel.batch import WideMixer
from .sources.generators import SamplesBuffer


def make_flagship(n_streams: int = 512, *, seconds: float = 4.0,
                  in_rate: int = 44100, out_rate: int = 48000,
                  channels: int = 2, seed: int = 0,
                  scan_mode: str = "exact", with_agc: bool = False,
                  source_pcm: Optional[np.ndarray] = None,
                  max_block: int = 8192):
    """Build (master_node, state) for the flagship pipeline.

    ``source_pcm``: optional [channels, frames] PCM at in_rate shared as the
    base content (e.g. decoded music.wav); per-stream copies are rotated so
    the batch is heterogeneous. Without it, deterministic pseudo-noise.
    """
    rng = np.random.default_rng(seed)
    frames = int(seconds * in_rate)
    if source_pcm is None:
        base = rng.standard_normal((channels, frames)).astype(np.float32) * 0.1
    else:
        base = np.asarray(source_pcm, dtype=np.float32)
        if base.shape[1] < frames:
            reps = -(-frames // base.shape[1])
            base = np.tile(base, (1, reps))
        base = base[:channels, :frames]

    # wide-channel data: [S*C, frames], each stream a rotated copy
    shifts = rng.integers(0, frames, size=n_streams)
    wide = np.empty((n_streams * channels, frames), dtype=np.float32)
    for s in range(n_streams):
        wide[s * channels : (s + 1) * channels] = np.roll(
            base, int(shifts[s]), axis=1
        )

    gains = (
        rng.uniform(0.5, 1.5, size=n_streams).astype(np.float32) / n_streams
    )
    per_channel_gain = np.repeat(gains, channels)

    chain = SamplesBuffer(n_streams * channels, in_rate, wide)
    chain = Resample(chain, out_rate, max_block=max_block)
    chain = BltFilter(chain, "low_pass", 2000.0, 0.5, mode=scan_mode)
    if with_agc:
        from .effects.agc import AgcSettings, AutomaticGainControl

        chain = AutomaticGainControl(
            chain, AgcSettings(), mode=scan_mode, streams=n_streams
        )
    chain = Amplify(chain, per_channel_gain)
    chain = WideMixer(chain, n_streams)
    master = Limit(chain, LimitSettings(), mode=scan_mode)
    return master, master.init_state()
