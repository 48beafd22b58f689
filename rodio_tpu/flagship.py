"""Flagship workload: the 512-stream batched DSP pipeline.

BASELINE.json config 5: decode -> resample -> channel-convert -> effects ->
mix -> limit for 512 concurrent 48 kHz stereo streams on one chip. This
module builds that graph for benches, the graft entry, and the multichip
dry run.

Structure (all one fused XLA program per block):
  per-stream: SamplesBuffer(44.1k stereo PCM) -> Resample(48k)
              -> BltFilter(low_pass 2kHz) -> Amplify(1/S)
  batch:      vmap over S streams -> sum over stream axis
  master bus: Limit (soft-knee peak limiter)
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .core.types import StreamSpec
from .effects.basic import Amplify
from .effects.blt import BltFilter
from .effects.limit import Limit, LimitSettings
from .conversions.resample import Resample
from .parallel.batch import BatchedChain, BatchedMixer, stack_states
from .sources.generators import SamplesBuffer


def make_flagship(n_streams: int = 512, *, seconds: float = 4.0,
                  in_rate: int = 44100, out_rate: int = 48000,
                  channels: int = 2, seed: int = 0,
                  scan_mode: str = "exact",
                  source_pcm: Optional[np.ndarray] = None,
                  max_block: int = 8192):
    """Build (mixer_node, batched_state).

    ``source_pcm``: optional [channels, frames] PCM at in_rate shared as the
    base content (e.g. decoded music.wav); per-stream states start at
    different offsets so the batch is heterogeneous. Without it, deterministic
    pseudo-noise fills the buffers.
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

    template_src = SamplesBuffer(channels, in_rate, base)
    chain = Resample(template_src, out_rate, max_block=max_block)
    chain = BltFilter(chain, "low_pass", 2000.0, 0.5, mode=scan_mode)
    chain = Amplify(chain, 1.0 / n_streams)

    # per-stream variation: start offsets + gains, all state-resident
    states = []
    proto = chain.init_state()
    for s in range(n_streams):
        st = jax.tree_util.tree_map(lambda x: x, proto)  # shallow copy
        # rotate the PCM per stream for heterogeneous content
        shift = int(rng.integers(0, frames))
        st = _with_buffer(st, np.roll(base, shift, axis=1))
        st = _with_amplify(st, float(rng.uniform(0.5, 1.5)) / n_streams)
        states.append(st)

    batched = BatchedChain(chain, stack_states(states), n_streams)
    mix = BatchedMixer(batched)
    master = Limit(mix, LimitSettings(), mode=scan_mode)
    return master, master.init_state()


def _with_buffer(state, data):
    import jax.numpy as jnp

    # chain state nesting: Amplify{in: Blt{in: Resample{in: Buffer{...}}}}
    st = dict(state)
    st["in"] = dict(st["in"])
    st["in"]["in"] = dict(st["in"]["in"])
    st["in"]["in"]["in"] = dict(st["in"]["in"]["in"])
    st["in"]["in"]["in"]["data"] = jnp.asarray(data)
    return st


def _with_amplify(state, factor):
    import jax.numpy as jnp

    st = dict(state)
    st["factor"] = jnp.asarray(factor, dtype=state["factor"].dtype)
    return st
