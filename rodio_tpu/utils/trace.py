"""Tracing / observability for the host control plane.

The reference gates optional `tracing` events (stream errors, sink drops,
AGC gain debug; SURVEY.md §5). The block engine's equivalents:

- a structured host-side event logger (stdlib logging under the
  ``rodio_tpu`` namespace) used by the control plane,
- per-block render timing stats (BlockTimer) — the block-cadence analog of
  profiling the audio callback,
- a `jax.profiler` wrapper for device traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import List, Optional

logger = logging.getLogger("rodio_tpu")


def log_event(event: str, **fields) -> None:
    """Structured control-plane event (the tracing::debug! analog)."""
    logger.debug("%s %s", event, fields)


@dataclass
class BlockTimer:
    """Collects per-block wall times of a render/playback loop.

    NOTE: on transports where device sync is unreliable (see bench.py),
    wall times measure the host-visible cadence, which is what matters for
    realtime delivery deadlines.
    """

    sample_rate: int = 48000
    block_frames: int = 4096
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    @contextlib.contextmanager
    def block(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def stats(self) -> dict:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        deadline = self.block_frames / self.sample_rate
        return {
            "blocks": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "max_ms": float(arr.max() * 1e3),
            "deadline_ms": deadline * 1e3,
            "xruns": int((arr > deadline).sum()),
            "realtime_multiple": float(deadline / arr.mean()),
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context for device-level analysis."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
