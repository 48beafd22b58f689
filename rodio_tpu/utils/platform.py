"""Platform selection helper.

This machine pins JAX_PLATFORMS=axon (a TPU tunnel) in the environment and
ignores the env-var override; `jax.config.update` is the reliable switch.
Call ``select_platform("cpu")`` before any jax computation to run locally
(examples default to CPU via RODIO_TPU_PLATFORM; set it to "tpu"/"axon" to
target the chip).
"""
from __future__ import annotations

import os


def select_platform(default: str = "cpu") -> str:
    """Apply RODIO_TPU_PLATFORM (or the given default). Returns the choice."""
    choice = os.environ.get("RODIO_TPU_PLATFORM", default)
    if choice in ("cpu",):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    return choice
