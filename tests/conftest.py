"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Set RODIO_TPU_TEST_DEVICE=tpu to run the suite on a real chip.
"""
import os

if os.environ.get("RODIO_TPU_TEST_DEVICE", "cpu") == "cpu":
    # force-set: the machine environment pins JAX_PLATFORMS=axon (the TPU
    # tunnel); tests must run on local CPU with 8 virtual devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # the axon TPU plugin ignores the env var; force via config
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xA0D10)
