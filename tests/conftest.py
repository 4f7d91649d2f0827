"""Test config: force CPU backend with 8 virtual devices so mesh/sharding
tests run anywhere (the driver validates real-TPU paths separately)."""

import os

# The image preloads jax via sitecustomize with JAX_PLATFORMS=axon, so env vars
# alone are too late here — switch the platform through jax.config before any
# backend is initialized. Run with EVDR_TEST_TPU=1 to exercise the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not os.environ.get("EVDR_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _registry_isolation():
    """register_dataset mutates the global DATASETMAP; tests that register
    fixtures ('synth', 'pooledfx', ...) must not leak entries into tests that
    assert the reference's 10-dataset registry shape."""
    from evdr_tpu.data.registry import DATASETMAP

    before = {k: dict(v) for k, v in DATASETMAP.items()}
    yield
    DATASETMAP.clear()
    DATASETMAP.update(before)
