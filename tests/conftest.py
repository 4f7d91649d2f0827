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
    # the cpu_aot_loader logs a cosmetic machine-feature-mismatch ERROR per
    # persistent-cache load (+prefer-no-scatter/-gather are tuning prefs the
    # host detector never reports, same machine either way) — silence it
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: this 1-core box spends most of the suite in
    # XLA CPU compiles, so repeat runs (the developer fast loop) load them
    # from disk instead. Cold run ~4min, warm ~half that. Opt out with
    # EVDR_TEST_NO_CACHE=1 (e.g. when bisecting compiler-level issues).
    if not os.environ.get("EVDR_TEST_NO_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/evdr_test_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
