"""Test configuration: force an 8-virtual-device CPU backend so sharding and
multi-chip codepaths run without TPU hardware (the driver separately dry-runs
the multichip path; see __graft_entry__.py)."""
import os

# The container presets JAX_PLATFORMS=axon (real TPU) and its sitecustomize
# imports jax at interpreter start, so env vars alone are too late — use
# jax.config.update before any backend initialization instead.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _deterministic_torch_rng():
    """Order-independent torch weights: parity tests build torch reference
    models from the GLOBAL torch RNG; without per-test seeding, adding any
    torch-using test shifts the stream and changes every later test's
    random weights (flaky near-tie argmax assertions)."""
    try:
        import torch
        torch.manual_seed(0)
    except ImportError:
        pass
    yield
