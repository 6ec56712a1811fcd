"""Test configuration: force an 8-virtual-device CPU backend so sharding and
multi-chip codepaths run without TPU hardware (the driver separately dry-runs
the multichip path; see __graft_entry__.py)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
