"""Test config: force an 8-device virtual CPU mesh before any jax use.

SURVEY.md §4: multi-host tests without a cluster — fake an 8-device mesh
on CPU so sharded code paths (distributed BA) are exercised everywhere.

The session environment pins ``JAX_PLATFORMS=axon`` (a TPU tunnel whose
first backend init dials a relay, ~50 s); sitecustomize imports jax at
interpreter start, so an env-var override is too late.  Instead we flip
the platform via jax.config *before any backend initializes* — this
keeps unit tests on fast local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
