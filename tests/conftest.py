"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin in every
python process and forces ``jax_platforms="axon,cpu"``, so plain env vars are
not enough — we must override via jax.config before any backend initializes
(SURVEY.md §4: test multi-host DP with ``--xla_force_host_platform_device_count``
fakes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
