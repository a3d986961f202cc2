"""Test harness: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(`xla_force_host_platform_device_count`), per SURVEY.md §4(f).

The axon TPU-tunnel plugin scrub + re-exec lives in ``axon_scrub.py``
(loaded via pytest.ini ``-p``; see its docstring for why it cannot live
here).  This file only sets CPU defaults for direct non-axon invocations.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
