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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call" not in flags:
    # see axon_scrub.py: virtual-mesh collectives need generous rendezvous
    # deadlines on few-core hosts
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
