"""pytest preparse plugin: re-exec with the axon TPU-tunnel plugin disabled.

The container's sitecustomize registers the `axon` PJRT plugin (remote-compile
relay) in every interpreter, adding ~10s startup + ~20s per XLA compile even
for CPU work.  Tests are pure-CPU, so we re-exec pytest once with the plugin
scrubbed and an 8-device virtual CPU mesh.

This must run as a ``-p`` plugin (see pytest.ini): at preparse time pytest's
output capture has not started yet, so the re-exec'd process inherits the
real stdout.  Doing this from conftest.py is too late — capture has already
replaced fd 1 with a temp file and all test output would be discarded.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("TDWSS_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["TDWSS_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""       # sitecustomize skips axon registration
    env["PALLAS_AXON_REMOTE_COMPILE"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "xla_cpu_collective_call" not in flags:
        # 8 virtual devices serialize on few-core hosts: a device's
        # pre-collective program segment can exceed XLA CPU's default
        # 20 s warn / 40 s terminate rendezvous deadlines, aborting the
        # process mid-test (seen at 1 core with production-shape DP).
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    env["XLA_FLAGS"] = flags
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdwss_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
