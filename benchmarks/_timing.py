"""Shared timing helper with a sync that is honest under the axon relay.

``jax.block_until_ready`` can return before device execution completes on
this backend: measured 2026-08-18, a 282-GFLOP pallas_call chain "timed"
at 0.03 ms with block_until_ready (probe_dyngather), i.e. the buffer
handle reports ready once the execute RPC is enqueued.  ``jax.device_get``
of real bytes cannot complete early, so every benchmark syncs by fetching
a tiny reduction of the outputs instead.  (bench.py hit the same issue
with donated buffers; this module generalizes the fix to all probes.)
"""

from __future__ import annotations

import time


def _fetch(out):
    """Force real completion: device_get a tiny reduction of every leaf."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    if not leaves:
        return
    # one fused scalar per leaf; device_get round-trips real bytes
    jax.device_get([jnp.sum(x) for x in leaves])


def timed(fn, *args, steps: int = 10, warmup: int = 2) -> float:
    """Average seconds per call of ``fn(*args)``, honestly synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / steps
