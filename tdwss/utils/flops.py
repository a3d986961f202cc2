"""Compute-cost accounting (scn FLOP-counter parity).

The reference reports MegaMulAdd / MegaHidden per scene from SparseConvNet's
global counters (train.py:50-51,86-87).  The TPU equivalent derives the same
numbers from XLA's compiled cost analysis — exact for the traced program,
no instrumentation in the hot path.
"""

from __future__ import annotations

from typing import Any, Dict


def cost_analysis(jitted_fn, *args, **kwargs) -> Dict[str, float]:
    """Cost analysis dict of a jitted function for concrete args."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return dict(analysis or {})


def mega_mul_add(jitted_fn, *args, per: int = 1, **kwargs) -> float:
    """MegaMulAdd parity: flops/2 (mul+add pairs), scaled per `per` items."""
    flops = cost_analysis(jitted_fn, *args, **kwargs).get("flops", 0.0)
    return flops / 2.0 / 1e6 / max(per, 1)


def param_count(params: Any) -> int:
    """#classifier parameters parity (train.py:44)."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))
