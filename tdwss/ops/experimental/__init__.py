"""Experimental sparse-conv engines — NOT on the production path.

Measured alternatives kept for reference and future revisits (each is
fully implemented, oracle-tested, and benchmarked; see docs/DESIGN.md):

- ``brick_plan`` / ``brick_conv``: dense conv3d over occupied 4^3 bricks
  (3.9x slower than the windowed-27 engine at production occupancy);
- ``pallas_gather``: DMA-descriptor block gather (1.2x slower than XLA's
  take on v5e — gathers are row-count-bound either way).

The production engine is the two-level sub-window 27-tap form
(tdwss.ops.plan.Windowed27 + tdwss.ops.pallas_subm), with the XLA einsum
windowed path and the plain gather-GEMM as graded fallbacks.
"""
