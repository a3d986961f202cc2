"""Integer voxel-coordinate keys and sorted lookup.

The reference's SparseConvNet engine resolves voxel coordinates through a
host/device hash table per layer.  On TPU, dynamic hash tables are hostile to
XLA's static-shape compilation model, so we use a *sorted-key* design:

- Every voxel coordinate ``(x, y, z, batch)`` with ``0 <= x,y,z < 4096`` is
  packed into two int32 keys ``(hi, lo) = ((b<<12)|z, (y<<12)|x)``.
- Voxel sets are kept sorted lexicographically by ``(hi, lo)`` (a by-product
  of the sort-based deduplication in :mod:`tdwss.ops.voxelize`).
- Neighbor queries (rulebook construction) are vectorized binary searches —
  ``log2(V)`` rounds of gathers, fully static, fused by XLA.

Coordinates use layout ``(V, 4) int32 = [x, y, z, b]`` matching the
reference's ``locs`` batch layout (dataset/data.py:198).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

COORD_BITS = 12                    # supports full_scale <= 4096 per axis
COORD_MAX = 1 << COORD_BITS
INVALID_KEY = np.int32(2**31 - 1)  # sorts after every valid key
INVALID_QUERY = np.int32(-1)       # sorts before every valid key -> no match


def make_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (x, y, z, b) int32 coords into lexicographic (hi, lo) int32 keys.

    Invalid rows get ``INVALID_KEY`` so they sort to the end.
    """
    x, y, z, b = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    hi = (b << COORD_BITS) | z
    lo = (y << COORD_BITS) | x
    hi = jnp.where(valid, hi, INVALID_KEY)
    lo = jnp.where(valid, lo, INVALID_KEY)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def make_query_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keys for neighbor *queries*: out-of-range or invalid -> never matches."""
    x, y, z, b = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    in_range = (
        (x >= 0) & (x < COORD_MAX)
        & (y >= 0) & (y < COORD_MAX)
        & (z >= 0) & (z < COORD_MAX)
    )
    ok = jnp.logical_and(valid, in_range)
    hi = jnp.where(ok, (b << COORD_BITS) | z, INVALID_QUERY)
    lo = jnp.where(ok, (y << COORD_BITS) | x, INVALID_QUERY)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def lookup_sorted(key_hi: jnp.ndarray, key_lo: jnp.ndarray,
                  q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Vectorized binary search: index of (q_hi, q_lo) in sorted keys, or -1.

    ``key_hi/key_lo`` must be ascending lexicographically (invalid slots
    padded with ``INVALID_KEY`` at the tail).  ``ceil(log2(V)) + 1`` rounds
    of two gathers each, in a ``fori_loop`` so the traced graph stays small
    (an unrolled version at 27 offsets x 7 levels took tens of minutes to
    compile for production sizes).
    """
    n = key_hi.shape[0]
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        mh = jnp.take(key_hi, mid, mode="clip")
        ml = jnp.take(key_lo, mid, mode="clip")
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n, jnp.int32)
    lo, hi = lax.fori_loop(0, rounds, body, (lo, hi))
    probe = jnp.minimum(lo, n - 1)
    hit = (
        (lo < n)
        & (jnp.take(key_hi, probe) == q_hi)
        & (jnp.take(key_lo, probe) == q_lo)
    )
    return jnp.where(hit, lo, -1).astype(jnp.int32)


def sort_by_keys(hi: jnp.ndarray, lo: jnp.ndarray, *operands: jnp.ndarray):
    """Stable lexicographic sort of ``operands`` by (hi, lo)."""
    return lax.sort((hi, lo) + operands, num_keys=2, is_stable=True)


def kernel_offsets(size: int, dimension: int = 3) -> np.ndarray:
    """All filter offsets of a cubic kernel, shape (size**dim, dim) int32.

    For odd sizes the offsets are centred (submanifold convention,
    e.g. size 3 -> [-1, 0, 1]^3); for even sizes they span [0, size)
    (strided-convolution convention, e.g. size 2 -> [0, 1]^3).
    Ordering is x-fastest to match the coordinate packing.
    """
    if size % 2 == 1:
        rng = np.arange(size) - size // 2
    else:
        rng = np.arange(size)
    grids = np.meshgrid(*([rng] * dimension), indexing="ij")
    # grids[0] is x varying slowest under 'ij'; stack as (x, y, z) columns.
    offs = np.stack([g.reshape(-1) for g in grids], axis=-1)
    return offs.astype(np.int32)


